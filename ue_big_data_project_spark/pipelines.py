"""Composed training-data preparation pipeline.

The end-to-end shape a 100 TB pre-training corpus pass actually runs:
score → quality-filter → content-dedup → token accounting, expressed as
one declarative DataFrame so Catalyst fuses the scoring expressions into
the scan and the only shuffle is the dedup fingerprint group-by. Each
stage is an operator this engine already oracle-checks in isolation
(functions.text, operators.dedup); the pipeline is itself registered and
hash-checked end-to-end (queries.textops.pipeline_prep_documents).

Scale notes: scoring is pure whole-stage-codegen expressions (zero
shuffle); dedup shuffles once on the md5 fingerprint; the canonical-doc
semi join rides the same fingerprint key. Nothing touches the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ue_big_data_project_spark.functions import text as TX


def prep_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.75,
) -> DataFrame:
    """Quality-filter + exact-dedup + token accounting in one plan.

    Keeps documents scoring ≥ ``min_quality`` whose id is the canonical
    (minimum) id for their normalized-content fingerprint. Output:
    id, quality, n_tokens, n_tokens_bpe, fingerprint.
    """
    scored = docs.select(
        F.col(id_col),
        TX.quality_score(text_col).alias("quality"),
        TX.token_count(text_col).alias("n_tokens"),
        TX.bpe_token_count(text_col).alias("n_tokens_bpe"),
        TX.fingerprint(text_col).alias("fingerprint"),
    ).filter(F.col("quality") >= min_quality)
    canonical = scored.groupBy("fingerprint").agg(
        F.min(id_col).alias("_keep_id")
    )
    return (
        scored.join(
            canonical,
            (scored["fingerprint"] == canonical["fingerprint"])
            & (scored[id_col] == canonical["_keep_id"]),
            "left_semi",
        )
    )


def hash_bucket(col: Column | str, buckets: int = 10_000) -> Column:
    """Deterministic uniform bucket in [0, buckets) from a column value.

    md5-based, so sampling/splitting decisions are reproducible across
    runs, engines, and cluster sizes — unlike ``rand()``/``sampleBy``,
    whose draws depend on partitioning. The first 12 hex digits (48
    bits) are more than enough uniformity for split assignment.
    """
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 12), 16, 10)
    return F.pmod(h.cast("long"), F.lit(buckets))


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    val_pct: int = 5,
    test_pct: int = 5,
) -> DataFrame:
    """Reproducible train/val/test assignment by id hash.

    A document's split NEVER changes as the corpus grows (the hash
    depends only on the id), which is the property that matters for
    contamination control; percentage knobs move the boundaries only.
    """
    b = hash_bucket(id_col, 100)
    return df.withColumn(
        "split",
        F.when(b < val_pct, F.lit("val"))
        .when(b < val_pct + test_pct, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def sample_deterministic(
    df: DataFrame, rate_pct: int, id_col: str = "doc_id"
) -> DataFrame:
    """Keep a reproducible ``rate_pct``% of rows by id hash (a stable
    downsample: the kept set only shrinks/grows at the rate boundary)."""
    return df.filter(hash_bucket(id_col, 100) < rate_pct)


def corpus_stats(prepped: DataFrame) -> DataFrame:
    """One-row corpus accounting over a prepped corpus: document and
    token totals — the budgeting numbers a training run starts from."""
    return prepped.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_tokens_bpe").alias("total_tokens_bpe"),
    )
