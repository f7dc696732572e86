"""Frozen-order staleness curve for the Jaccard probe index (round-9
verdict task 4 — the IVF quantizer-drift study applied to the PPJoin
prefix order).

The frozen frequency order keeps the prefix filter LOSSLESS forever,
but as the corpus drifts the prefixes grow less selective: appends rank
unseen shingles df = 0 (the most-selective slot), so shingles that
became COMMON after the freeze still land in prefixes, and probe
candidate counts creep up. This script measures that creep directly:

- Build the index on an era-0 corpus and freeze its order.
- Append era-1..K increments whose vocabularies are DISJOINT from era
  0 (worst-case drift: every new common shingle ranks df = 0).
- After each era, probe with a fixed-size batch from the newest era,
  and record the prefix-join CANDIDATE count against
  (a) the aged frozen-order index and (b) a fresh rebuild over the
  same cumulative corpus — identical verified pairs (losslessness,
  asserted), different candidate work.
- Record `dedup.jaccard_index_staleness`'s exposure ratio next to the
  measured candidate inflation, so the audit helper's number maps to
  real probe cost and SCALE.md can state a rebuild threshold.

Usage:  python scripts/jaccard_drift_check.py [--eras 4]
Writes one JSON line to stdout; scratch dirs removed on exit.
"""

from __future__ import annotations

import argparse
import atexit
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from ue_big_data_project_spark import get_spark
from ue_big_data_project_spark.operators.dedup import (
    _jaccard_prefix,
    append_jaccard_index,
    jaccard_index_staleness,
    jaccard_probe_index,
    shingle_rows,
    write_jaccard_index,
)

DOCS_PER_ERA = 600
PROBE_DOCS = 150
WORDS_PER_DOC = 30
THRESHOLD = 0.8


def era_docs(spark, era: int, start_id: int, n: int):
    """Era-specific text shaped to expose prefix-selectivity decay:
    each doc is mostly FAMILY-UNIQUE words (a fresh order ranks their
    shingles rarest and picks them as prefixes → candidates ≈ true
    near-dups only) plus a 4-word COMMON block every doc of the era
    shares (never enough overlap to qualify, but its shingles collide
    era-wide — junk candidates whenever a stale order lets them into a
    prefix). Consecutive id pairs are near-dup twins so probes have
    qualifying pairs. Eras use disjoint vocabularies (worst-case drift:
    every era-k shingle ranks df = 0 under the era-0 freeze, so the
    frozen order picks era-k prefixes ARBITRARILY — common block
    included). Deterministic (hash arithmetic, no RNG)."""
    fam = (F.col("id") / 2).cast("long")  # pair (2k, 2k+1) = near-dups
    uniq = [
        F.concat(F.lit(f"e{era}u"), fam.cast("string"), F.lit(f"w{i}"))
        for i in range(WORDS_PER_DOC - 5)
    ]
    common = [F.lit(f"e{era}c{i}") for i in range(4)]
    # One differing word per odd id keeps the twin pair ABOVE the 0.8
    # threshold: 30 words -> 28 shingles, the differing LAST word flips
    # 3 of them, J = 25/31 ~= 0.806 — qualifying but not equal.
    tail = F.when(
        F.col("id") % 2 == 1, F.concat(F.lit(f"e{era}odd"), fam.cast("string"))
    ).otherwise(F.concat(F.lit(f"e{era}even"), fam.cast("string")))
    return spark.range(n).select(
        (F.col("id") + F.lit(start_id)).alias("doc_id"),
        F.concat_ws(" ", *uniq, *common, tail).alias("text"),
    )


def candidate_count(spark, root: str, probe) -> int:
    """Prefix-join candidate pairs (pre-verify) for a probe batch vs an
    index layout — the parameterized copy of jaccard_probe_index's
    candidate stage (scripts mirror operator plans; re-sync on change)."""
    meta = spark.read.parquet(root + "_stats").first()
    id_col, shingle_n = meta["id_col"], int(meta["shingle_n"])
    threshold, n_buckets = float(meta["threshold"]), int(meta["n_buckets"])
    sh = shingle_rows(probe, id_col, "text", shingle_n)
    shh = sh.select(F.col(id_col), F.xxhash64("shingle").alias("_h"))
    buckets = sorted(
        r.b
        for r in shh.select(
            F.pmod(F.col("_h"), F.lit(n_buckets)).cast("int").alias("b")
        )
        .distinct()
        .collect()
    )
    freq = (
        spark.read.parquet(root + "_freq")
        .filter(F.col("_hbucket").isin(buckets))
        .drop("_hbucket")
    )
    prefix_new = _jaccard_prefix(shh, freq, id_col, threshold)
    index_prefix = spark.read.parquet(root).filter(
        F.col("_hbucket").isin(buckets)
    )
    size_ok = F.least(F.col("a.n_sh"), F.col("b.n_sh")) >= (
        threshold * F.greatest(F.col("a.n_sh"), F.col("b.n_sh"))
    )
    a, b = prefix_new.alias("a"), index_prefix.alias("b")
    return (
        a.join(
            b,
            (F.col("a._h") == F.col("b._h"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
            & size_ok,
        )
        .select(F.col(f"a.{id_col}"), F.col(f"b.{id_col}"))
        .distinct()
        .count()
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--eras", type=int, default=4)
    args = ap.parse_args()

    spark = get_spark(app_name="jaccard-drift-check")
    spark.sparkContext.setLogLevel("ERROR")
    root_dir = tempfile.mkdtemp(prefix="spark_graft_jdrift_")
    atexit.register(lambda: shutil.rmtree(root_dir, ignore_errors=True))

    aged = os.path.join(root_dir, "aged")
    corpus = era_docs(spark, 0, 0, DOCS_PER_ERA).localCheckpoint(eager=True)
    write_jaccard_index(corpus, aged, threshold=THRESHOLD)

    steps = []
    for era in range(1, args.eras + 1):
        inc = era_docs(
            spark, era, era * 1_000_000, DOCS_PER_ERA
        ).localCheckpoint(eager=True)
        append_jaccard_index(spark, aged, inc)
        corpus = corpus.unionByName(inc).localCheckpoint(eager=True)
        probe = era_docs(spark, era, era * 1_000_000 + 500_000, PROBE_DOCS)
        # Fresh rebuild over the same cumulative corpus (fresh order).
        fresh = os.path.join(root_dir, f"fresh_{era}")
        write_jaccard_index(corpus, fresh, threshold=THRESHOLD)
        cand_aged = candidate_count(spark, aged, probe)
        cand_fresh = candidate_count(spark, fresh, probe)
        # Losslessness across orders: identical verified pair sets.
        pairs_aged = {
            (r.id_a, r.id_b)
            for r in jaccard_probe_index(spark, aged, probe).collect()
        }
        pairs_fresh = {
            (r.id_a, r.id_b)
            for r in jaccard_probe_index(spark, fresh, probe).collect()
        }
        assert pairs_aged == pairs_fresh, (
            f"era {era}: frozen-order probe diverged from fresh rebuild"
        )
        stale = jaccard_index_staleness(spark, aged)
        shutil.rmtree(fresh, ignore_errors=True)
        steps.append(
            {
                "era": era,
                "corpus_docs": DOCS_PER_ERA * (era + 1),
                "cand_aged": cand_aged,
                "cand_fresh": cand_fresh,
                "cand_inflation": round(
                    cand_aged / cand_fresh if cand_fresh else 1.0, 3
                ),
                "staleness_ratio": round(stale["staleness_ratio"], 3),
                "verified_pairs": len(pairs_aged),
            }
        )
        print(json.dumps(steps[-1]), file=sys.stderr, flush=True)

    print(
        json.dumps(
            {
                "metric": "jaccard_frozen_order_drift",
                "docs_per_era": DOCS_PER_ERA,
                "probe_docs": PROBE_DOCS,
                "threshold": THRESHOLD,
                "steps": steps,
            }
        )
    )


if __name__ == "__main__":
    main()
