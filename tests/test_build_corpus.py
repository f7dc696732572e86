"""End-to-end corpus build: quarantine -> quality/dedup -> near-dup
clusters -> split -> pack, with the written layout and the accounting
dict checked against independently-computed stage results."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from ue_big_data_project_spark import pipelines as P
from ue_big_data_project_spark.session import load_tables

SF_DIR = "/root/testdata/sf0.001"


def test_build_corpus_end_to_end(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"]
    # Seed known-bad records so the quarantine path is exercised.
    bad = spark.createDataFrame(
        [(990001, None), (990002, "   ")],
        docs.select("doc_id", "text").schema,
    )
    inp = docs.select("doc_id", "text").unionByName(bad)
    with tempfile.TemporaryDirectory() as d:
        stats = P.build_corpus(spark, inp, d, min_quality=0.75)

        assert stats["n_quarantined"] == 2
        q = spark.read.parquet(os.path.join(d, "quarantine"))
        assert q.count() == 2
        assert "_violations" in q.columns

        out = spark.read.parquet(os.path.join(d, "documents"))
        assert out.count() == stats["n_docs"] > 0
        # The corpus is trainable as written: text rides with metadata.
        assert {"text", "quality", "n_tokens"} <= set(out.columns)
        assert set(r["split"] for r in out.select("split").distinct().collect()) \
            <= {"train", "val", "test"}
        # Split is a partition directory (directory-level pruning).
        assert os.path.isdir(os.path.join(d, "documents", "split=train"))
        # Quarantined ids never reach the corpus.
        assert out.filter(F.col("doc_id") >= 990001).count() == 0
        # Survivors are exact-dedup canonical: fingerprints are unique.
        assert (
            out.groupBy("fingerprint").count().filter("count > 1").count()
            == 0
        )
        assert stats["total_tokens"] == out.agg(
            F.sum("n_tokens")
        ).collect()[0][0]
        assert stats["n_train"] == out.filter("split = 'train'").count()

        packs = spark.read.parquet(os.path.join(d, "packs"))
        # Every train doc is packed, and only train docs.
        assert packs.count() == stats["n_train"]
        assert stats["n_packs"] == packs.select(
            "stream", "pack_id"
        ).distinct().count()


def test_build_corpus_near_dup_collapses_clusters(spark):
    # Two near-identical docs (one token apart) + one distinct: the
    # cluster keeps the min id only; exact dedup alone would keep both.
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
        (3, "totally unrelated content about storage engines and joins"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as d:
        stats = P.build_corpus(
            spark, docs, d, min_quality=0.0, jaccard_threshold=0.5
        )
        out = spark.read.parquet(os.path.join(d, "documents"))
        assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]
        assert stats["n_docs"] == 2
