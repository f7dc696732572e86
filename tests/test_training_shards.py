"""Deterministic training-shard export — pipelines.training_shards /
write_training_shards contracts (the manifest's cross-engine hash runs
in tests/test_oracle.py::pipeline_training_shards)."""

from __future__ import annotations

import glob
import hashlib
import os

import pyspark.sql.functions as F

from ue_big_data_project_spark.pipelines import (
    FP_PRIME,
    hash_bucket,
    training_shards,
    write_training_shards,
)


def _py_manifest(ids_sizes, shards):
    """Pure-Python replay of the manifest math."""
    per = {}
    for doc_id, size in ids_sizes:
        key = hashlib.md5(str(doc_id).encode()).hexdigest()
        h = int(key[:12], 16)
        per.setdefault(h % shards, []).append((key, doc_id, h, size))
    out = {}
    for shard, rows in per.items():
        rows.sort()
        fp = 0
        for pos, (_, _, h, _) in enumerate(rows, start=1):
            fp = (fp + (pos % FP_PRIME) * (h % FP_PRIME)) % FP_PRIME
        out[shard] = (len(rows), sum(r[3] for r in rows), fp)
    return out


def test_manifest_matches_python_replay(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r.shard: (r.n_docs, r.total_chars, r.order_fp)
        for r in training_shards(docs, shards=4).collect()
    }
    want = _py_manifest(
        [(r.doc_id, r.n_chars) for r in docs.select("doc_id", "n_chars").collect()],
        4,
    )
    assert got == want


def test_manifest_is_partitioning_invariant(spark, sf_dir):
    """The whole point: same manifest regardless of input layout."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted(map(tuple, training_shards(docs, shards=8).collect()))
    b = sorted(
        map(tuple, training_shards(docs.repartition(3), shards=8).collect())
    )
    c = sorted(
        map(
            tuple,
            training_shards(docs.orderBy(F.desc("doc_id")), shards=8).collect(),
        )
    )
    assert a == b == c


def test_write_layout_and_order(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, shards=4)

    # Every shard dir exists and membership matches the hash bucket.
    dirs = sorted(
        int(os.path.basename(d).split("=")[1])
        for d in glob.glob(f"{path}/shard=*")
    )
    assert dirs == [0, 1, 2, 3]
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    mismatch = back.filter(
        hash_bucket("doc_id", 4) != F.col("shard").cast("long")
    ).count()
    assert mismatch == 0

    # Each FILE is internally sorted by the shuffle order (_key, id) —
    # the reader's merge contract.
    for f in glob.glob(f"{path}/shard=*/*.parquet"):
        rows = [
            (r._key, r.doc_id)
            for r in spark.read.parquet(f).select("_key", "doc_id").collect()
        ]
        assert rows == sorted(rows)

    # The manifest fingerprint verifies the materialized layout: merge
    # each shard's rows by (_key, id) and replay the fp.
    manifest = {
        r.shard: r.order_fp
        for r in training_shards(docs, shards=4).collect()
    }
    for shard in dirs:
        rows = sorted(
            (r._key, r.doc_id)
            for r in spark.read.parquet(f"{path}/shard={shard}")
            .select("_key", "doc_id")
            .collect()
        )
        fp = 0
        for pos, (key, _) in enumerate(rows, start=1):
            h = int(key[:12], 16)
            fp = (fp + (pos % FP_PRIME) * (h % FP_PRIME)) % FP_PRIME
        assert fp == manifest[shard]
