"""Streaming scale datapoint for continuous cluster maintenance
(round-9): `cluster_ingest_stream` replays a document corpus as real
micro-batches; the unbounded-stream axis is 10x the BATCHES (same
batch size), so the band index and cluster map underneath grow 10x
while each arriving batch stays the same size.

Claims under test:
- per-batch cost stays roughly FLAT as the stream ages (<= ~2x at 10x
  batches): the probe joins the batch's bands against the growing
  index (bounded by batch x matches), the contracted CC is O(batch),
  and the map rewrite touches only the buckets the batch's components
  land in — nothing re-clusters the corpus;
- ledger compaction keeps the marker dir BOUNDED across the longer
  run (the round-9 quadratic fix);
- stream == one-shot: the final map equals clustering everything at
  once at BOTH scales (asserted, the oracle contract).

Fixture: each batch carries fresh docs, most joining one of a few
evergreen near-dup families (so every batch touches existing clusters)
plus some unique text (singletons).

Usage:  python scripts/cluster_stream_scale_check.py [--batches 3]
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
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from ue_big_data_project_spark import get_spark
from ue_big_data_project_spark import streaming as ST
from ue_big_data_project_spark.operators.dedup import (
    minhash_band_rows,
    read_cluster_map,
)
from ue_big_data_project_spark.operators.graph import connected_components

DOCS_PER_BATCH = 400
FAMILIES = 8


def batch_docs(spark, batch_idx: int):
    """DOCS_PER_BATCH docs: 3/4 join near-dup family (id % FAMILIES),
    1/4 unique singleton text. Ids globally unique per batch."""
    base = batch_idx * DOCS_PER_BATCH
    return spark.range(DOCS_PER_BATCH).select(
        (F.lit(base) + F.col("id")).alias("doc_id"),
        F.when(
            F.col("id") % 4 != 3,
            F.concat(
                F.lit("shared family text body alpha beta gamma delta "),
                (F.col("id") % FAMILIES).cast("string"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("unique singleton document number "),
                (F.lit(base) + F.col("id")).cast("string"),
                F.lit(" with its own words entirely"),
            )
        )
        .alias("text"),
    )


def ledger_gaps(ledger: str) -> list[float]:
    marks = sorted(
        (int(f[len("batch-"):-len(".done")]),
         os.path.getmtime(os.path.join(ledger, f)))
        for f in os.listdir(ledger)
        if f.startswith("batch-") and f.endswith(".done")
    )
    return [round(t1 - t0, 3) for (_, t0), (_, t1) in zip(marks, marks[1:])]


def run_scale(spark, batches: int) -> dict:
    root = tempfile.mkdtemp(prefix=f"clust_stream_{batches}_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    stage = os.path.join(root, "stage")
    os.makedirs(stage)
    now = time.time()
    all_docs = None
    for i in range(batches):
        d = batch_docs(spark, i)
        all_docs = d if all_docs is None else all_docs.unionByName(d)
        bdir = os.path.join(root, f"b{i}")
        d.coalesce(1).write.parquet(bdir)
        part = [f for f in os.listdir(bdir) if f.endswith(".parquet")][0]
        dst = os.path.join(stage, f"b{i}.parquet")
        os.symlink(os.path.join(bdir, part), dst)
        os.utime(dst, (now + i, now + i), follow_symlinks=False)
    sdf = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(stage)
    cmap = os.path.join(root, "cmap")
    ledger = os.path.join(root, "_ledger")
    t0 = time.monotonic()
    q = ST.cluster_ingest_stream(
        sdf,
        map_path=cmap,
        band_index_path=os.path.join(root, "bands"),
        ledger_dir=ledger,
    )
    ST.run_until_drained(q)
    drain = round(time.monotonic() - t0, 3)
    gaps = ledger_gaps(ledger)
    k = min(3, max(1, len(gaps) // 2))
    ledger_files = len(os.listdir(ledger))
    # Correctness at this scale: stream == one-shot clustering.
    all_docs = all_docs.localCheckpoint(eager=True)
    bands = minhash_band_rows(all_docs, "doc_id", "text")
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    want = sorted(
        map(
            tuple,
            connected_components(
                all_docs.select("doc_id"),
                pairs,
                node_col="doc_id",
                src_col="id_a",
                dst_col="id_b",
            ).collect(),
        )
    )
    got = sorted(map(tuple, read_cluster_map(spark, cmap).collect()))
    assert got == want, f"stream != one-shot at {batches} batches"
    return {
        "batches": batches,
        "docs": batches * DOCS_PER_BATCH,
        "drain_s": drain,
        "drain_s_per_batch": round(drain / batches, 3),
        "batch_s_first": round(sum(gaps[:k]) / k, 3) if gaps else None,
        "batch_s_last": round(sum(gaps[-k:]) / k, 3) if gaps else None,
        "ledger_files": ledger_files,
        "stream_equals_one_shot": True,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=3)
    args = ap.parse_args()
    spark = get_spark(app_name="cluster-stream-scale-check")
    spark.sparkContext.setLogLevel("ERROR")
    # Lower the compaction threshold so the 10x run actually crosses it
    # (the production default of 64 is sized for real deployments; the
    # claim here is the BOUND, which needs the fold to fire).
    ST._LEDGER_COMPACT_THRESHOLD = 8
    r: dict = {
        "metric": "cluster_stream_scale",
        "docs_per_batch": DOCS_PER_BATCH,
    }
    one = run_scale(spark, args.batches)
    ten = run_scale(spark, args.batches * 10)
    r["x1"] = one
    r["x10"] = ten
    r["per_batch_ratio"] = round(
        ten["drain_s_per_batch"] / max(one["drain_s_per_batch"], 1e-9), 2
    )
    r["late_vs_early_batch_ratio_x10"] = (
        round(ten["batch_s_last"] / max(ten["batch_s_first"], 1e-9), 2)
        if ten["batch_s_first"]
        else None
    )
    print(json.dumps(r))


if __name__ == "__main__":
    main()
