"""Streaming scale datapoint (round-7 verdict task 6): the batch side
has seven measured 10x points; this adds the streaming one.

``hll_ingest_stream`` replays a corpus as real micro-batches
(maxFilesPerTrigger=1) and lands one bounded register partition per
batch. Claims under test at 10x the replayed input (10x the batches,
same batch size — the unbounded-stream axis):

- drain wall-time grows ~linearly with the batch count (per-batch cost
  flat: no state accumulates in the query itself);
- the register SIDECAR grows only with batches x groups x 2^p — each
  partition is bounded regardless of batch width — and the rollup read
  stays a bounded scan of the sidecar, never of the ingested data;
- stream == batch: the folded estimate equals the single-pass batch
  estimate at BOTH scales (the idempotent-merge correctness contract).

Usage:  python scripts/streaming_scale_check.py [--batches 4]
Writes one JSON line to stdout; scratch parquet lands under /tmp and is
removed on exit.
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
from ue_big_data_project_spark.operators.sketch import (
    hll_estimate,
    hll_registers,
)

P = 6
ROWS_PER_BATCH = 50_000
GROUPS = 4


def corpus(spark, batches: int):
    """batches x ROWS_PER_BATCH rows, ~batches*12k distinct values per
    group — distincts GROW with the stream, the regime where only a
    bounded sketch survives."""
    n = batches * ROWS_PER_BATCH
    return spark.range(n).select(
        (F.col("id") % GROUPS).cast("string").alias("grp"),
        ((F.col("id") * 2654435761) % (n // 4)).cast("string").alias("v"),
    )


def dir_stats(path: str) -> tuple[int, int]:
    files = rows = 0
    total = 0
    for root, _, names in os.walk(path):
        for f in names:
            if f.endswith(".parquet"):
                files += 1
                total += os.path.getsize(os.path.join(root, f))
    return files, total


def run_scale(spark, batches: int) -> dict:
    root = tempfile.mkdtemp(prefix=f"hll_stream_{batches}_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    stage = os.path.join(root, "stage")
    df = corpus(spark, batches)
    df.repartition(batches).write.parquet(stage)
    sdf = (
        spark.readStream.schema("grp string, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    reg_dir = os.path.join(root, "registers")
    t0 = time.monotonic()
    q = ST.hll_ingest_stream(sdf, reg_dir, ["grp"], "v", p=P)
    ST.run_until_drained(q)
    drain_s = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    est = {
        r["grp"]: r["est_distinct"]
        for r in ST.read_hll_rollup(spark, reg_dir, ["grp"], p=P).collect()
    }
    rollup_s = round(time.monotonic() - t0, 3)

    sidecar_rows = spark.read.parquet(reg_dir).count()
    _, sidecar_bytes = dir_stats(reg_dir)

    batch_est = {
        r["grp"]: r["est_distinct"]
        for r in hll_estimate(
            hll_registers(df, ["grp"], F.col("v"), p=P), ["grp"], p=P
        ).collect()
    }
    assert est == batch_est, (batches, est, batch_est)
    return {
        "batches": batches,
        "rows": batches * ROWS_PER_BATCH,
        "drain_s": drain_s,
        "drain_s_per_batch": round(drain_s / batches, 3),
        "rollup_read_s": rollup_s,
        "sidecar_rows": sidecar_rows,
        "sidecar_bytes": sidecar_bytes,
        "stream_equals_batch": True,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=4)
    args = ap.parse_args()
    spark = get_spark(app_name="streaming-scale-check")
    spark.sparkContext.setLogLevel("ERROR")

    r: dict = {"metric": "streaming_hll_scale", "p": P, "groups": GROUPS}
    one = run_scale(spark, args.batches)
    ten = run_scale(spark, args.batches * 10)
    r["x1"] = one
    r["x10"] = ten
    r["drain_ratio"] = round(ten["drain_s"] / max(one["drain_s"], 1e-9), 2)
    r["per_batch_ratio"] = round(
        ten["drain_s_per_batch"] / max(one["drain_s_per_batch"], 1e-9), 2
    )
    r["sidecar_rows_ratio"] = round(
        ten["sidecar_rows"] / max(one["sidecar_rows"], 1), 2
    )
    r["rollup_read_ratio"] = round(
        ten["rollup_read_s"] / max(one["rollup_read_s"], 1e-9), 2
    )
    print(json.dumps(r))


if __name__ == "__main__":
    main()
