"""Scaling datapoint for the two streaming MERGE sinks: per-batch cost
of the copy-on-write sink grows with SNAPSHOT size (every batch
rewrites the whole snapshot), while the bucketed/manifest sink's grows
with TOUCHED BUCKETS only — the property that makes continuous MERGE
viable at 100 TB.

Fixture: an initial snapshot of S rows (~260 B/row); 3 single-key
change batches (each touches exactly 1 of 32 buckets after bootstrap).
Measured at S and 10S: WRITE AMPLIFICATION — bytes written per
post-bootstrap batch (v=1's dir size; the load-independent quantity
that actually scales with snapshot size) — plus drain wall-time for
context. On this box wall-times barely separate (a page-cached NVMe
absorbs a ~1.3 GB rewrite inside micro-batch overhead); bytes do not
lie: the copy-on-write sink rewrites the whole snapshot per batch, the
bucketed sink one bucket.

Usage:  python scripts/merge_scale_check.py
Writes one JSON line to stdout; scratch dirs under /tmp removed at exit.
"""

from __future__ import annotations

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

N_BUCKETS = 32


def staged_batches(spark, root: str, keys=(7, 9, 11)) -> "DataFrame":
    stage = os.path.join(root, "stage")
    os.makedirs(stage)
    now = time.time()
    for i, key in enumerate(keys):
        bdir = os.path.join(root, f"c{i}")
        spark.createDataFrame(
            [(int(key), 1.0)], "id long, delta double"
        ).coalesce(1).write.parquet(bdir)
        part = [f for f in os.listdir(bdir) if f.endswith(".parquet")][0]
        dst = os.path.join(stage, f"c{i}.parquet")
        os.symlink(os.path.join(bdir, part), dst)
        os.utime(dst, (now + i, now + i), follow_symlinks=False)
    return spark.readStream.schema("id long, delta double").option(
        "maxFilesPerTrigger", 1
    ).parquet(stage)


def dir_bytes(d: str) -> int:
    out = 0
    for r_, _, fls in os.walk(d):
        out += sum(os.path.getsize(os.path.join(r_, f)) for f in fls)
    return out


def run_many_batches(
    spark, rows: int, n_batches: int, bucketed: bool, retain: int = 3
) -> dict:
    """Round-8 verdict tasks 5+7: an N-batch drain of one sink —
    per-batch wall time (ledger-marker mtimes), BYTES written per
    post-bootstrap version, version-dir count after retention, and the
    latest-snapshot read latency at the end. Under retention both the
    dir count and the read cost must stay FLAT in N (the manifests
    accumulate, but each is a few hundred bytes and readers open ONE)."""
    root = tempfile.mkdtemp(
        prefix=f"merge_many_{rows}_{n_batches}_{bucketed}_"
    )
    try:
        initial = spark.range(rows).select(
            F.col("id"),
            (F.col("id") % 97).cast("double").alias("bal"),
            F.repeat(F.concat(F.lit("p"), F.col("id").cast("string")), 32)
            .alias("pad"),
        )
        # One distinct key per batch, spread across the id range so
        # successive batches touch different buckets.
        sdf = staged_batches(
            spark,
            root,
            keys=[(i * 7919) % rows for i in range(n_batches)],
        )
        snap = os.path.join(root, "snap")
        kwargs = dict(
            update_set={"bal": F.col("t.bal") + F.col("s.delta")},
            retain_versions=retain,
        )
        t0 = time.monotonic()
        if bucketed:
            q = ST.bucketed_merge_ingest_stream(
                sdf, initial, snap, ["id"], n_buckets=N_BUCKETS, **kwargs
            )
        else:
            q = ST.merge_ingest_stream(sdf, initial, snap, ["id"], **kwargs)
        ST.run_until_drained(q)
        drain = round(time.monotonic() - t0, 3)
        ledger = os.path.join(snap, "_ledger")
        marks = sorted(
            (int(f[len("batch-"):-len(".done")]),
             os.path.getmtime(os.path.join(ledger, f)))
            for f in os.listdir(ledger)
            if f.endswith(".done")
        )
        gaps = [
            round(t_b - t_a, 3)
            for (_, t_a), (_, t_b) in zip(marks, marks[1:])
        ]
        k = min(5, max(1, len(gaps) // 2))
        version_dirs = [
            d for d in os.listdir(snap) if d.startswith("v=")
        ]
        per_version = sorted(
            dir_bytes(os.path.join(snap, d)) for d in version_dirs
        )
        t1 = time.monotonic()
        if bucketed:
            n_read = ST.read_bucketed_merged_snapshot(spark, snap).count()
        else:
            n_read = ST.read_merged_snapshot(spark, snap).count()
        read_s = round(time.monotonic() - t1, 3)
        assert n_read == rows
        return {
            "drain_s": drain,
            "batch_s_first": round(sum(gaps[:k]) / k, 3),
            "batch_s_last": round(sum(gaps[-k:]) / k, 3),
            "version_dirs": len(version_dirs),
            "median_version_bytes": per_version[len(per_version) // 2],
            "read_s": read_s,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def run_sink(spark, rows: int, bucketed: bool) -> dict:
    root = tempfile.mkdtemp(prefix=f"merge_scale_{rows}_{bucketed}_")
    try:
        # ~260 B/row payload so the snapshot rewrite is real I/O, not
        # per-batch fixed overhead (first attempt at 2-long rows showed
        # NOTHING: 2M skinny rows rewrite in under the scheduler noise).
        initial = spark.range(rows).select(
            F.col("id"),
            (F.col("id") % 97).cast("double").alias("bal"),
            F.repeat(F.concat(F.lit("p"), F.col("id").cast("string")), 32)
            .alias("pad"),
        )
        sdf = staged_batches(spark, root)
        snap = os.path.join(root, "snap")
        kwargs = dict(
            update_set={"bal": F.col("t.bal") + F.col("s.delta")},
        )
        batch_times: list[float] = []
        # Wrap the ledger-visible progress: time each micro-batch from
        # the driver by polling lastProgress between availability waits
        # is racy; instead time the WHOLE drain and per-batch via the
        # ledger mtimes (marker written right after each batch commits).
        t0 = time.monotonic()
        if bucketed:
            q = ST.bucketed_merge_ingest_stream(
                sdf, initial, snap, ["id"], n_buckets=N_BUCKETS, **kwargs
            )
        else:
            q = ST.merge_ingest_stream(sdf, initial, snap, ["id"], **kwargs)
        ST.run_until_drained(q)
        total = round(time.monotonic() - t0, 3)
        ledger = os.path.join(snap, "_ledger")
        marks = sorted(
            (int(f[len("batch-"):-len(".done")]),
             os.path.getmtime(os.path.join(ledger, f)))
            for f in os.listdir(ledger)
            if f.endswith(".done")
        )
        for (b0, t_a), (b1, t_b) in zip(marks, marks[1:]):
            batch_times.append(round(t_b - t_a, 3))
        # batch_times[i] ~ time of batch i+1 (post-bootstrap batches).
        v1 = os.path.join(snap, "v=1")
        return {
            "drain_s": total,
            "post_bootstrap_batch_s": batch_times,
            "v1_bytes": dir_bytes(v1),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    spark = get_spark(app_name="merge-scale-check")
    spark.sparkContext.setLogLevel("ERROR")
    r: dict = {"metric": "merge_sink_scale", "n_buckets": N_BUCKETS}
    for tag, rows in (("1x", 500_000), ("10x", 5_000_000)):
        for name, bucketed in (("cow", False), ("bucketed", True)):
            stats = run_sink(spark, rows, bucketed)
            r[f"{name}_{tag}_drain_s"] = stats["drain_s"]
            r[f"{name}_{tag}_batch_s"] = stats["post_bootstrap_batch_s"]
            r[f"{name}_{tag}_v1_bytes"] = stats["v1_bytes"]
    for name in ("cow", "bucketed"):
        a = sum(r[f"{name}_1x_batch_s"]) / max(len(r[f"{name}_1x_batch_s"]), 1)
        b = sum(r[f"{name}_10x_batch_s"]) / max(
            len(r[f"{name}_10x_batch_s"]), 1
        )
        r[f"{name}_batch_ratio_10x"] = round(b / max(a, 1e-9), 2)
        r[f"{name}_bytes_ratio_10x"] = round(
            r[f"{name}_10x_v1_bytes"] / max(r[f"{name}_1x_v1_bytes"], 1), 2
        )
    r["write_amp_cow_over_bucketed_10x"] = round(
        r["cow_10x_v1_bytes"] / max(r["bucketed_10x_v1_bytes"], 1), 1
    )
    # Retention flatness (verdict task 5): 10 vs 50 batches through the
    # bucketed sink — version-dir count and read latency must not grow
    # with batch count.
    for tag, nb in (("b10", 10), ("b50", 50)):
        s = run_many_batches(spark, 500_000, nb, bucketed=True)
        for key, val in s.items():
            r[f"bucketed_{tag}_{key}"] = val
    r["retention_read_ratio_50_over_10"] = round(
        r["bucketed_b50_read_s"] / max(r["bucketed_b10_read_s"], 1e-9), 2
    )
    r["retention_dirs_ratio_50_over_10"] = round(
        r["bucketed_b50_version_dirs"]
        / max(r["bucketed_b10_version_dirs"], 1),
        2,
    )
    # 10x-snapshot, 10x-batches wall-time point, both sinks (verdict
    # task 7): 30 batches against the 5M-row snapshot.
    for name, bucketed in (("cow", False), ("bucketed", True)):
        s = run_many_batches(spark, 5_000_000, 30, bucketed=bucketed)
        for key, val in s.items():
            r[f"{name}_10x_b30_{key}"] = val
    r["drain_10x_b30_cow_over_bucketed"] = round(
        r["cow_10x_b30_drain_s"] / max(r["bucketed_10x_b30_drain_s"], 1e-9),
        2,
    )
    r["bytes_10x_b30_cow_over_bucketed"] = round(
        r["cow_10x_b30_median_version_bytes"]
        / max(r["bucketed_10x_b30_median_version_bytes"], 1),
        1,
    )
    print(json.dumps(r))


if __name__ == "__main__":
    main()
