"""Replay-fixture staging shared by the streaming bench queries.

Lives in ``queries/`` (not ``streaming/``) deliberately: the fs-seam
pin (tests/test_fs.py) forbids POSIX metadata calls outside queries/
because symlinks and mtime staggering have no object-store analogue —
these helpers stage LOCAL tempdir micro-batches for the deterministic
bounded replays the bench entries run, and are not production
streaming surface.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import Column, DataFrame


def stage_batches(
    df: DataFrame,
    batch: Column,
    root: str,
    n: int = 3,
) -> str:
    """Stage ``df`` as ``n`` single-file micro-batch inputs for a
    FileStreamSource replay — in ONE Spark job.

    ``batch`` must evaluate to 0..n-1 on every row. The rows land under
    ``<root>/batches/_b=<i>/`` via one partitioned write (each batch
    value hashes to exactly one task of the ``repartition(n, "_b")``,
    and the sort-based dynamic-partition writer emits one file per
    value, so every batch is a single parquet file), then each file is
    symlinked into ``<root>/stage/`` as ``b<i>.parquet`` with strictly
    increasing mtimes on the TARGET (Hadoop's local FS stats the link
    target, so touching the symlink would not enforce batch order —
    round-11 advice). Replaces the previous per-batch
    ``filter → coalesce(1) → write`` loop, which paid ``n`` write jobs
    and ``n`` source scans where one of each suffices (guide §2.4:
    fewer jobs, one pass).

    An empty batch writes no ``_b=<i>`` directory; it is replayed as an
    explicit empty single-file write so batch ids keep their replay
    positions (order-sensitive consumers count on them).

    Returns the stage directory path.
    """
    stage = os.path.join(root, "stage")
    os.makedirs(stage, exist_ok=True)
    broot = os.path.join(root, "batches")
    (
        df.withColumn("_b", batch.cast("int"))
        .repartition(n, "_b")
        .write.partitionBy("_b")
        .parquet(broot)
    )
    now = time.time()
    for i in range(n):
        pdir = os.path.join(broot, f"_b={i}")
        if not os.path.isdir(pdir):
            pdir = os.path.join(broot, f"_b{i}_empty")
            df.filter(batch.cast("int") == i).drop("_b").coalesce(
                1
            ).write.parquet(pdir)
        part = [
            f for f in os.listdir(pdir) if f.endswith(".parquet")
        ][0]
        tgt = os.path.join(pdir, part)
        os.symlink(tgt, os.path.join(stage, f"b{i}.parquet"))
        os.utime(tgt, (now + i, now + i))
    return stage
