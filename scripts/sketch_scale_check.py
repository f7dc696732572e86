"""Scaling datapoint for the sketch builds: 10x the corpus must grow
the SKETCH not at all (HLL registers are capped at groups x 2^p rows;
CMS counters at depth x width) and the build wall-time roughly with the
scan, not with distinct values.

The claim under test: "the shuffle carries bounded per-group state" —
i.e. a 10x corpus with ~10x distinct values costs ~10x scan but the
shuffled/merged state and the downstream estimate work are CONSTANT.
The exact COUNT(DISTINCT) twin is measured alongside as the contrast:
its shuffle grows with the distinct count.

Usage:  python scripts/sketch_scale_check.py [--runs 5]
Writes one JSON line to stdout; scratch parquet lands under /tmp and
is removed on exit.
"""

from __future__ import annotations

import argparse
import atexit
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from ue_big_data_project_spark import get_spark
from ue_big_data_project_spark.operators import sketch as SK
from ue_big_data_project_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate(df, id_col: str, copies: int, shift: int):
    """Union ``copies`` id-shifted copies — 10x rows AND ~10x distinct
    ids, preserving the per-group value distribution (each copy's keys
    are disjoint, so the distinct count really grows ~copies-fold)."""
    parts = [
        df.withColumn(id_col, F.col(id_col) + F.lit(k * shift))
        for k in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def timed(fn, runs: int) -> list[float]:
    out = []
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        out.append(round(time.monotonic() - t0, 3))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()

    spark = get_spark(app_name="sketch-scale-check")
    scratch = tempfile.mkdtemp(prefix="spark_graft_sketchscale_")
    atexit.register(shutil.rmtree, scratch, ignore_errors=True)

    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"]
    shift = (li.agg(F.max("l_partkey")).collect()[0][0] or 0) + 1
    big_path = scratch + "/lineitem10x"
    replicate(
        li.select("l_returnflag", "l_partkey"),
        "l_partkey",
        args.copies,
        shift,
    ).write.mode("overwrite").parquet(big_path)
    big = spark.read.parquet(big_path)

    def hll_build(df):
        def run():
            spark.catalog.clearCache()
            SK.hll_estimate(
                SK.hll_registers(
                    df, ["l_returnflag"],
                    F.col("l_partkey").cast("string"), p=6,
                ),
                ["l_returnflag"], p=6,
            ).collect()
        return run

    def exact_distinct(df):
        def run():
            spark.catalog.clearCache()
            df.groupBy("l_returnflag").agg(
                F.countDistinct("l_partkey")
            ).collect()
        return run

    def qhist_exact(df):
        # The histogram-pruned exact order statistic (the same plan
        # sketch_qhist_prices runs on cents; here on the partkey id so
        # the 10x copy genuinely widens the value domain too).
        def run():
            spark.catalog.clearCache()
            SK.qhist_exact_quantiles(
                df, ["l_returnflag"], F.col("l_partkey"),
                [("p50", 1, 2), ("p95", 19, 20)],
            ).collect()
        return run

    def naive_exact(df):
        from pyspark.sql import Window

        w = Window.partitionBy("l_returnflag").orderBy("v")

        def run():
            spark.catalog.clearCache()
            vdf = df.select("l_returnflag", F.col("l_partkey").alias("v"))
            ranked = vdf.select(
                "l_returnflag", "v",
                F.row_number().over(w).alias("rn"),
                F.count(F.lit(1)).over(
                    Window.partitionBy("l_returnflag")
                ).alias("n"),
            )
            ranked.filter(
                (F.col("rn") == F.expr("CAST((n + 1) DIV 2 AS BIGINT)"))
                | (F.col("rn") == F.expr("CAST((19 * n + 19) DIV 20 AS BIGINT)"))
            ).collect()
        return run

    def med(samples):
        return round(statistics.median(samples[1:]), 3)  # drop warmup

    r = {
        "metric": "sketch_scale_ratio",
        "copies": args.copies,
        "sf_dir": SF_DIR,
        "hll_1x": med(timed(hll_build(li), args.runs + 1)),
        "hll_10x": med(timed(hll_build(big), args.runs + 1)),
        "exact_1x": med(timed(exact_distinct(li), args.runs + 1)),
        "exact_10x": med(timed(exact_distinct(big), args.runs + 1)),
        "qhist_1x": med(timed(qhist_exact(li), args.runs + 1)),
        "qhist_10x": med(timed(qhist_exact(big), args.runs + 1)),
        "naive_q_1x": med(timed(naive_exact(li), args.runs + 1)),
        "naive_q_10x": med(timed(naive_exact(big), args.runs + 1)),
        "registers_1x": SK.hll_registers(
            li, ["l_returnflag"], F.col("l_partkey").cast("string"), p=6
        ).count(),
        "registers_10x": SK.hll_registers(
            big, ["l_returnflag"], F.col("l_partkey").cast("string"), p=6
        ).count(),
    }
    r["hll_ratio"] = round(r["hll_10x"] / max(r["hll_1x"], 1e-9), 2)
    r["exact_ratio"] = round(r["exact_10x"] / max(r["exact_1x"], 1e-9), 2)
    r["qhist_ratio"] = round(r["qhist_10x"] / max(r["qhist_1x"], 1e-9), 2)
    r["naive_q_ratio"] = round(
        r["naive_q_10x"] / max(r["naive_q_1x"], 1e-9), 2
    )
    print(json.dumps(r))


if __name__ == "__main__":
    main()
