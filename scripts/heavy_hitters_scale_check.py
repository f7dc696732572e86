"""Scaling datapoint for cms_heavy_hitters: under a LARGE vocabulary
(the regime the operator exists for — the fixture corpus has ~31
tokens, where pre-filtering is moot) the CMS map-side pre-filter must
keep the exact-count shuffle bounded by the candidate set while the
naive group-by-having shuffles the whole vocabulary.

Corpus: zipf-ish token stream with V distinct tokens — a handful of
hot tokens above the share threshold, a long uniform tail below it.
Measured: naive vs prefiltered wall time at 1x and ~8x the stream, and
the candidate-row count the pre-filter lets through.

Usage:  python scripts/heavy_hitters_scale_check.py [--runs 3]
Writes one JSON line to stdout.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import os
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from ue_big_data_project_spark import get_spark
from ue_big_data_project_spark.operators import sketch as SK

V_TAIL = 200_000  # distinct tail tokens
HOT = 8  # tokens above the threshold
SHARE = (1, 100)


def corpus(spark, rows: int):
    """~50% of occurrences spread over HOT hot tokens, the rest over a
    V_TAIL-token uniform tail — deterministic, no RNG."""
    return spark.range(rows).select(
        F.when(
            F.col("id") % 2 == 0,
            F.concat(F.lit("hot"), (F.col("id") % HOT).cast("string")),
        )
        .otherwise(
            F.concat(F.lit("t"), (F.col("id") % V_TAIL).cast("string"))
        )
        .alias("v")
    )


def naive(df, thr_num, thr_den):
    total = df.count()
    thr = (thr_num * total + thr_den - 1) // thr_den
    return (
        df.groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") >= thr)
    )


def timed(fn, runs):
    out = []
    for _ in range(runs + 1):
        t0 = time.monotonic()
        fn()
        out.append(time.monotonic() - t0)
    return round(statistics.median(out[1:]), 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    spark = get_spark(app_name="hh-scale-check")

    r = {"metric": "heavy_hitters_scale", "v_tail": V_TAIL, "hot": HOT}
    for tag, rows in (("1x", 1_000_000), ("8x", 8_000_000)):
        df = corpus(spark, rows)
        r[f"naive_{tag}"] = timed(
            lambda: naive(df, *SHARE).collect(), args.runs
        )
        r[f"cms_{tag}"] = timed(
            lambda: SK.cms_heavy_hitters(
                df, F.col("v"), *SHARE, depth=3, width=4096
            ).collect(),
            args.runs,
        )
        # Sanity: identical answers.
        a = sorted(map(tuple, naive(df, *SHARE).collect()))
        b = sorted(
            map(
                tuple,
                SK.cms_heavy_hitters(
                    df, F.col("v"), *SHARE, depth=3, width=4096
                ).collect(),
            )
        )
        assert a == b, (tag, a[:3], b[:3])
        r[f"hitters_{tag}"] = len(a)
        # SHUFFLE VOLUME — the quantity the operator actually bounds.
        # A hash aggregate's map side emits one row per distinct
        # (partition, key): that is exactly what crosses the naive
        # exchange. The CMS plan's exchanges carry the counter table
        # (≤ depth × width per partition) plus the prefiltered
        # candidate rows' partials.
        pid = F.spark_partition_id().alias("pid")
        r[f"naive_shuffle_rows_{tag}"] = (
            df.select(pid, "v").distinct().count()
        )
        total = df.count()
        thr = (SHARE[0] * total + SHARE[1] - 1) // SHARE[1]
        counters = SK.cms_counters(
            df.select(F.col("v").alias("_hv")),
            F.col("_hv"),
            depth=3,
            width=4096,
        )
        cand = SK.cms_lookup(
            counters,
            df.select(pid, "v").distinct(),
            F.col("v"),
            depth=3,
            width=4096,
        ).filter(F.col("est_count") >= thr)
        r[f"cms_shuffle_rows_{tag}"] = (
            counters.count()  # counter-build exchange (bounded)
            + cand.count()  # candidate partials entering the count
        )
    r["naive_ratio"] = round(r["naive_8x"] / max(r["naive_1x"], 1e-9), 2)
    r["cms_ratio"] = round(r["cms_8x"] / max(r["cms_1x"], 1e-9), 2)
    r["shuffle_reduction_8x"] = round(
        r["naive_shuffle_rows_8x"] / max(r["cms_shuffle_rows_8x"], 1), 1
    )
    print(json.dumps(r))


if __name__ == "__main__":
    main()
