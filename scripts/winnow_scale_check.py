"""One-command scaling datapoint for the winnowing family.

Two claims under test:

1. ``text_winnow`` (per-doc selection) is embarrassingly parallel —
   zero shuffles, so wall time scales ~linearly with corpus size
   (ratio ~<= 1.5x per 10x on a box with spare cores, since the extra
   rows fan out across partitions).
2. ``winnow_pairs`` stays inverted-index-bounded at 10x: the selected
   sequence is ~2/(w+1) of grams and the stop-fingerprint cap bounds
   per-hash fan-out, so pair discovery grows with the candidate count
   (~linear for a corpus whose duplicate RATE is constant), never
   O(n^2). To keep the rate constant under replication, every copy
   suffixes its tokens with the copy index — a per-copy bijection on
   the vocabulary, so each copy reproduces the original's near-dup
   pairs exactly (pair count scales by the copy count) while copies
   stay mutually fingerprint-disjoint and per-hash df is unchanged
   (max_df stays put). Naive verbatim replication would instead make
   every doc a copies-way duplicate — output quadratic in copies,
   measuring the data design, not the operator.

Usage:  python scripts/winnow_scale_check.py [--runs 5] [--copies 10]
Writes one JSON line to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from ue_big_data_project_spark import get_spark
from ue_big_data_project_spark.functions import text as TX
from ue_big_data_project_spark.operators.dedup import winnow_pairs
from ue_big_data_project_spark.session import load_tables


def winnow_rows(df):
    staged = df.select(
        "doc_id", TX.gram_hashes("text", k=4).alias("hs")
    ).select(
        "doc_id",
        F.size("hs").cast("int").alias("n_grams"),
        TX.winnow_select(F.col("hs"), w=5).alias("fps"),
    )
    return staged.select(
        "doc_id",
        "n_grams",
        F.size("fps").cast("int").alias("n_fp"),
        TX.winnow_digest(F.col("fps")).alias("fp_digest"),
    )


def replicate(df, copies: int, shift: int = 10_000_000):
    parts = []
    for k in range(copies):
        p = df.withColumn("doc_id", F.col("doc_id") + F.lit(k * shift))
        if k:
            # Per-copy vocabulary bijection (suffix every token): each
            # copy reproduces the original's duplicate structure but is
            # fingerprint-disjoint from every other copy.
            p = p.withColumn(
                "text", F.regexp_replace("text", "(\\S+)", f"$1{k}x")
            )
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def timed(fn, runs: int) -> float:
    samples = []
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        samples.append(time.monotonic() - t0)
    return round(statistics.median(samples), 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        ),
    )
    args = ap.parse_args()

    spark = get_spark(app_name="winnow-scale-check")
    docs = load_tables(spark, args.sf_dir, ("documents",))["documents"]
    big = replicate(docs, args.copies)
    # Materialize inputs once so timings measure the operator, not the
    # parquet scan difference.
    docs = docs.localCheckpoint()
    big = big.localCheckpoint()
    n1, n10 = docs.count(), big.count()

    t_sel_1 = timed(lambda: winnow_rows(docs).count(), args.runs)
    t_sel_10 = timed(lambda: winnow_rows(big).count(), args.runs)

    def pairs(df):
        out = winnow_pairs(
            df, "doc_id", "text", k=4, w=5, min_shared=2, max_df=50
        ).count()
        spark.catalog.clearCache()
        return out

    p1, p10 = pairs(docs), pairs(big)
    t_pairs_1 = timed(lambda: pairs(docs), args.runs)
    t_pairs_10 = timed(lambda: pairs(big), args.runs)

    print(
        json.dumps(
            {
                "docs": [n1, n10],
                "select_sec": [t_sel_1, t_sel_10],
                "select_ratio": round(t_sel_10 / t_sel_1, 2),
                "pairs_found": [p1, p10],
                "pairs_sec": [t_pairs_1, t_pairs_10],
                "pairs_ratio": round(t_pairs_10 / t_pairs_1, 2),
                "copies": args.copies,
                "runs": args.runs,
            }
        )
    )


if __name__ == "__main__":
    main()
