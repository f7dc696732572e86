"""One-command scaling datapoint for BPE token accounting.

Claim under test: ``bpe_token_counts`` is one zero-shuffle Arrow pass
whose per-row cost is amortized by per-batch word memoization, so wall
time scales ~linearly per 10× rows (sub-10× on a box with spare
cores) and is insensitive to raw word-occurrence counts (the memo
means cost tracks DISTINCT words per batch, which Zipf keeps tiny).
Replicated copies keep doc ids distinct but reuse the original texts —
exactly the repetition real corpora have.

Usage:  python scripts/bpe_scale_check.py [--runs 3] [--copies 10]
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
from ue_big_data_project_spark.operators.bpe import bpe_token_counts
from ue_big_data_project_spark.queries.textops import BPE_MERGES
from ue_big_data_project_spark.session import load_tables


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    spark = get_spark(app_name="bpe-scale-check")
    docs = load_tables(spark, args.sf, ("documents",))["documents"].select(
        "doc_id", "text"
    )
    par = spark.sparkContext.defaultParallelism

    def corpus(copies: int):
        c = docs
        for k in range(1, copies):
            c = c.unionByName(
                docs.select(
                    (F.col("doc_id") + k * 1_000_000).alias("doc_id"),
                    "text",
                )
            )
        return c.repartition(par, "doc_id").localCheckpoint(eager=True)

    def wall(c):
        ts = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            bpe_token_counts(c, list(BPE_MERGES)).write.mode(
                "overwrite"
            ).format("noop").save()
            ts.append(round(time.perf_counter() - t0, 3))
        return round(statistics.median(ts), 3)

    one = wall(corpus(1))
    ten = wall(corpus(args.copies))
    print(
        json.dumps(
            {
                "metric": "bpe_scale_check",
                "copies": args.copies,
                "encode_1x_sec": one,
                "encode_10x_sec": ten,
                "ratio": round(ten / one, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
