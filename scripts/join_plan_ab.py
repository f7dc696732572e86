"""Planning-cost A/B for sketch_join_plan (round-7 verdict task 4).

The round-7 planner paid ``big.count()`` PLUS a full CMS counter build
— two full scans of the big side — before choosing a strategy. Round 8
(a) FUSES both planning numbers into the counter build's single bounded
aggregate (row 0's counters partition the keys, so their sum is the
exact row count), and (b) adds ``planning_fraction`` so the fused pass
can run over a Bernoulli sample (the skew test is a ratio, so the
fraction cancels; the safety factor errs only toward salted).

Measured here: planning wall-time of the r7 shape vs the fused exact
pass vs the sampled pass, at 1x and 10x a skewed synthetic big side —
and that all three reach the SAME strategy at both scales (the kl
persist A/B precedent: measure both ways before changing a default).

Usage:  python scripts/join_plan_ab.py [--runs 3]
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
from ue_big_data_project_spark.operators import sketch as SK
from ue_big_data_project_spark.operators import skew as SKW


def big_side(spark, rows: int):
    """90% of rows share one hot key, tail uniform over 100k keys."""
    return spark.range(rows).select(
        F.when(F.col("id") % 10 < 9, F.lit(7))
        .otherwise(F.col("id") % 100_000)
        .alias("k"),
        F.col("id").alias("payload"),
    )


def plan_r7(big, parts: int, skew_ratio: int = 8):
    """The round-7 planning pass, verbatim shape: full count + full CMS."""
    n_big = big.count()
    key = F.concat_ws("\x1f", F.col("k").cast("string"))
    max_freq = (
        SK.cms_counters(big.select(key.alias("_k")), F.col("_k"))
        .agg(F.max("cnt").alias("m"))
        .collect()[0]["m"]
    ) or 0
    avg_load = max(n_big // max(parts, 1), 1)
    return "salted" if max_freq >= skew_ratio * avg_load else "shuffle"


def plan_r8(big, other, fraction):
    joined, d = SKW.sketch_join_plan(
        big,
        other,
        ["k"],
        broadcast_rows=10,  # force past the broadcast branch
        skew_ratio=8,
        planning_fraction=fraction,
    )
    return d["strategy"]


def timed(fn, runs):
    out = []
    for _ in range(runs + 1):
        t0 = time.monotonic()
        fn()
        out.append(time.monotonic() - t0)
    return round(statistics.median(out[1:]), 3), out[-1]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    spark = get_spark(app_name="join-plan-ab")
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    other = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("attr")
    )

    r = {"metric": "join_plan_planning_ab", "runs": args.runs}
    for tag, rows in (("1x", 2_000_000), ("10x", 20_000_000)):
        big = big_side(spark, rows)
        decisions = {}
        decisions["r7"] = plan_r7(big, parts)
        r[f"r7_two_scans_{tag}"], _ = timed(
            lambda: plan_r7(big, parts), args.runs
        )
        decisions["fused"] = plan_r8(big, other, None)
        r[f"r8_fused_exact_{tag}"], _ = timed(
            lambda: plan_r8(big, other, None), args.runs
        )
        decisions["sampled"] = plan_r8(big, other, 0.01)
        r[f"r8_sampled_1pct_{tag}"], _ = timed(
            lambda: plan_r8(big, other, 0.01), args.runs
        )
        assert len(set(decisions.values())) == 1, (tag, decisions)
        r[f"decision_{tag}"] = decisions["fused"]
    for mode in ("r7_two_scans", "r8_fused_exact", "r8_sampled_1pct"):
        r[f"{mode}_ratio"] = round(
            r[f"{mode}_10x"] / max(r[f"{mode}_1x"], 1e-9), 2
        )
    print(json.dumps(r))


if __name__ == "__main__":
    main()
