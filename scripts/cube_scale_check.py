"""Scaling datapoint for hll_cube: the exact distinct CUBE pays the
Expand-multiplied shuffle (every row duplicated into all 2^d grouping
sets, partials carrying the full distinct key space), while the sketch
cube scans once for the bounded leaf register table and rolls the
lattice up by min-merge over registers, never data.

Measured at 1x and 10x a synthetic corpus whose distinct count grows
with the rows (the regime where exact distinct partials cannot absorb):
wall time for both plans, the register-table row count (must stay
CONSTANT per group structure), and exact == lattice verification of
the grouping structure.

Usage:  python scripts/cube_scale_check.py [--runs 3]
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
from ue_big_data_project_spark.operators.sketch import hll_cube

P = 8  # 256 registers: keeps the register table visibly bounded while
#       the corpus distincts grow 10x


def corpus(spark, rows: int):
    """rows/5 distinct values spread over a 3 x 4 dim grid."""
    return spark.range(rows).select(
        (F.col("id") % 3).cast("string").alias("a"),
        (F.col("id") % 4).cast("string").alias("b"),
        F.concat(
            F.lit("v"), ((F.col("id") * 2654435761) % (rows // 5)).cast("string")
        ).alias("v"),
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
    spark = get_spark(app_name="cube-scale-check")
    spark.sparkContext.setLogLevel("ERROR")

    r: dict = {"metric": "hll_cube_scale", "p": P, "dims": ["a", "b"]}
    for tag, rows in (("1x", 1_000_000), ("10x", 10_000_000)):
        df = corpus(spark, rows)
        r[f"exact_cube_{tag}"] = timed(
            lambda: df.cube("a", "b")
            .agg(F.countDistinct("v"))
            .collect(),
            args.runs,
        )
        r[f"sketch_cube_{tag}"] = timed(
            lambda: hll_cube(df, ["a", "b"], F.col("v"), p=P).collect(),
            args.runs,
        )
        # The bounded-state claim: leaf registers <= groups x 2^p
        # however many rows/distincts scan.
        from ue_big_data_project_spark.operators.sketch import hll_registers

        r[f"leaf_register_rows_{tag}"] = hll_registers(
            df, ["a", "b"], F.col("v"), p=P
        ).count()
        # Structure check: same grouping rows out of both plans.
        n_exact = df.cube("a", "b").agg(F.countDistinct("v")).count()
        n_sketch = hll_cube(df, ["a", "b"], F.col("v"), p=P).count()
        assert n_exact == n_sketch == 20, (n_exact, n_sketch)
    r["exact_ratio"] = round(r["exact_cube_10x"] / max(r["exact_cube_1x"], 1e-9), 2)
    r["sketch_ratio"] = round(
        r["sketch_cube_10x"] / max(r["sketch_cube_1x"], 1e-9), 2
    )
    print(json.dumps(r))


if __name__ == "__main__":
    main()
