"""Driver-sim: run the CORRECTNESS gate the way the driver does.

A VANILLA ``local[8]`` SparkSession (none of ``get_spark``'s tuning —
the driver builds its own session, so the gate must be green without
our conf), each GATE_ORDER query at sf0.01 (override with
``SPARK_GRAFT_SIM_SF_DIR``), compared against its DuckDB oracle on the
same parquet: row count, sorted schema, and order-insensitive value
equality (exact frame compare after sorting columns by name and rows by
value — strictly stronger than the driver's value hash).

Usage::

    python scripts/driver_sim.py            # full gate
    python scripts/driver_sim.py name1 ...  # subset

Prints one status line per query and a final summary; exit code 1 on
any mismatch. Every round's rotation gets this pass BEFORE the commit
that re-freezes the gate (the "driver-sim before product commits"
hygiene invariant, rounds 8-12).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from ue_big_data_project_spark.queries import GATE_ORDER, all_queries

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SIM_SF_DIR", "/root/testdata/sf0.01")
    names = sys.argv[1:] or list(GATE_ORDER)
    registry = all_queries()

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    failures: list[str] = []
    for name in names:
        spec = registry[name]
        t0 = time.perf_counter()
        try:
            got = normalize(spec.fn(spark, sf_dir).toPandas())
            if spec.oracle is None:
                status = f"rows-only n={len(got)}"
            else:
                want = normalize(con.sql(spec.oracle).df())
                if len(got) != len(want):
                    raise AssertionError(
                        f"rows {len(got)} != {len(want)}"
                    )
                pd.testing.assert_frame_equal(
                    got, want, check_dtype=False, check_exact=True
                )
                status = f"MATCH n={len(got)}"
        except Exception as e:  # noqa: BLE001 - report and continue
            status = f"FAIL {type(e).__name__}: {str(e)[:200]}"
            failures.append(name)
        print(f"{name:40s} {status}  ({time.perf_counter() - t0:.1f}s)")
        sys.stdout.flush()

    print(f"\n{len(names) - len(failures)}/{len(names)} green", end="")
    if failures:
        print(f"  FAILURES: {failures}")
        return 1
    print()
    return 0


if __name__ == "__main__":
    sys.exit(main())
