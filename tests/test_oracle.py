"""Every registered query hash-matches its DuckDB oracle (the driver's
t2 gate, pre-verified here at sf0.001 so regressions surface locally)."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from ue_big_data_project_spark.queries import all_queries

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

_REGISTRY = all_queries()
_WITH_ORACLE = sorted(n for n, s in _REGISTRY.items() if s.oracle)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = _REGISTRY[name]
    got = normalize(spec.fn(spark, sf_dir).toPandas())
    con = duck_con(sf_dir)
    want = normalize(con.sql(spec.oracle).df())
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_all_queries_have_unique_names():
    assert len(_REGISTRY) == len(set(_REGISTRY))


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() >= 0
