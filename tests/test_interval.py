"""Binned range join (operators/interval.py): equivalence to the naive
theta join, exactly-once pair emission, and the bin-width contract."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from ue_big_data_project_spark.operators.interval import (
    point_in_interval_join,
)


BASE = dt.datetime(2024, 1, 1)


def _mk(spark, points, intervals):
    p = spark.createDataFrame(
        [(i, BASE + dt.timedelta(seconds=s)) for i, s in points],
        "pid long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [
            (j, BASE + dt.timedelta(seconds=a), BASE + dt.timedelta(seconds=b))
            for j, a, b in intervals
        ],
        "iid long, start_ts timestamp, end_ts timestamp",
    )
    return p, iv


def test_matches_naive_theta_join(spark):
    # Deterministic pseudo-random layout: points every 37 s, intervals
    # of varying length (≤ 300 s) at varying offsets, including
    # bin-edge-straddling and zero-length intervals.
    points = [(i, (i * 37) % 3600) for i in range(200)]
    intervals = [
        (j, (j * 113) % 3500, (j * 113) % 3500 + (j * 53) % 301)
        for j in range(60)
    ]
    p, iv = _mk(spark, points, intervals)
    got = sorted(
        (r["pid"], r["iid"])
        for r in point_in_interval_join(
            p, iv, "ts", "start_ts", "end_ts", bin_seconds=300
        ).collect()
    )
    want = sorted(
        (r["pid"], r["iid"])
        for r in p.join(
            iv,
            (F.col("ts") >= F.col("start_ts"))
            & (F.col("ts") <= F.col("end_ts")),
        ).collect()
    )
    assert got == want
    assert len(got) == len(set(got)), "pair emitted more than once"
    assert got, "fixture produced no overlaps"


def test_extra_cond_applies(spark):
    p, iv = _mk(spark, [(1, 50), (2, 150)], [(1, 0, 200), (2, 100, 200)])
    got = sorted(
        (r["pid"], r["iid"])
        for r in point_in_interval_join(
            p,
            iv,
            "ts",
            "start_ts",
            "end_ts",
            bin_seconds=600,
            extra_cond=F.col("pid") != F.col("iid"),
        ).collect()
    )
    assert got == [(2, 1)]  # (1,1) and (2,2) suppressed by the condition


def test_oversized_interval_fails_loudly(spark):
    p, iv = _mk(spark, [(1, 50)], [(1, 0, 1000)])
    with pytest.raises(Exception) as e:
        point_in_interval_join(
            p, iv, "ts", "start_ts", "end_ts", bin_seconds=300
        ).collect()
    assert "interval longer than bin_seconds" in str(e.value)


def test_outer_rejected(spark):
    p, iv = _mk(spark, [(1, 50)], [(1, 0, 100)])
    with pytest.raises(ValueError):
        point_in_interval_join(
            p, iv, "ts", "start_ts", "end_ts", bin_seconds=300, how="left"
        )
