"""Property-based checks (hypothesis): randomized inputs must keep the
as-of strategy family in agreement and sessionization internally
consistent. Small example counts — each example runs Spark jobs."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ue_big_data_project_spark.operators.asof import asof_join
from ue_big_data_project_spark.operators.sessions import sessionize_batch

EPOCH = dt.datetime(2024, 1, 1)

ts_strategy = st.integers(min_value=0, max_value=200_000).map(
    lambda s: EPOCH + dt.timedelta(seconds=s)
)

lefts = st.lists(ts_strategy, min_size=1, max_size=12, unique=True)
rights = st.lists(ts_strategy, min_size=1, max_size=12)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lts=lefts, rts=rights, strict=st.booleans(), fwd=st.booleans())
def test_asof_strategies_agree_on_random_data(spark, lts, rts, strict, fwd):
    left = spark.createDataFrame(
        [(i, t) for i, t in enumerate(lts)], "id int, lts timestamp"
    )
    right = spark.createDataFrame([(t,) for t in rts], "rts timestamp")
    kwargs = dict(
        left_ts="lts",
        right_ts="rts",
        left_keys=["id"],
        right_cols=["rts"],
        strict=strict,
        direction="forward" if fwd else "backward",
    )
    out = {}
    # sorted_array is exercised in the deterministic unit tests instead:
    # its outer-reference HOF lambda can hit a transient Spark binding
    # error under rapid AQE replanning (see asof.py docstring).
    for strategy in ["broadcast_rank", "bucket_minima"]:
        df = asof_join(left, right, strategy=strategy, **kwargs)
        out[strategy] = sorted(
            (r["id"], r["asof"]["rts"]) for r in df.collect()
        )
    assert out["bucket_minima"] == out["broadcast_rank"]


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # user
        st.integers(min_value=0, max_value=50_000),  # seconds offset
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=events_strategy, gap=st.sampled_from([60, 600, 3600]))
def test_sessionize_invariants(spark, rows, gap):
    df = spark.createDataFrame(
        [(u, EPOCH + dt.timedelta(seconds=s)) for u, s in rows],
        "user_id long, ts timestamp",
    )
    out = sessionize_batch(df, gap_seconds=gap).collect()
    # Conservation: every event lands in exactly one session.
    assert sum(r["n_events"] for r in out) == len(rows)
    by_user: dict[int, list] = {}
    for r in out:
        assert r["start_us"] <= r["end_us"]
        by_user.setdefault(r["user_id"], []).append(r)
    for sessions in by_user.values():
        sessions.sort(key=lambda r: r["session_idx"])
        for a, b in zip(sessions, sessions[1:]):
            # Consecutive sessions are separated by more than the gap.
            assert b["start_us"] - a["end_us"] > gap * 1_000_000
            assert b["session_idx"] == a["session_idx"] + 1
