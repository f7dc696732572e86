"""Batch vs streaming sessionization equivalence.

The applyInPandasWithState operator must reproduce the batch
window-expression result exactly on a drained bounded replay. In update
mode a session row re-emits as it grows, so the stream result is reduced
to its final emission per (user, session) before comparing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ue_big_data_project_spark.operators.sessions import (
    sessionize_batch,
    sessionize_stream,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    from ue_big_data_project_spark.session import load_tables

    return load_tables(spark, SF_DIR, ("events",))["events"]


def _final_sessions(df):
    return (
        df.groupBy("user_id", "session_idx")
        .agg(
            F.max("n_events").alias("n_events"),
            F.min("start_us").alias("start_us"),
            F.max("end_us").alias("end_us"),
        )
    )


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_matches_batch(spark, events):
    import os

    from ue_big_data_project_spark import streaming as ST

    batch = sessionize_batch(events, gap_seconds=1800)
    sdf = ST.replay_parquet(spark, os.path.join(SF_DIR, "events.parquet"))
    from pyspark.sql import types as T

    if isinstance(sdf.schema["ts"].dataType, T.LongType):
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    streamed = sessionize_stream(sdf, gap_seconds=1800)
    drained = ST.drain_to_table(spark, streamed, mode="update")
    assert rows(_final_sessions(drained)) == rows(batch)


def test_stream_with_eviction_matches_batch(spark, events):
    """The event-time-timeout twin (watermark eviction enabled) must
    produce the same final sessions as batch: timed-out keys re-emit
    their final open session before state removal, which the
    final-emission reduce absorbs."""
    import os

    from ue_big_data_project_spark import streaming as ST

    batch = sessionize_batch(events, gap_seconds=1800)
    sdf = ST.replay_parquet(spark, os.path.join(SF_DIR, "events.parquet"))
    from pyspark.sql import types as T

    if isinstance(sdf.schema["ts"].dataType, T.LongType):
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    streamed = sessionize_stream(sdf, gap_seconds=1800, watermark="1 hour")
    drained = ST.drain_to_table(spark, streamed, mode="update")
    assert rows(_final_sessions(drained)) == rows(batch)


def test_batch_sessions_sane(events):
    out = sessionize_batch(events, gap_seconds=1800)
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == events.count()
    bad = out.filter(F.col("end_us") < F.col("start_us")).count()
    assert bad == 0
