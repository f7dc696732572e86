"""CDC upsert (operators/cdc.py): latest-version-wins, tombstones drop
keys, and same-version ties resolve to the change batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from ue_big_data_project_spark.operators.cdc import upsert_latest


def _snap(spark):
    return spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0), (3, "c", 5)],
        "k long, v string, ver long",
    )


def test_update_insert_delete(spark):
    chg = spark.createDataFrame(
        [(1, "a2", 1, False), (4, "d", 1, False), (2, "b", 1, True)],
        "k long, v string, ver long, dead boolean",
    )
    got = {
        r["k"]: (r["v"], r["ver"])
        for r in upsert_latest(
            _snap(spark), chg, ["k"], "ver", tombstone_col="dead"
        ).collect()
    }
    assert got == {1: ("a2", 1), 3: ("c", 5), 4: ("d", 1)}


def test_stale_change_loses_to_newer_snapshot(spark):
    # Key 3 is at version 5 in the snapshot; a version-1 change (even a
    # delete) must NOT clobber it — out-of-order replays are a no-op.
    chg = spark.createDataFrame(
        [(3, "stale", 1, True)], "k long, v string, ver long, dead boolean"
    )
    got = {
        r["k"]: (r["v"], r["ver"])
        for r in upsert_latest(
            _snap(spark), chg, ["k"], "ver", tombstone_col="dead"
        ).collect()
    }
    assert got[3] == ("c", 5)


def test_equal_version_tie_goes_to_change_batch(spark):
    chg = spark.createDataFrame(
        [(2, "b-new", 0, False)], "k long, v string, ver long, dead boolean"
    )
    got = {
        r["k"]: r["v"]
        for r in upsert_latest(
            _snap(spark), chg, ["k"], "ver", tombstone_col="dead"
        ).collect()
    }
    assert got[2] == "b-new"


def test_no_tombstone_col_means_pure_upsert(spark):
    chg = spark.createDataFrame([(1, "a9", 9)], "k long, v string, ver long")
    got = {
        r["k"]: r["v"]
        for r in upsert_latest(_snap(spark), chg, ["k"], "ver").collect()
    }
    assert got == {1: "a9", 2: "b", 3: "c"}
