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


# -- scd2_history -----------------------------------------------------------


def test_scd2_intervals_chain_and_current(spark):
    from ue_big_data_project_spark.operators.cdc import scd2_history

    chg = spark.createDataFrame(
        [
            (1, 10, "a", False),
            (1, 20, "b", False),
            (1, 30, "c", False),
            (2, 15, "x", False),
        ],
        "k long, v long, payload string, del boolean",
    )
    out = {
        (r.k, r.valid_from): (r.valid_to, r.is_current, r.payload)
        for r in scd2_history(
            chg, keys=["k"], version_col="v", tombstone_col="del"
        ).collect()
    }
    assert out[(1, 10)] == (20, False, "a")
    assert out[(1, 20)] == (30, False, "b")
    assert out[(1, 30)] == (None, True, "c")
    assert out[(2, 15)] == (None, True, "x")


def test_scd2_tombstone_closes_but_emits_nothing(spark):
    from ue_big_data_project_spark.operators.cdc import scd2_history

    chg = spark.createDataFrame(
        [
            (1, 10, "a", False),
            (1, 20, None, True),   # delete: closes "a", emits no row
            (1, 30, "b", False),   # re-insert after delete
            (2, 10, "y", False),
            (2, 20, None, True),   # key 2 ends deleted: no current row
        ],
        "k long, v long, payload string, del boolean",
    )
    rows = scd2_history(
        chg, keys=["k"], version_col="v", tombstone_col="del"
    ).collect()
    got = {(r.k, r.valid_from): (r.valid_to, r.is_current) for r in rows}
    assert got == {
        (1, 10): (20, False),
        (1, 30): (None, True),
        (2, 10): (20, False),
    }
    assert not any(r.k == 2 and r.is_current for r in rows)


def test_scd2_version_ties_break_on_order_cols(spark):
    from ue_big_data_project_spark.operators.cdc import scd2_history

    chg = spark.createDataFrame(
        [(1, 10, 1, "first"), (1, 10, 2, "second")],
        "k long, v long, seq long, payload string",
    )
    out = {
        r.payload: (r.valid_to, r.is_current)
        for r in scd2_history(
            chg, keys=["k"], version_col="v", order_cols=["seq"]
        ).collect()
    }
    assert out["first"] == (10, False)
    assert out["second"] == (None, True)
