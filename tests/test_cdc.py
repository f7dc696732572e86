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


# --------------------------------------------------------------------------
# merge_into (round-8 capability): Delta-style MERGE as one plan.
# --------------------------------------------------------------------------


def _merge_fixtures(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "id long, name string, bal double",
    )
    source = spark.createDataFrame(
        [(2, 5.0, False), (3, 0.0, True), (9, 90.0, False)],
        "id long, delta double, drop_it boolean",
    )
    return target, source


def test_merge_into_update_delete_insert(spark):
    from pyspark.sql import functions as F

    from ue_big_data_project_spark.operators.cdc import merge_into

    target, source = _merge_fixtures(spark)
    out = merge_into(
        target,
        source,
        ["id"],
        update_set={"bal": F.col("t.bal") + F.col("s.delta")},
        delete_when=F.col("s.drop_it"),
        insert_values={"name": F.lit("new"), "bal": F.col("s.delta")},
    )
    got = sorted(map(tuple, out.collect()))
    assert got == [
        (1, "a", 10.0),   # target-only: untouched
        (2, "b", 25.0),   # matched: updated
        (4, "d", 40.0),   # target-only: untouched
        (9, "new", 90.0),  # source-only: inserted
    ]  # id=3 deleted


def test_merge_into_without_insert_ignores_source_only(spark):
    from pyspark.sql import functions as F

    from ue_big_data_project_spark.operators.cdc import merge_into

    target, source = _merge_fixtures(spark)
    out = merge_into(
        target,
        source,
        ["id"],
        update_set={"bal": F.col("t.bal") + F.col("s.delta")},
    )
    ids = sorted(r.id for r in out.collect())
    assert ids == [1, 2, 3, 4]  # no delete clause, no insert of id=9


def test_merge_into_duplicate_source_keys_raise(spark):
    import pytest
    from pyspark.sql import functions as F

    from ue_big_data_project_spark.operators.cdc import merge_into

    target, _ = _merge_fixtures(spark)
    dup = spark.createDataFrame(
        [(2, 1.0, False), (2, 2.0, False)],
        "id long, delta double, drop_it boolean",
    )
    out = merge_into(
        target, dup, ["id"],
        update_set={"bal": F.col("t.bal") + F.col("s.delta")},
    )
    with pytest.raises(Exception, match="ambiguous"):
        out.collect()


def test_merge_into_duplicates_raise_even_when_all_rows_drop(spark):
    """Round-8 advice: the guard must not ride BEHIND the keep
    predicate — a duplicate key whose rows ALL resolve to row-drop
    (every matched duplicate satisfies delete_when, or source-only
    duplicates with insert_values=None) must still raise, per the
    documented count>1 contract."""
    import pytest
    from pyspark.sql import functions as F

    from ue_big_data_project_spark.operators.cdc import merge_into

    target, _ = _merge_fixtures(spark)
    # Case 1: both duplicates match id=2 and both satisfy delete_when —
    # the merged row drops either way, but the merge is still ambiguous.
    dup = spark.createDataFrame(
        [(2, 1.0, True), (2, 2.0, True)],
        "id long, delta double, drop_it boolean",
    )
    out = merge_into(
        target, dup, ["id"],
        update_set={"bal": F.col("t.bal") + F.col("s.delta")},
        delete_when=F.col("s.drop_it"),
    )
    with pytest.raises(Exception, match="ambiguous"):
        out.collect()
    # Case 2: duplicates on a key absent from the target, with WHEN NOT
    # MATCHED = do nothing — the rows would be silently discarded, but
    # the batch is still malformed and must fail loudly.
    dup_unmatched = spark.createDataFrame(
        [(999, 1.0, False), (999, 2.0, False)],
        "id long, delta double, drop_it boolean",
    )
    out2 = merge_into(
        target, dup_unmatched, ["id"],
        update_set={"bal": F.col("t.bal") + F.col("s.delta")},
    )
    with pytest.raises(Exception, match="ambiguous"):
        out2.collect()


def test_merge_into_null_keys_match_null_safe(spark):
    from pyspark.sql import functions as F

    from ue_big_data_project_spark.operators.cdc import merge_into

    target = spark.createDataFrame(
        [(None, "x", 1.0), (1, "y", 2.0)], "id long, name string, bal double"
    )
    source = spark.createDataFrame(
        [(None, 100.0, False)], "id long, delta double, drop_it boolean"
    )
    out = merge_into(
        target, source, ["id"],
        update_set={"bal": F.col("t.bal") + F.col("s.delta")},
    )
    got = sorted(map(tuple, out.collect()), key=lambda r: (r[0] is None, r))
    # NULL target key matched the NULL source key (updated), not
    # mistaken for an unmatched side.
    assert (None, "x", 101.0) in got and (1, "y", 2.0) in got
    assert len(got) == 2


def test_merge_into_contract_guards(spark):
    import pytest
    from pyspark.sql import functions as F

    from ue_big_data_project_spark.operators.cdc import merge_into

    target, source = _merge_fixtures(spark)
    with pytest.raises(ValueError, match="merge key"):
        merge_into(target, source, ["id"], update_set={"id": F.lit(0)})
    with pytest.raises(ValueError, match="unknown columns"):
        merge_into(target, source, ["id"], update_set={"nope": F.lit(0)})
    with pytest.raises(ValueError, match="insert_values must cover"):
        merge_into(
            target, source, ["id"], insert_values={"bal": F.lit(0.0)}
        )
