"""Skew levers (operators/skew.py): the salted shuffle join must be
result-identical to the plain join and actually key the join on the
salt."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ue_big_data_project_spark.operators import skew as SKW
from ue_big_data_project_spark.operators.skew import (
    salted_agg,
    salted_shuffle_join,
)


@pytest.fixture()
def skewed_sides(spark):
    # 500 rows of hot key 1, a few of keys 2-4; medium side has matches
    # and non-matches on both sides.
    big = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(k, k * 1000) for k in (2, 3, 4, 9)],
        "k long, v long",
    )
    medium = spark.createDataFrame(
        [(1, "hot"), (2, "warm"), (3, "cool"), (7, "unmatched")],
        "k long, tag string",
    )
    return big, medium


def _pairs(df):
    return sorted((r["k"], r["v"], r["tag"]) for r in df.collect())


def test_salted_join_matches_plain_inner(spark, skewed_sides):
    big, medium = skewed_sides
    got = _pairs(salted_shuffle_join(big, medium, ["k"], salt_buckets=8))
    want = _pairs(big.join(medium, ["k"], "inner"))
    assert got == want
    assert len(got) == 502  # 500 hot + keys 2,3


def test_salted_join_matches_plain_left(spark, skewed_sides):
    big, medium = skewed_sides
    got = _pairs(salted_shuffle_join(big, medium, ["k"], salt_buckets=8, how="left"))
    want = _pairs(big.join(medium, ["k"], "left"))
    assert got == want
    assert len(got) == 504  # + unmatched keys 4, 9 exactly once each


def test_salted_join_rejects_outer(spark, skewed_sides):
    big, medium = skewed_sides
    with pytest.raises(ValueError, match="inner/left"):
        salted_shuffle_join(big, medium, ["k"], how="full")


def test_salt_is_a_join_key(spark, skewed_sides):
    big, medium = skewed_sides
    plan = (
        salted_shuffle_join(big, medium, ["k"], salt_buckets=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "_salt" in plan, plan


def test_salted_agg_matches_plain(spark, skewed_sides):
    big, _ = skewed_sides
    got = {
        r["k"]: (r["total"], r["n"])
        for r in salted_agg(
            big,
            ["k"],
            {"total": ("sum", F.col("v")), "n": ("count", F.lit(1))},
            salt_buckets=8,
        ).collect()
    }
    want = {
        r["k"]: (r["total"], r["n"])
        for r in big.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_sketch_join_plan_broadcasts_small_side(spark):
    big = spark.range(5000).select(
        (F.col("id") % 50).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("attr")
    )
    joined, decision = SKW.sketch_join_plan(big, dim, ["k"])
    assert decision["strategy"] == "broadcast"
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert joined.count() == 5000


def test_sketch_join_plan_salts_hot_key(spark):
    # 90% of the big side shares one key; the other side is forced past
    # the broadcast threshold so the skew path must engage.
    big = spark.range(20000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7))
        .otherwise(F.col("id") % 100)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    other = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("attr")
    )
    joined, decision = SKW.sketch_join_plan(
        big, other, ["k"], broadcast_rows=10, skew_ratio=4
    )
    assert decision["strategy"] == "salted", decision
    # CMS over-estimates only: the hot-key bound covers the true count.
    assert decision["max_key_freq_est"] >= 18000
    # Semantics identical to the plain join.
    plain = big.join(other, ["k"])
    assert sorted(map(tuple, joined.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_sketch_join_plan_uniform_stays_plain(spark):
    big = spark.range(20000).select(
        (F.col("id") % 2000).alias("k"), F.col("id").alias("payload")
    )
    other = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("attr")
    )
    joined, decision = SKW.sketch_join_plan(
        big, other, ["k"], broadcast_rows=10, skew_ratio=8
    )
    assert decision["strategy"] == "shuffle", decision
    assert joined.count() == 20000


def test_sketch_join_plan_empty_big_side_stays_plain(spark):
    big = spark.range(0).select(
        F.col("id").alias("k"), F.col("id").alias("payload")
    )
    other = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("attr")
    )
    joined, decision = SKW.sketch_join_plan(
        big, other, ["k"], broadcast_rows=10
    )
    assert decision["strategy"] == "shuffle"
    assert joined.count() == 0


def test_sketch_join_plan_sampled_planning_same_decisions(spark):
    """Sampled planning (round-7 verdict task 4) must reach the same
    strategy as exact planning on all three branch fixtures: the skew
    test is a ratio so the fraction cancels, and the safety factor only
    lowers the bar (errs toward the semantics-identical salted plan)."""
    hot_big = spark.range(20000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7))
        .otherwise(F.col("id") % 100)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    uniform_big = spark.range(20000).select(
        (F.col("id") % 2000).alias("k"), F.col("id").alias("payload")
    )
    other = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("attr")
    )
    joined, d = SKW.sketch_join_plan(
        hot_big, other, ["k"], broadcast_rows=10, skew_ratio=4,
        planning_fraction=0.2,
    )
    assert d["strategy"] == "salted", d
    assert d["planning"] == {"mode": "sampled", "fraction": 0.2, "safety": 2}
    # Scaled estimates are in the right ballpark (18000 true hot rows).
    assert 9000 <= d["max_key_freq_est"] <= 40000
    # Result is semantics-identical to the plain join.
    plain = hot_big.join(other, ["k"])
    assert joined.count() == plain.count()

    _, d2 = SKW.sketch_join_plan(
        uniform_big, other, ["k"], broadcast_rows=10, skew_ratio=8,
        planning_fraction=0.2,
    )
    assert d2["strategy"] == "shuffle", d2

    dim = spark.range(50).select(F.col("id").alias("k"))
    _, d3 = SKW.sketch_join_plan(
        spark.range(5000).select((F.col("id") % 50).alias("k")),
        dim, ["k"], planning_fraction=0.2,
    )
    assert d3["strategy"] == "broadcast"


def test_sketch_join_plan_sampled_empty_big_side(spark):
    big = spark.range(0).select(
        F.col("id").alias("k"), F.col("id").alias("payload")
    )
    other = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("attr")
    )
    joined, decision = SKW.sketch_join_plan(
        big, other, ["k"], broadcast_rows=10, planning_fraction=0.5
    )
    assert decision["strategy"] == "shuffle"
    assert joined.count() == 0


def test_sketch_join_plan_rejects_bad_fraction(spark):
    big = spark.range(10).select(F.col("id").alias("k"))
    other = spark.range(100).select(F.col("id").alias("k"))
    import pytest as _pt

    with _pt.raises(ValueError, match="planning_fraction"):
        SKW.sketch_join_plan(
            big, other, ["k"], broadcast_rows=10, planning_fraction=1.5
        )


def test_sketch_join_plan_estimates_output_size(spark):
    """estimate_output=True records the CMS inner-product bound on the
    join's output rows — exact mode over-estimates ONLY (never under
    the true join size)."""
    big = spark.range(20000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("payload")
    )
    other = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("attr")
    )
    joined, d = SKW.sketch_join_plan(
        big, other, ["k"], broadcast_rows=10, estimate_output=True
    )
    exact = joined.count()
    assert d["est_join_rows"] >= exact
    assert d["est_join_rows"] <= exact * 3  # sane bound at this width
    # Sampled mode: in the right ballpark after the rescale.
    _, ds = SKW.sketch_join_plan(
        big, other, ["k"], broadcast_rows=10,
        planning_fraction=0.25, estimate_output=True,
    )
    assert exact * 0.5 <= ds["est_join_rows"] <= exact * 4
    # Off by default: the key stays out of the decision dict.
    _, d0 = SKW.sketch_join_plan(big, other, ["k"], broadcast_rows=10)
    assert "est_join_rows" not in d0
