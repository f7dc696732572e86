"""Cardinality-sketch contracts: merge == rebuild, partitioning
determinism, estimator accuracy, KMV exactness below k, and the
exact-pruning property of thresholded incremental KMV builds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ue_big_data_project_spark.operators import sketch as SK


def _ids(spark, n, tag, groups=2):
    return spark.range(n).select(
        (F.col("id") % groups).alias("grp"),
        F.concat(F.lit(tag), F.col("id").cast("string")).alias("v"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_hll_merge_equals_rebuild(spark):
    """Merging per-half register sidecars must give EXACTLY the
    whole-corpus registers — the property that makes per-source /
    per-day sketches safe to combine without rescans."""
    df = _ids(spark, 3000, "d")
    whole = SK.hll_registers(df, ["grp"], F.col("v"), p=6)
    even = SK.hll_registers(
        df.filter(F.col("v").substr(-1, 1).isin("0", "2", "4", "6", "8")),
        ["grp"], F.col("v"), p=6,
    )
    odd = SK.hll_registers(
        df.filter(~F.col("v").substr(-1, 1).isin("0", "2", "4", "6", "8")),
        ["grp"], F.col("v"), p=6,
    )
    assert _rows(SK.hll_merge(even, odd, ["grp"])) == _rows(whole)
    # Idempotence: re-merging a sketch with itself changes nothing.
    assert _rows(SK.hll_merge(whole, whole, ["grp"])) == _rows(whole)


def test_hll_partitioning_determinism(spark):
    """Register tables are exact integers — identical for any input
    partitioning (the map-side partial min is associative)."""
    df = _ids(spark, 2000, "x")
    a = SK.hll_registers(df.repartition(1), ["grp"], F.col("v"), p=6)
    b = SK.hll_registers(df.repartition(17), ["grp"], F.col("v"), p=6)
    assert _rows(a) == _rows(b)


def test_hll_estimate_accuracy(spark):
    """Raw harmonic estimate within 4 standard errors (1.04/sqrt(m) ≈
    13% at m=64 → bound 52%) on several disjoint datasets, and the
    MEAN error across them well inside one sigma — catches estimator
    arithmetic bugs without flaking on single-draw variance."""
    errs = []
    for tag in ("a", "b", "c", "d", "e"):
        df = _ids(spark, 2000, tag, groups=1)
        reg = SK.hll_registers(df, ["grp"], F.col("v"), p=6)
        est = SK.hll_estimate(reg, ["grp"], p=6).collect()[0]["est_distinct"]
        rel = abs(est / 2000.0 - 1.0)
        assert rel < 0.52, (tag, est)
        errs.append(est / 2000.0 - 1.0)
    assert abs(sum(errs) / len(errs)) < 0.13, errs


def test_kmv_exact_below_k(spark):
    """A sketch holding fewer than k hashes IS the exact distinct set."""
    df = _ids(spark, 100, "s", groups=10)  # 10 distinct per group
    sk = SK.kmv_sketch(df, ["grp"], F.col("v"), k=32)
    for r in SK.kmv_estimate(sk, ["grp"], k=32).collect():
        assert r["est_distinct"] == 10


def test_kmv_merge_equals_rebuild(spark):
    df = _ids(spark, 4000, "m")
    whole = SK.kmv_sketch(df, ["grp"], F.col("v"), k=32)
    lo = df.filter(F.col("v") < "m2")
    hi = df.filter(F.col("v") >= "m2")
    merged = SK.kmv_merge(
        SK.kmv_sketch(lo, ["grp"], F.col("v"), k=32),
        SK.kmv_sketch(hi, ["grp"], F.col("v"), k=32),
        ["grp"], k=32,
    )
    assert _rows(merged) == _rows(whole)


def test_kmv_threshold_prunes_exactly(spark):
    """Incremental maintenance: filtering the increment to hashes below
    the current sketch's k-th minimum loses NOTHING — the thresholded
    merge equals the full rebuild (a hash ≥ h_k can never enter the
    k-min set). This is what keeps increments increment-bounded."""
    base = _ids(spark, 3000, "base")
    inc = _ids(spark, 3000, "inc")
    k = 32
    sk0 = SK.kmv_sketch(base, ["grp"], F.col("v"), k=k)
    # Per-group k-th minimum of the existing sketch as the threshold.
    thresh = sk0.select(
        "grp", F.element_at("kmin", k).alias("h_k")
    )
    inc_h = inc.join(thresh, "grp")
    pruned = SK.kmv_sketch(
        inc_h, ["grp"], F.col("v"), k=k, threshold=F.col("h_k")
    )
    merged = SK.kmv_merge(sk0, pruned, ["grp"], k=k)
    rebuilt = SK.kmv_sketch(base.unionByName(inc), ["grp"], F.col("v"), k=k)
    assert _rows(merged) == _rows(rebuilt)
    # And the pruning really dropped most of the increment: each pruned
    # group's sketch holds at most k hashes' worth of survivors by
    # construction, far fewer rows than the raw increment.
    kept = inc_h.filter(
        SK.hash48(F.col("v")) < F.col("h_k")
    ).count()
    assert kept < inc.count() / 4, kept


def test_kmv_estimate_in_range(spark):
    """Above k the integer estimator lands within its ~1/sqrt(k)
    relative-error envelope (4 sigma at k=32 is ~71%; use several
    datasets and also bound the mean)."""
    errs = []
    for tag in ("p", "q", "r"):
        df = _ids(spark, 1000, tag, groups=1)
        sk = SK.kmv_sketch(df, ["grp"], F.col("v"), k=32)
        est = SK.kmv_estimate(sk, ["grp"], k=32).collect()[0]["est_distinct"]
        rel = est / 1000.0 - 1.0
        assert abs(rel) < 0.71, (tag, est)
        errs.append(rel)
    assert abs(sum(errs) / len(errs)) < 0.30, errs


def test_cms_never_underestimates(spark):
    """The CMS guarantee: est >= exact for EVERY value, even under a
    deliberately narrow sketch full of collisions."""
    df = _ids(spark, 5000, "c", groups=25)  # 25 values, skewed counts
    vals = df.select(F.col("v"))
    counters = SK.cms_counters(vals, F.col("v"), depth=3, width=8)
    exact = vals.groupBy("v").agg(F.count(F.lit(1)).alias("exact"))
    est = SK.cms_lookup(counters, exact, F.col("v"), depth=3, width=8)
    for r in est.collect():
        assert r["est_count"] >= r["exact"], r


def test_cms_merge_equals_rebuild(spark):
    df = _ids(spark, 4000, "mm", groups=1)
    lo = df.filter(F.col("v") < "mm2")
    hi = df.filter(F.col("v") >= "mm2")
    merged = SK.cms_merge(
        SK.cms_counters(lo, F.col("v"), depth=3, width=32),
        SK.cms_counters(hi, F.col("v"), depth=3, width=32),
    )
    whole = SK.cms_counters(df, F.col("v"), depth=3, width=32)
    assert _rows(merged) == _rows(whole)


def test_cms_unseen_value_reads_zero(spark):
    df = _ids(spark, 1000, "seen", groups=1)
    counters = SK.cms_counters(df, F.col("v"), depth=4, width=1024)
    probe = spark.createDataFrame([("never-seen-token",)], "v string")
    got = SK.cms_lookup(counters, probe, F.col("v"), depth=4, width=1024)
    rows = got.collect()
    # With width >> distinct values, all 4 of the probe's buckets are
    # almost surely untouched; at minimum the estimate is bounded by
    # the heaviest counter and must exist (left join, coalesce 0).
    assert len(rows) == 1
    assert rows[0]["est_count"] >= 0


def test_cms_partitioning_determinism(spark):
    df = _ids(spark, 3000, "dd", groups=1)
    a = SK.cms_counters(df.repartition(1), F.col("v"), depth=3, width=64)
    b = SK.cms_counters(df.repartition(13), F.col("v"), depth=3, width=64)
    assert _rows(a) == _rows(b)


def test_hll_register_shuffle_is_single_bounded_exchange(spark):
    """The register build's physical plan carries exactly one exchange
    and a map-side partial aggregate before it — the bounded-state
    claim (≤ m integers per group per map task) made in SCALE.md."""
    df = _ids(spark, 2000, "z")
    reg = SK.hll_registers(df, ["grp"], F.col("v"), p=6)
    plan = reg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    # partial_min before the exchange == map-side combine ran.
    assert "partial_min" in plan or "partial" in plan.lower(), plan
