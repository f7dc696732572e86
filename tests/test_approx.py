"""Approximate aggregates: the 100 TB defaults (HLL, t-digest) cannot
be oracle-hash-checked, so they are tolerance-tested against their exact
twins here."""

from __future__ import annotations

from pyspark.sql import functions as F

from ue_big_data_project_spark.session import load_tables

SF_DIR = "/root/testdata/sf0.001"


def test_approx_count_distinct_within_tolerance(spark):
    e = load_tables(spark, SF_DIR, ("events",))["events"]
    row = e.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) <= max(3, 0.06 * row["exact"])


def test_approx_percentile_within_tolerance(spark):
    e = load_tables(spark, SF_DIR, ("events",))["events"]
    row = e.agg(
        F.percentile("value", F.lit(0.5)).alias("exact"),
        F.percentile_approx("value", F.lit(0.5), F.lit(10_000)).alias("approx"),
    ).collect()[0]
    spread = e.agg((F.max("value") - F.min("value")).alias("r")).collect()[0]["r"]
    assert abs(row["approx"] - row["exact"]) <= 0.05 * spread
