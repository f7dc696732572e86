"""Schema evolution on the storage layer: a corpus written in waves with
widening schemas must read back unified (mergeSchema), with the missing
columns null-filled — the append-only training-lake contract."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F


def test_merge_schema_widens_and_nullfills(spark):
    with tempfile.TemporaryDirectory() as d:
        v1 = spark.createDataFrame(
            [(1, "alpha"), (2, "beta")], "doc_id long, text string"
        )
        v2 = spark.createDataFrame(
            [(3, "gamma", "en", 0.9)],
            "doc_id long, text string, lang string, quality double",
        )
        v1.write.parquet(os.path.join(d, "wave=1"))
        v2.write.parquet(os.path.join(d, "wave=2"))
        merged = spark.read.option("mergeSchema", "true").parquet(
            os.path.join(d, "wave=1"), os.path.join(d, "wave=2")
        )
        assert set(merged.columns) == {"doc_id", "text", "lang", "quality"}
        assert merged.count() == 3
        nulls = merged.filter(F.col("lang").isNull()).count()
        assert nulls == 2  # wave-1 rows null-filled for the new columns
        assert merged.filter(F.col("doc_id") == 3).collect()[0]["lang"] == "en"


def test_scrub_pii_redacts(spark):
    from ue_big_data_project_spark.functions.text import pii_counts, scrub_pii

    df = spark.createDataFrame(
        [(1, "mail me at a.b+c@example.org or see https://x.io/p?q=1 now")],
        "id int, text string",
    )
    e, u = pii_counts("text")
    row = df.select(scrub_pii("text").alias("s"), e.alias("e"), u.alias("u")).collect()[0]
    assert row["s"] == "mail me at <EMAIL> or see <URL> now"
    assert (row["e"], row["u"]) == (1, 1)
