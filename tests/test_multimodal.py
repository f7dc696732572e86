"""Multimodal plumbing: Arrow-batched mapInPandas features/frames over
binary payload columns, with the codec stub behaving as declared."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from ue_big_data_project_spark.operators import multimodal as MM

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    from ue_big_data_project_spark.session import load_tables

    d = load_tables(spark, SF_DIR, ("documents",))["documents"]
    return MM.attach_media(d)


def test_attach_media_schema(media):
    assert dict(media.dtypes)["payload"] == "binary"
    meta = {f.name: f.dataType for f in media.schema["media"].dataType.fields}
    assert sorted(meta) == ["height", "media_type", "n_frames", "sample_rate", "width"]


def test_media_features_match_python(media, spark):
    got = MM.media_features(media).orderBy("doc_id").limit(5).collect()
    src = (
        media.select("doc_id", "payload")
        .orderBy("doc_id")
        .limit(5)
        .collect()
    )
    by_id = {r["doc_id"]: bytes(r["payload"]) for r in src}
    for row in got:
        payload = by_id[row["doc_id"]]
        assert row["n_bytes"] == len(payload)
        assert row["payload_md5"] == hashlib.md5(payload).hexdigest()


def test_sample_frames_counts(media):
    frames = MM.sample_frames(media, every=2)
    per_doc = frames.groupBy("doc_id").count()
    joined = media.select(
        "doc_id", F.col("media.n_frames").alias("n_frames")
    ).join(per_doc, "doc_id")
    bad = joined.filter(
        F.col("count") != F.ceil(F.col("n_frames") / 2)
    ).count()
    assert bad == 0


def test_real_backend_is_stubbed(media):
    with pytest.raises(Exception) as exc:
        MM.media_features(media, backend="real").limit(1).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )
