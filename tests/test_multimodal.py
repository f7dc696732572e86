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


def test_wav_codec_roundtrip_exact():
    """The REAL codec: encode a known PCM16 signal, decode the container
    bytes, get the exact stats back."""
    import numpy as np

    sr = 8000
    samples = np.array([100, -100, 300, -300, 300, -300], dtype="<i2")
    payload = MM.encode_wav_pcm16(samples, sr)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    got = MM.decode_wav(payload)
    assert got["sample_rate"] == sr
    assert got["n_channels"] == 1
    assert got["bits_per_sample"] == 16
    assert got["n_samples"] == 6
    assert got["duration_us"] == 6 * 1_000_000 // sr
    assert got["peak_amplitude"] == 300
    # rms = sqrt((2*100^2 + 4*300^2)/6) = sqrt(63333.33) = 251.66 -> 251
    assert got["rms_amplitude"] == 251


def test_wav_codec_stereo_and_malformed():
    import numpy as np

    stereo = MM.encode_wav_pcm16(
        np.array([1, 2, 3, 4], dtype="<i2"), 16000, n_channels=2
    )
    got = MM.decode_wav(stereo)
    assert got["n_channels"] == 2 and got["n_samples"] == 2

    with pytest.raises(ValueError, match="RIFF"):
        MM.decode_wav(b"not a wave file at all")
    with pytest.raises(ValueError, match="truncated"):
        MM.decode_wav(stereo[:-3])
    # Non-PCM format code must be rejected, not misdecoded.
    mutated = bytearray(stereo)
    mutated[20] = 3  # fmt.audio_format = IEEE float
    with pytest.raises(ValueError, match="unsupported"):
        MM.decode_wav(bytes(mutated))


def test_wav_features_real_backend_end_to_end(spark):
    """attach_wav -> wav_features runs the real decoder inside
    mapInPandas and reproduces the closed-form feature values."""
    df = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    got = {r["doc_id"]: r for r in MM.wav_features(MM.attach_wav(df)).collect()}
    assert len(got) == 40
    for i in (0, 7, 13, 39):
        r = got[i]
        assert r["n_samples"] == 160 + (i % 64) * 4
        assert r["peak_amplitude"] == r["rms_amplitude"] == 1000 + (i % 7) * 100
        assert r["duration_us"] == r["n_samples"] * 125


def test_media_features_real_backend_decodes_wav(spark):
    """backend="real" is no longer a pure stub: WAV payloads decode
    (container validated), non-WAV payloads still raise at the seam."""
    df = spark.range(0, 5).select(F.col("id").alias("doc_id"))
    wav = MM.attach_wav(df).withColumn(
        "media",
        F.struct(
            F.lit("audio").alias("media_type"),
            F.lit(0).alias("width"),
            F.lit(0).alias("height"),
            F.lit(MM.WAV_SAMPLE_RATE).alias("sample_rate"),
            F.lit(1).alias("n_frames"),
        ),
    )
    out = MM.media_features(wav, backend="real").collect()
    assert len(out) == 5 and all(r["n_bytes"] > 44 for r in out)
