"""Multimodal (image/audio/video) column plumbing.

The engine treats media as **opaque ``binary`` payloads + a typed
metadata struct** — the layout a 100 TB training-data lake actually uses
(parquet binary columns sharded by content hash, metadata readable
without touching payload bytes). Everything Spark-side is real and
tested: schemas, partitioning, Arrow-batched ``mapInPandas`` UDF
signatures, frame-explosion shapes. Only the *codec* step is stubbed
(this container has no PIL/ffmpeg): ``backend="real"`` raises
``NotImplementedError`` at the exact call site a decoder plugs into,
``backend="fake"`` computes deterministic bytes-level features so the
whole pipeline is end-to-end verifiable against a SQL oracle.

Scale notes:
- ``mapInPandas`` streams Arrow record batches through one Python worker
  per core — payloads never collect to the driver and never shuffle
  (all features are computed in the partition that read the bytes).
- Metadata-only queries (count frames, total bytes) must NOT read the
  payload column: parquet column pruning makes them metadata-speed; keep
  payload and metadata in separate selects so pruning applies.
- Frame explosion multiplies rows, not bytes (each frame row carries a
  hash, not the frame) — the join-back to payloads happens per-batch in
  the consumer, keyed by (doc_id, frame_idx).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)

_TYPES = ["image", "audio", "video"]


def attach_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Ingestion edge: rows → (id, payload binary, metadata struct).

    Deterministic synthesis from the documents table (payload = utf-8
    bytes of the text; metadata derived from the id) so every downstream
    op is oracle-checkable. A real ingest swaps this for a binary-file
    source (``spark.read.format("binaryFile")``) with the same output
    contract.
    """
    i = F.col(id_col)
    return df.select(
        i,
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.element_at(F.array(*[F.lit(t) for t in _TYPES]), (i % 3 + 1).cast("int"))
            .alias("media_type"),
            (64 + i % 512).cast("int").alias("width"),
            (64 + (i * 7) % 512).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (1 + i % 16).cast("int").alias("n_frames"),
        ).alias("media"),
    )


def _decode_stub(payload: bytes, media_type: str, backend: str) -> dict:
    """The codec seam. ``real`` is where PIL/torchaudio/ffmpeg plug in."""
    if backend == "real":
        raise NotImplementedError(
            "no media codecs in this environment — plug PIL/ffmpeg in here"
        )
    return {
        "n_bytes": len(payload),
        "payload_md5": hashlib.md5(payload).hexdigest(),
    }


def media_features(df: DataFrame, backend: str = "fake") -> DataFrame:
    """Per-item bytes-level features via Arrow-batched ``mapInPandas``.

    Input contract: columns (doc_id, payload, media) from
    :func:`attach_media`. One Python worker pass per partition; payload
    bytes stay where they were read.
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p, mt, backend)
                for p, mt in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "n_bytes": pd.Series(
                        [f["n_bytes"] for f in feats], dtype="int64"
                    ),
                    "payload_md5": [f["payload_md5"] for f in feats],
                    "width": pdf["width"].astype("int32"),
                    "height": pdf["height"].astype("int32"),
                }
            )

    flat = df.select(
        "doc_id",
        "payload",
        F.col("media.media_type").alias("media_type"),
        F.col("media.width").alias("width"),
        F.col("media.height").alias("height"),
    )
    return flat.mapInPandas(compute, FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every: int = 1, backend: str = "fake") -> DataFrame:
    """Frame sampling: one output row per kept frame (row explode, bytes
    stay put — each frame row carries an identifying hash, not pixels).

    The fake decoder hashes ``payload ∥ ':' ∥ frame_idx`` — deterministic
    and reproducible by any engine as ``md5(text || ':' || idx)``.
    """

    def explode_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, payload, n_frames in zip(
                pdf["doc_id"], pdf["payload"], pdf["n_frames"]
            ):
                if backend == "real":
                    raise NotImplementedError(
                        "no media codecs in this environment"
                    )
                for fi in range(0, int(n_frames), every):
                    ids.append(doc_id)
                    idxs.append(fi)
                    hashes.append(
                        hashlib.md5(
                            bytes(payload) + b":" + str(fi).encode()
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_md5": pd.Series(hashes, dtype="object"),
                }
            )

    flat = df.select(
        "doc_id", "payload", F.col("media.n_frames").alias("n_frames")
    )
    return flat.mapInPandas(explode_frames, FRAMES_SCHEMA)
