"""Multimodal columns: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so decode is a STUB — a
deterministic fake that derives "media metadata" from the payload
bytes (clearly marked). Everything around it is real Spark plumbing:
binary column synthesis, Arrow-batched mapInPandas with the exact
batch shape a real decoder would use, schema handling, and the
partitioning story (payloads stay columnar; only needed columns cross
the Python boundary).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),
    T.StructField("payload", T.BinaryType(), False),
])

META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("sha256", T.StringType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic binary payloads from document text (stands in for
    real image/audio blobs; binary column is the real thing)."""
    mt = F.when(F.col("doc_id") % 3 == 0, F.lit("image/png")) \
        .when(F.col("doc_id") % 3 == 1, F.lit("audio/wav")) \
        .otherwise(F.lit("video/mp4"))
    return docs.select(
        "doc_id", mt.alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )


def decode_media_meta(media: DataFrame) -> DataFrame:
    """Arrow-batched 'decode': extracts metadata per payload.

    STUB decode — real deployments replace `_fake_decode` with
    PIL/ffmpeg calls; the mapInPandas batch shape, schema, and
    column-pruned input contract stay identical."""

    def _fake_decode(pdf: pd.DataFrame) -> pd.DataFrame:
        n_bytes = pdf["payload"].map(len)
        digest = pdf["payload"].map(lambda b: hashlib.sha256(b).hexdigest())
        # deterministic fake dimensions from the byte length (a real
        # decoder reads the codec header here)
        is_img = pdf["media_type"] == "image/png"
        is_av = pdf["media_type"] != "image/png"
        return pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "media_type": pdf["media_type"],
            "n_bytes": n_bytes.astype("int32"),
            "sha256": digest,
            "width": (64 + (n_bytes % 1024)).where(is_img).astype("Int32"),
            "height": (64 + (n_bytes % 768)).where(is_img).astype("Int32"),
            "duration_ms": (1000 + (n_bytes % 60000)).where(is_av).astype("Int32"),
        })

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_decode(pdf)

    return media.select("doc_id", "media_type", "payload") \
        .mapInPandas(gen, schema=META_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 10_000) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits (doc_id,
    frame_idx, frame_ts_ms) rows per sampled frame — the decode of the
    actual frame bytes is the same STUB boundary."""
    meta = decode_media_meta(media.filter(F.col("media_type") == "video/mp4"))
    n_frames = F.greatest((F.col("duration_ms") / every_ms).cast("int"), F.lit(1))
    return meta.select(
        "doc_id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "_"),
    ).select("doc_id", "frame_idx",
             (F.col("frame_idx") * every_ms).alias("frame_ts_ms"))
