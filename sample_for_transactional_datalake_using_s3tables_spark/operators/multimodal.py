"""Multimodal-column operators: binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: store the media as an
opaque ``binary`` column with typed metadata columns alongside, and run
decode / feature-extraction as Arrow-batched ``mapInPandas`` stages
(pandas UDFs are the sanctioned Python hot path -- row-at-a-time UDFs
are not). The real decoders (PIL/librosa/av) are not in this container,
so the decode step is STUBBED with deterministic functions of the
payload bytes (clearly marked); the Spark-side plumbing -- schema,
binary encoding, Arrow batch shapes, partitioning -- is real and is
what the oracle checks.

``documents.text`` stands in for a media blob via utf-8 encoding.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.testdata import load_table, spread

IMAGE_FEATURE_SCHEMA = (
    "doc_id long, byte_len int, width int, height int, channels int, n_frames int"
)
AUDIO_FEATURE_SCHEMA = "doc_id long, byte_len int, duration_ms long, pseudo_rms double"


def decode_image(payload: bytes):  # pragma: no cover - real-decoder seam
    """Real image decode seam. The container has no imaging libraries;
    a deployment with PIL/torchvision plugs in here."""
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "environment; use the deterministic stub features instead"
    )


def _image_feature_batches(batches: Iterator) -> Iterator:
    """STUB decoder: deterministic pseudo-features of the payload bytes
    (byte length driven), exercising real Arrow batch plumbing."""
    import pandas as pd

    for pdf in batches:
        bl = pdf["payload"].str.len().astype("int32")  # vectorized, not per-row
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "byte_len": bl,
                "width": (bl % 640 + 1).astype("int32"),
                "height": ((bl * 7) % 480 + 1).astype("int32"),
                "channels": pd.Series([3] * len(pdf), dtype="int32"),
                "n_frames": (bl % 30 + 2).astype("int32"),
            }
        )


def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary payload -> Arrow-batched mapInPandas feature extraction."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    payloads = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return payloads.mapInPandas(_image_feature_batches, IMAGE_FEATURE_SCHEMA)


MULTIMODAL_IMAGE_SQL = """
WITH p AS (
  SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS byte_len FROM documents
)
SELECT doc_id, byte_len,
       byte_len % 640 + 1 AS width,
       (byte_len * 7) % 480 + 1 AS height,
       3 AS channels,
       byte_len % 30 + 2 AS n_frames
FROM p
"""


def _audio_feature_batches(batches: Iterator) -> Iterator:
    """STUB audio decode: duration from byte length at a fake 16 byte/ms
    rate; pseudo-RMS derived from md5 (hashlib md5 == engine md5)."""
    import hashlib

    import pandas as pd

    for pdf in batches:
        bl = pdf["payload"].str.len()
        # md5 has no vectorized pandas form; acceptable inside the STUB
        # (a real decoder replaces this whole body)
        rms = pdf["payload"].apply(
            lambda b: (int(hashlib.md5(b).hexdigest()[:15], 16) % 1000) / 1000.0
        )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "byte_len": bl.astype("int32"),
                "duration_ms": (bl * 1000 // 16).astype("int64"),
                "pseudo_rms": rms.astype("float64"),
            }
        )


def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    payloads = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return payloads.mapInPandas(_audio_feature_batches, AUDIO_FEATURE_SCHEMA)


MULTIMODAL_AUDIO_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
       CAST(octet_length(encode(text)) AS BIGINT) * 1000 // 16 AS duration_ms,
       (CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) % 1000) / 1000.0 AS pseudo_rms
FROM documents
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for a (fake) video payload: every 5th frame index,
    pure Column expressions (sequence + explode -- no Python)."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    n_frames = (F.octet_length(F.encode("text", "utf-8")) % 30 + 2).alias("n_frames")
    return (
        docs.select("doc_id", n_frames)
        .select(
            "doc_id",
            "n_frames",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(5))).alias("_fi"),
        )
        .select("doc_id", "n_frames", F.col("_fi").cast("int").alias("frame_idx"))
    )


MULTIMODAL_FRAME_SQL = """
WITH p AS (
  SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) % 30 + 2 AS n_frames
  FROM documents
)
SELECT doc_id, n_frames, CAST(unnest(range(0, n_frames, 5)) AS INTEGER) AS frame_idx
FROM p
"""


RESIZE_TARGET = 224  # canonical training-input edge
RESIZE_SCHEMA = (
    "doc_id long, orig_width int, orig_height int, "
    "target_width int, target_height int, scale_x double, scale_y double, "
    "resized_bytes long"
)


def _resize_batches(batches: Iterator) -> Iterator:
    """STUB resize: decode -> scale-to-224 -> re-encode, with the decode
    and re-encode steps replaced by deterministic functions of the
    payload (same pseudo-dims as the image-features stub). The Arrow
    batch plumbing, scale math, and output schema are the real pipeline
    shape a PIL/torchvision deployment plugs into."""
    import pandas as pd

    for pdf in batches:
        bl = pdf["payload"].str.len()
        w = (bl % 640 + 1).astype("int32")
        h = ((bl * 7) % 480 + 1).astype("int32")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "orig_width": w,
                "orig_height": h,
                "target_width": pd.Series([RESIZE_TARGET] * len(pdf), dtype="int32"),
                "target_height": pd.Series([RESIZE_TARGET] * len(pdf), dtype="int32"),
                # exact int/int division -> portable doubles
                "scale_x": RESIZE_TARGET / w.astype("float64"),
                "scale_y": RESIZE_TARGET / h.astype("float64"),
                "resized_bytes": pd.Series(
                    [RESIZE_TARGET * RESIZE_TARGET * 3] * len(pdf), dtype="int64"
                ),
            }
        )


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode -> resize -> re-encode plumbing over binary payloads."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    payloads = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return payloads.mapInPandas(_resize_batches, RESIZE_SCHEMA)


MULTIMODAL_RESIZE_SQL = f"""
WITH p AS (
  SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS byte_len FROM documents
)
SELECT doc_id,
       byte_len % 640 + 1 AS orig_width,
       (byte_len * 7) % 480 + 1 AS orig_height,
       {RESIZE_TARGET} AS target_width,
       {RESIZE_TARGET} AS target_height,
       {RESIZE_TARGET} / CAST(byte_len % 640 + 1 AS DOUBLE) AS scale_x,
       {RESIZE_TARGET} / CAST((byte_len * 7) % 480 + 1 AS DOUBLE) AS scale_y,
       CAST({RESIZE_TARGET * RESIZE_TARGET * 3} AS BIGINT) AS resized_bytes
FROM p
"""


QUERIES = {
    "multimodal_image_features": multimodal_image_features,
    "multimodal_audio_stats": multimodal_audio_stats,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_resize": multimodal_resize,
}

ORACLES = {
    "multimodal_image_features": MULTIMODAL_IMAGE_SQL,
    "multimodal_audio_stats": MULTIMODAL_AUDIO_SQL,
    "multimodal_frame_sample": MULTIMODAL_FRAME_SQL,
    "multimodal_resize": MULTIMODAL_RESIZE_SQL,
}
