"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, batch iteration, partition sizing) is real
and tested; the actual codec work is stubbed behind clearly-marked seams
because decode libraries (PIL/ffmpeg/torchaudio) are not in this container.
Swap `_decode_image_stub` etc. for real decoders without touching the
DataFrame topology.

Design for 100 TB of media:
  * binary payloads stay columnar (parquet binary) — never explode bytes
    into rows; metadata lives in sibling typed columns so Catalyst prunes
    payload reads for metadata-only queries (ReadSchema shows the binary
    column dropped).
  * decode/feature steps run via mapInPandas: Arrow ships the binary batches
    to Python once per batch; `spark.sql.execution.arrow.maxRecordsPerBatch`
    bounds batch memory (decoded frames blow up ~100× over compressed bytes
    — size batches for the DECODED footprint).
  * repartition by size, not count: media rows are wildly skewed; use
    `repartitionByRange` over a size column (or AQE) before decode so one
    4K video doesn't serialize a whole task.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, mean_luma double, feature array<float>"
)

FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, ts_ms long, frame_png binary"


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded pseudo-bytes) so the
    plumbing is testable without codec libs."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        ((F.col("id") % 16 + 1) * 64).cast("int").alias("width"),
        ((F.col("id") % 9 + 1) * 64).cast("int").alias("height"),
        ((F.col("id") % 30 + 1) * 1000).cast("long").alias("duration_ms"),
        F.lit(256).cast("long").alias("n_bytes"),
        F.unhex(F.repeat(F.substring(F.md5(F.concat(F.lit(seed), F.col("id"))), 1, 16), 32)).alias(
            "payload"
        ),
    )
    return df


def _decode_image_stub(payload: bytes, width: int, height: int) -> list[float]:
    """STUB decode: deterministic fake 8-dim feature from the payload bytes.
    Replace with a real decoder (PIL -> np array -> model) in production;
    raise NotImplementedError here if you need loud failure instead."""
    if payload is None:
        raise NotImplementedError("real image decode requires PIL — not in this container")
    return [float(payload[i % len(payload)]) / 255.0 for i in range(8)]


def extract_image_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over image rows. Batch shape: Arrow
    batches of (media_id, width, height, payload); output one row per image."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_image_stub(p, w, h)
                for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "mean_luma": [sum(f) / len(f) for f in feats],
                    "feature": feats,
                }
            )

    cols = media.filter(F.col("kind") == "image").select(
        "media_id", "width", "height", "payload"
    )
    return cols.mapInPandas(op, schema=IMAGE_FEATURES_SCHEMA)


def sample_video_frames(media: DataFrame, every_ms: int = 5000) -> DataFrame:
    """Frame sampling: the row fan-out (1 video -> N frame rows) is real
    Spark (explode over a JVM-computed timestamp sequence); only the frame
    decode is stubbed (frame_png = hash bytes)."""
    vids = media.filter(F.col("kind") == "video").select(
        "media_id", "duration_ms", "payload"
    )
    ts = F.sequence(F.lit(0).cast("long"), F.col("duration_ms"), F.lit(every_ms).cast("long"))
    exploded = vids.select(
        "media_id", F.posexplode(ts).alias("frame_idx", "ts_ms"), "payload"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # STUB: real impl seeks+decodes the frame at ts_ms via ffmpeg
            fake = [
                bytes.fromhex(format(abs(hash((int(m), int(t)))) % (1 << 60), "016x"))
                for m, t in zip(pdf["media_id"], pdf["ts_ms"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"],
                    "ts_ms": pdf["ts_ms"],
                    "frame_png": fake,
                }
            )

    return exploded.mapInPandas(op, schema=FRAME_SAMPLE_SCHEMA)


def metadata_only_scan(media: DataFrame) -> DataFrame:
    """Metadata projection — verify with .explain() that ReadSchema excludes
    `payload` (column pruning keeps the 100 TB of bytes unread)."""
    return media.select("media_id", "kind", "mime", "width", "height", "n_bytes")
