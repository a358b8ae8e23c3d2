"""Multimodal (binary) column plumbing (BASELINE north-star; ABSENT in
the reference).

Images/audio/video are opaque ``binary`` columns + typed metadata
structs. The Spark-side plumbing — schemas, partition-sized Arrow
batches through ``mapInPandas``, deterministic feature extraction — is
real and tested; the actual media DECODE step is stubbed (no
image/audio libraries in this container) behind ``decode_stub``:
deterministic fake features derived from the bytes, or
``NotImplementedError`` in strict mode. Swapping in a real decoder means
replacing ONE pandas function; the distributed plan is unchanged.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), True),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("meta_format", StringType(), True),
        StructField("meta_bytes", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), True),
        StructField("meta_bytes", LongType(), True),
        StructField("content_sha", StringType(), True),
        StructField("feature", ArrayType(DoubleType()), True),
    ]
)


def attach_binary_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Typed metadata over an opaque binary column — JVM-side only
    (length/hash), no decode needed. This is the cheap scan-time pass
    that runs on all 100 TB before any expensive decode."""
    return df.withColumn("meta_bytes", F.length(F.col(content_col)).cast("long")).withColumn(
        "content_sha", F.sha2(F.col(content_col), 256)
    )


def decode_stub(content: bytes, kind: str, dim: int = 8, strict: bool = False) -> list[float]:
    """STUB for the media decoder. Real deployments replace this with
    PIL/torchaudio/ffmpeg decode + model features. Deterministic fake:
    dim floats derived from sha256 of the bytes, so tests are stable."""
    if strict:
        raise NotImplementedError("media decoding requires image/audio libs not in this container")
    if content is None:
        return [0.0] * dim
    digest = hashlib.sha256(bytes(content) + kind.encode()).digest()
    return [round(b / 255.0, 6) for b in digest[:dim]]


def extract_features(df: DataFrame, dim: int = 8, batch_hint: int = 256) -> DataFrame:
    """Decode + featurize via ``mapInPandas``: Arrow-batched, one python
    worker per partition, output schema fixed. The expensive step — run
    it AFTER metadata filtering has pruned the corpus."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "meta_bytes": pdf["content"].map(lambda b: 0 if b is None else len(b)),
                    "content_sha": pdf["content"].map(
                        lambda b: "" if b is None else hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "feature": [
                        decode_stub(c, k, dim) for c, k in zip(pdf["content"], pdf["kind"])
                    ],
                }
            )
            yield out

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10, bytes_per_frame: int = 64) -> DataFrame:
    """Video frame-sampling PLUMBING: expands (media_id, n_frames) into
    (media_id, frame_no) rows for frames 0, n, 2n… — the distributed
    work-list a real frame decoder would map over. Uses sequence/explode,
    no Python. Frame count is faked from payload size (real decoders
    replace this one expression)."""
    n_frames = F.expr(f"meta_bytes div {bytes_per_frame}") + 1
    return df.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), (n_frames - 1).cast("int"), F.lit(every_n))).alias("frame_no"),
    )


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: build a media table from the documents fixture (text bytes
    as the opaque payload) so the binary pipeline is exercisable on the
    driver's testdata without shipping media files."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, F.lit("image"))
        .when(F.col(id_col) % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit("synthetic/utf8").alias("meta_format"),
        F.length(F.encode(F.col(text_col), "UTF-8")).cast("long").alias("meta_bytes"),
    )
