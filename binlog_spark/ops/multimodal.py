"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Image/audio decode libraries are not in this container, so the *decode* is
a clearly-marked deterministic stub — but the Spark-side plumbing is real:
binary columns, Arrow-batched ``mapInPandas`` with a typed output schema,
and metadata extraction that a real decoder would slot into.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

META_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("n_bytes", IntegerType(), False),
    StructField("format", StringType(), False),
    StructField("width", IntegerType(), False),
    StructField("height", IntegerType(), False),
])


def real_image_decode(payload: bytes) -> dict:
    """Placeholder for a real decoder (PIL/libvips) — not available in
    this container."""
    raise NotImplementedError("image decode libraries not installed; "
                              "use the deterministic stub")


def _stub_meta(payload: bytes) -> tuple[int, str, int, int]:
    """Deterministic fake decode: metadata derived purely from payload
    bytes, so the DuckDB oracle can reproduce it from octet_length."""
    n = len(payload)
    fmt = "png" if n % 3 == 0 else ("jpeg" if n % 3 == 1 else "webp")
    return n, fmt, 64 + (n % 512), 64 + (n % 384)


def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        metas = [(int(d), *_stub_meta(p))
                 for d, p in zip(pdf["doc_id"], pdf["payload"])]
        yield pd.DataFrame(metas, columns=[
            "doc_id", "n_bytes", "format", "width", "height"]).astype({
                "doc_id": "int64", "n_bytes": "int32",
                "width": "int32", "height": "int32"})


def binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary column → typed metadata through the Arrow/mapInPandas path.

    The payload is synthesized from the documents table (no real media in
    the sandbox); everything downstream of the payload bytes is exactly
    the pipeline a real corpus would use."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payloads = d.select("doc_id",
                        F.encode(F.col("text"), "UTF-8").alias("payload"))
    return (payloads.mapInPandas(_extract, META_SCHEMA)
            .orderBy("doc_id"))


def frame_sample(spark: SparkSession, sf_dir: str,
                 every_n: int = 7) -> DataFrame:
    """Frame-sampling shape: treat each 64-byte slice of the payload as a
    'frame', keep every Nth — windowed selection over binary offsets, all
    with built-in functions (sequence + transform + filter)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    n_frames = F.greatest(
        F.floor((F.octet_length("payload") + 63) / 64).cast("int"), F.lit(1))
    frames = p.select(
        "doc_id",
        F.filter(F.sequence(F.lit(0), n_frames - 1),
                 lambda i: i % every_n == 0).alias("kept"))
    return (frames.select("doc_id",
                          F.size("kept").cast("long").alias("n_sampled"),
                          F.element_at("kept", -1).cast("long")
                          .alias("last_frame_idx"))
            .orderBy("doc_id"))
