"""Dump sink: stage raw binlog chunks into a parquet chunk table.

The engine's counterpart of the reference's dump sink
(/root/reference/dump.go:14-125): a filtered, resumable byte-copy keyed by
(log_file, chunk_off).  Staging to parquet gives the cluster a splittable,
column-pruned, partition-pruned source (FIXTURES.md §2 `binlog_chunks`);
resume is an offset predicate, idempotence comes from overwriting the same
(log_file) partition deterministically — the generalization of the
reference's seek+overwrite-at-offset (dump.go:92-99).
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .chunks import chunks_df

STAGED_SCHEMA = ("log_file string, chunk_off long, chunk_len long, "
                 "data binary")


def _read_spans(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for dump_dir, log_file, off, ln in zip(
                pdf["dump_dir"], pdf["log_file"], pdf["chunk_off"],
                pdf["chunk_len"]):
            with open(os.path.join(dump_dir, log_file), "rb") as f:
                f.seek(off)
                rows.append((log_file, int(off), int(ln), f.read(ln)))
        yield pd.DataFrame(rows, columns=["log_file", "chunk_off",
                                          "chunk_len", "data"])


def stage_dump(spark: SparkSession, dump_dir: str, out_dir: str,
               resume: bool = True) -> dict:
    """Stage a dump dir into a parquet chunk table partitioned by log_file.

    With ``resume=True`` only files not yet fully staged are (re)written —
    re-staging a file overwrites its partition (idempotent).
    """
    spans = chunks_df(spark, dump_dir)
    done: set[str] = set()
    if resume and os.path.isdir(out_dir):
        staged = spark.read.parquet(out_dir)
        want = {r.log_file: r.end for r in
                spans.groupBy("log_file")
                .agg(F.max(F.col("chunk_off") + F.col("chunk_len"))
                     .alias("end")).collect()}
        have = {r.log_file: r.end for r in
                staged.groupBy("log_file")
                .agg(F.max(F.col("chunk_off") + F.col("chunk_len"))
                     .alias("end")).collect()}
        done = {f for f, end in have.items() if want.get(f) == end}
        spans = spans.filter(~F.col("log_file").isin(list(done))
                             if done else F.lit(True))
    n = spans.count()
    if n:
        (spans.repartition("log_file")
         .mapInPandas(_read_spans, STAGED_SCHEMA)
         .write.partitionBy("log_file").mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .parquet(out_dir))
    return {"staged_spans": n, "skipped_files": len(done)}


def staged_chunks(spark: SparkSession, out_dir: str) -> DataFrame:
    """Chunk DataFrame (with data) from a staged parquet chunk table —
    feed directly to decoder.kernel.decode_changes."""
    return spark.read.parquet(out_dir).select(
        "log_file", "chunk_off", "chunk_len", "data")
