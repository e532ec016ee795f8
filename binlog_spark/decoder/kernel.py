"""Vectorized decode kernel: chunk spans → change-event DataFrame.

One ``mapInPandas`` pass; each Arrow batch of chunk-span rows makes the
executor read its own byte ranges and decode *thousands of events per
call* — Python cost is amortized per multi-megabyte chunk, never per
DataFrame row (BASELINE.json:6; strategy per SURVEY §7 "hard parts" #1).

Output is the canonical CDC record of FIXTURES.md §3, flattened for the
apply path (structs cost Arrow conversion time; the relational columns the
pipeline shuffles on must be top-level for Catalyst to prune/push down):

    op          I / U / D
    repo..content   after-image columns (for D: the WHERE-image key,
                    data columns null)
    before_repo/before_path  present on U/D (detects key-changing updates)
    gtid, seq_in_tx          dedup identity
    log_file, log_pos        commit-order offset (/root/reference/binlog.go:23-26)
    ts_sec, crc_ok           header timestamp + checksum verdict
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BooleanType, IntegerType, LongType, StringType,
                               StructField, StructType)

from .. import constants as C
from ..mysql.decode import Cur, iter_frames, parse_rows_event, parse_table_map

CHANGE_SCHEMA = StructType([
    StructField("op", StringType(), False),
    StructField("repo", StringType(), True),
    StructField("path", StringType(), True),
    StructField("commit", StringType(), True),
    StructField("lang", StringType(), True),
    StructField("content", StringType(), True),
    StructField("before_repo", StringType(), True),
    StructField("before_path", StringType(), True),
    StructField("gtid", StringType(), True),
    StructField("seq_in_tx", IntegerType(), False),
    StructField("log_file", StringType(), False),
    StructField("log_pos", LongType(), False),
    StructField("ts_sec", LongType(), False),
    StructField("crc_ok", BooleanType(), False),
])

_COLNAMES = [f.name for f in CHANGE_SCHEMA.fields]


def decode_span_columns(data: bytes, log_file: str, *, has_magic: bool = False,
                        verify_crc: bool = True) -> dict[str, list]:
    """Decode one chunk into columnar lists (no per-record objects)."""
    import uuid as _uuid
    cols: dict[str, list] = {k: [] for k in _COLNAMES}
    ap = {k: cols[k].append for k in _COLNAMES}
    tme_cache: dict[int, object] = {}
    gtid = None
    seq = 0
    for fr, fde_now in iter_frames(data, has_magic=has_magic,
                                   verify_crc=verify_crc):
        t = fr.event_type
        if t == C.GTID_EVENT or t == C.ANONYMOUS_GTID_EVENT:
            cur = Cur(fr.body)
            cur.int1()
            sid = cur.bytes(16)
            gno = cur.int8()
            gtid = f"{_uuid.UUID(bytes=sid)}:{gno}"
            seq = 0
        elif t == C.TABLE_MAP_EVENT:
            tme = parse_table_map(Cur(fr.body))
            tme_cache[tme.table_id] = tme
        elif t in C.ROWS_EVENTS:
            tme, rows = parse_rows_event(Cur(fr.body), t, fde_now, tme_cache)
            if tme is None or not rows:
                continue
            op = ("I" if t in C.WRITE_ROWS_EVENTS
                  else "U" if t in C.UPDATE_ROWS_EVENTS else "D")
            pos, ts, crc = fr.next_pos, fr.timestamp, fr.crc_ok
            for before, after in rows:
                img = after if after is not None else before
                ap["op"](op)
                ap["repo"](img[0])
                ap["path"](img[1])
                if after is not None:
                    ap["commit"](img[2])
                    ap["lang"](img[3])
                    ap["content"](img[4])
                else:
                    ap["commit"](None)
                    ap["lang"](None)
                    ap["content"](None)
                if before is not None:
                    ap["before_repo"](before[0])
                    ap["before_path"](before[1])
                else:
                    ap["before_repo"](None)
                    ap["before_path"](None)
                ap["gtid"](gtid)
                ap["seq_in_tx"](seq)
                ap["log_file"](log_file)
                ap["log_pos"](pos)
                ap["ts_sec"](ts)
                ap["crc_ok"](crc)
                seq += 1
        elif t == C.ROTATE_EVENT:
            tme_cache.clear()  # (/root/reference/binlog.go:42)
    return cols


def _cols_to_pdf(cols: dict[str, list]) -> pd.DataFrame:
    return pd.DataFrame({k: pd.Series(v, dtype=object) if k not in
                         ("seq_in_tx", "log_pos", "ts_sec", "crc_ok")
                         else v for k, v in cols.items()})


def _decode_spans(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        for dump_dir, log_file, off, ln in zip(
                pdf["dump_dir"], pdf["log_file"], pdf["chunk_off"], pdf["chunk_len"]):
            with open(os.path.join(dump_dir, log_file), "rb") as f:
                f.seek(off)
                data = f.read(ln)
            cols = decode_span_columns(data, log_file, has_magic=off == 0)
            if cols["op"]:
                yield _cols_to_pdf(cols)


def _decode_blobs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        for log_file, off, data in zip(pdf["log_file"], pdf["chunk_off"], pdf["data"]):
            cols = decode_span_columns(data, log_file, has_magic=off == 0)
            if cols["op"]:
                yield _cols_to_pdf(cols)


def decode_changes(chunks: DataFrame, *, partitions: int | None = None) -> DataFrame:
    """Chunk-span DF → change-event DF.

    ``repartition`` spreads chunks evenly over the cluster *before* decode —
    decode cost is proportional to bytes, so round-robin on chunk count is
    the right pre-shuffle (spans are size-bounded by the generator).
    """
    if partitions:
        chunks = chunks.repartition(partitions)
    if "data" in chunks.columns:
        return chunks.mapInPandas(_decode_blobs, CHANGE_SCHEMA)
    return chunks.mapInPandas(_decode_spans, CHANGE_SCHEMA)


def with_ts(events: DataFrame) -> DataFrame:
    return events.withColumn("ts", F.to_timestamp(F.from_unixtime("ts_sec")))
