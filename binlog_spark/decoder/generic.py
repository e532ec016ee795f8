"""Generic-table decode: any MySQL schema → change events with JSON images.

The repo_files kernel (decoder.kernel) is specialized for the lake table's
fixed columns; this path handles *arbitrary* TABLE_MAP schemas — all 24
scalar types (packed decimal, bitfield temporals, enum/set, binary JSON…)
— rendering each row image as a canonical JSON object keyed by column name
(or ``@ordinal`` when the binlog lacks FULL metadata, mirroring the
reference CLI's rendering, /root/reference/cmd/binlog/main.go:196-265).
"""

from __future__ import annotations

import datetime as _dt
import json
import os

from pyspark.sql import DataFrame
from pyspark.sql.types import (BooleanType, IntegerType, LongType,
                               StringType, StructField, StructType)

from ..mysql.decode import decode_chunk

GENERIC_SCHEMA = StructType([
    StructField("op", StringType(), False),
    StructField("table_schema", StringType(), True),
    StructField("table_name", StringType(), True),
    StructField("before_json", StringType(), True),
    StructField("after_json", StringType(), True),
    StructField("gtid", StringType(), True),
    StructField("seq_in_tx", IntegerType(), False),
    StructField("log_file", StringType(), False),
    StructField("log_pos", LongType(), False),
    StructField("ts_sec", LongType(), False),
    StructField("crc_ok", BooleanType(), False),
])

_GCOLS = [f.name for f in GENERIC_SCHEMA.fields]


def _jsonable(v):
    if isinstance(v, bytes):
        return {"$hex": v.hex()}
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    return v


def _image_json(names, values) -> str | None:
    if values is None:
        return None
    obj = {}
    for i, v in enumerate(values):
        name = names[i] if i < len(names) and names[i] else f"@{i}"
        obj[name] = _jsonable(v)
    return json.dumps(obj, sort_keys=True, default=str)


def decode_span_generic(data: bytes, log_file: str, *,
                        has_magic: bool = False,
                        verify_crc: bool = True) -> dict[str, list]:
    cols: dict[str, list] = {k: [] for k in _GCOLS}
    ap = {k: cols[k].append for k in _GCOLS}
    for r in decode_chunk(data, log_file, has_magic=has_magic,
                          verify_crc=verify_crc):
        ap["op"](r.op)
        ap["table_schema"](r.table_schema)
        ap["table_name"](r.table_name)
        ap["before_json"](_image_json(r.columns, r.before))
        ap["after_json"](_image_json(r.columns, r.after))
        ap["gtid"](r.gtid)
        ap["seq_in_tx"](r.seq_in_tx)
        ap["log_file"](r.log_file)
        ap["log_pos"](r.log_pos)
        ap["ts_sec"](r.ts)
        ap["crc_ok"](r.crc_ok)
    return cols


_ARROW_TYPES = {"seq_in_tx": "int32", "log_pos": "int64",
                "ts_sec": "int64", "crc_ok": "bool"}


def _to_batch(cols: dict[str, list]):
    import pyarrow as pa
    arrays = [pa.array(cols[k], type=pa.type_for_alias(
        _ARROW_TYPES.get(k, "string"))) for k in _GCOLS]
    return pa.RecordBatch.from_arrays(arrays, names=list(_GCOLS))


def _decode_generic_spans(batches):
    for rb in batches:
        d = rb.to_pydict()
        for dump_dir, log_file, off, ln in zip(
                d["dump_dir"], d["log_file"], d["chunk_off"], d["chunk_len"]):
            with open(os.path.join(dump_dir, log_file), "rb") as f:
                f.seek(off)
                data = f.read(ln)
            cols = decode_span_generic(data, log_file, has_magic=off == 0)
            if cols["op"]:
                yield _to_batch(cols)


def _decode_generic_blobs(batches):
    for rb in batches:
        d = rb.to_pydict()
        for log_file, off, data in zip(d["log_file"], d["chunk_off"],
                                       d["data"]):
            cols = decode_span_generic(data, log_file, has_magic=off == 0)
            if cols["op"]:
                yield _to_batch(cols)


def decode_changes_generic(chunks: DataFrame, *,
                           partitions: int | None = None) -> DataFrame:
    """Chunk-span DF → generic change-event DF (JSON row images)."""
    if partitions:
        chunks = chunks.repartition(partitions)
    if "data" in chunks.columns:
        return chunks.mapInArrow(_decode_generic_blobs, GENERIC_SCHEMA)
    return chunks.mapInArrow(_decode_generic_spans, GENERIC_SCHEMA)
