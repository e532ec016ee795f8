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
from .chunks import check_span_bounds

CHANGE_SCHEMA = StructType([
    StructField("op", StringType(), False),
    StructField("repo", StringType(), True),
    StructField("path", StringType(), True),
    StructField("commit", StringType(), True),
    StructField("lang", StringType(), True),
    StructField("content", StringType(), True),
    # columns beyond the base schema (TABLE_MAP evolution) as a JSON map
    StructField("extra_json", StringType(), True),
    StructField("before_repo", StringType(), True),
    StructField("before_path", StringType(), True),
    StructField("gtid", StringType(), True),
    StructField("seq_in_tx", IntegerType(), False),
    StructField("log_file", StringType(), False),
    StructField("log_pos", LongType(), False),
    StructField("ts_sec", LongType(), False),
    StructField("crc_ok", BooleanType(), False),
    # MINIMAL row images: csv of the after-image's present columns; null
    # for FULL images (the record is then a whole-row replacement)
    StructField("present_cols", StringType(), True),
])

_COLNAMES = [f.name for f in CHANGE_SCHEMA.fields]


def _parse_rows_fast(body: memoryview, event_type: int, fde, tme):
    """Specialized row parser for all-VARCHAR tables (the repo_files
    schema): same wire layout as the generic path
    (/root/reference/rbr.go:246-350) but with inlined length-prefix reads.
    Returns None when the event needs the generic decoder."""
    pos = 4 if fde.post_header(event_type, 8) == 6 else 6
    pos += 2  # flags
    if event_type in C.ROWS_EVENTS_V2:
        extra = body[pos] | (body[pos + 1] << 8)
        pos += extra
    ncol = body[pos]
    if ncol >= 0xFB or ncol > 8:  # lenenc >1 byte or multi-byte null bitmap
        return None
    pos += 1
    nb = (ncol + 7) // 8
    present = bytes(body[pos:pos + nb])
    pos += nb
    is_update = event_type in C.UPDATE_ROWS_EVENTS
    if is_update:
        present2 = bytes(body[pos:pos + nb])
        pos += nb
        if present2 != present:
            return None
    if present != bytes([0xFF] * (ncol // 8) + ([((1 << (ncol % 8)) - 1)]
                                               if ncol % 8 else [])):
        return None  # partial-column image → generic path
    cols = tme.columns
    if len(cols) != ncol:
        return None
    # widths: 1- or 2-byte length prefix per column, all varchar/string
    widths = []
    for c in cols:
        if c.type not in (C.TYPE_VARCHAR, C.TYPE_STRING):
            return None
        widths.append(1 if c.meta < 256 else 2)
    end = len(body)
    images_per_row = 2 if is_update else 1
    rows = []
    b = body
    while pos < end:
        imgs = []
        for _ in range(images_per_row):
            nullmap = b[pos]
            pos += 1
            vals = []
            for i in range(ncol):
                if (nullmap >> i) & 1:
                    vals.append(None)
                    continue
                if widths[i] == 1:
                    ln = b[pos]
                    pos += 1
                else:
                    ln = b[pos] | (b[pos + 1] << 8)
                    pos += 2
                vals.append(str(b[pos:pos + ln], "utf-8"))
                pos += ln
            imgs.append(vals)
        if is_update:
            rows.append((imgs[0], imgs[1]))
        elif event_type in C.WRITE_ROWS_EVENTS:
            rows.append((None, imgs[0]))
        else:
            rows.append((imgs[0], None))
    return rows


def decode_span_columns(data: bytes, log_file: str, *, has_magic: bool = False,
                        verify_crc: bool = True) -> dict[str, list]:
    """Decode one chunk into columnar lists (no per-record objects)."""
    import uuid as _uuid
    cols: dict[str, list] = {k: [] for k in _COLNAMES}
    ap = {k: cols[k].append for k in _COLNAMES}
    tme_cache: dict[int, object] = {}
    # MySQL re-emits an identical TABLE_MAP before every rows-event of a
    # statement run; parse each distinct body once (keyed by raw bytes).
    tme_body_cache: dict[bytes, object] = {}
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
            key = bytes(fr.body)
            tme = tme_body_cache.get(key)
            if tme is None:
                tme = parse_table_map(Cur(fr.body))
                tme_body_cache[key] = tme
            tme_cache[tme.table_id] = tme
        elif t in C.ROWS_EVENTS:
            pos8 = 4 if fde_now.post_header(t, 8) == 6 else 6
            tid = int.from_bytes(fr.body[:pos8], "little")
            tme = tme_cache.get(tid)
            rows = (_parse_rows_fast(fr.body, t, fde_now, tme)
                    if tme is not None else None)
            bnames = anames = None
            if rows is None:
                tme, rows, bnames, anames = parse_rows_event(
                    Cur(fr.body), t, fde_now, tme_cache)
            if tme is None or not rows:
                continue
            op = ("I" if t in C.WRITE_ROWS_EVENTS
                  else "U" if t in C.UPDATE_ROWS_EVENTS else "D")
            pos, ts, crc = fr.next_pos, fr.timestamp, fr.crc_ok
            full = getattr(tme, "_full_names", None)
            if full is None:
                full = tme._full_names = tuple(c.name for c in tme.columns)
            partial = ((anames is not None and anames != full)
                       or (bnames is not None and bnames != full))
            import json as _json
            if partial:
                # MINIMAL images: map by present-column name (slow path;
                # /root/reference/rbr.go:283-303 reads the same subsets)
                base = ("repo", "path", "commit", "lang", "content")
                pres_csv = ",".join(anames) if anames is not None else None
                for before, after in rows:
                    adict = (dict(zip(anames, after))
                             if after is not None else {})
                    bdict = (dict(zip(bnames, before))
                             if before is not None else {})
                    img = adict if after is not None else bdict
                    ap["op"](op)
                    ap["repo"](img.get("repo"))
                    ap["path"](img.get("path"))
                    ap["commit"](adict.get("commit"))
                    ap["lang"](adict.get("lang"))
                    ap["content"](adict.get("content"))
                    ex = {n: v for n, v in adict.items()
                          if n not in base and v is not None}
                    ap["extra_json"](_json.dumps(ex, sort_keys=True)
                                     if ex else None)
                    ap["before_repo"](bdict.get("repo"))
                    ap["before_path"](bdict.get("path"))
                    ap["gtid"](gtid)
                    ap["seq_in_tx"](seq)
                    ap["log_file"](log_file)
                    ap["log_pos"](pos)
                    ap["ts_sec"](ts)
                    ap["crc_ok"](crc)
                    ap["present_cols"](pres_csv if op != "D" else None)
                    seq += 1
                continue
            layout = getattr(tme, "_layout", None)
            if layout is None:
                names = [c.name for c in tme.columns]
                base = ("repo", "path", "commit", "lang", "content")
                fixed = [names.index(n) if n in names else None for n in base]
                extras = [(n, i) for i, n in enumerate(names) if n not in base]
                layout = (fixed, extras)
                tme._layout = layout
            (i_repo, i_path, i_commit, i_lang, i_content), extras = layout
            for before, after in rows:
                img = after if after is not None else before
                ap["op"](op)
                ap["repo"](img[i_repo])
                ap["path"](img[i_path])
                if after is not None:
                    ap["commit"](img[i_commit])
                    ap["lang"](img[i_lang])
                    ap["content"](img[i_content])
                    if extras:
                        ex = {n: img[i] for n, i in extras
                              if img[i] is not None}
                        ap["extra_json"](_json.dumps(ex, sort_keys=True)
                                         if ex else None)
                    else:
                        ap["extra_json"](None)
                else:
                    ap["commit"](None)
                    ap["lang"](None)
                    ap["content"](None)
                    ap["extra_json"](None)
                if before is not None:
                    ap["before_repo"](before[i_repo])
                    ap["before_path"](before[i_path])
                else:
                    ap["before_repo"](None)
                    ap["before_path"](None)
                ap["gtid"](gtid)
                ap["seq_in_tx"](seq)
                ap["log_file"](log_file)
                ap["log_pos"](pos)
                ap["ts_sec"](ts)
                ap["crc_ok"](crc)
                ap["present_cols"](None)
                seq += 1
        elif t == C.ROTATE_EVENT:
            tme_cache.clear()  # (/root/reference/binlog.go:42)
    return cols


_ARROW_TYPES = {
    "seq_in_tx": "int32", "log_pos": "int64", "ts_sec": "int64",
    "crc_ok": "bool",
}

KEY_SCHEMA = StructType([
    StructField("op", StringType(), False),
    StructField("repo", StringType(), True),
    StructField("path", StringType(), True),
    StructField("before_repo", StringType(), True),
    StructField("before_path", StringType(), True),
    StructField("log_file", StringType(), False),
    StructField("log_pos", LongType(), False),
    StructField("seq_in_tx", IntegerType(), False),
    StructField("crc_ok", BooleanType(), False),
])

_KEYNAMES = [f.name for f in KEY_SCHEMA.fields]


def decode_span_keys(data: bytes, log_file: str, *, has_magic: bool = False,
                     verify_crc: bool = True) -> dict[str, list]:
    """Cheap first pass for late materialization: extract only (op, key,
    before-key, order) per change — values beyond the key columns are
    skipped by length arithmetic, no string materialization."""
    from ..mysql.decode import parse_table_map
    cols: dict[str, list] = {k: [] for k in _KEYNAMES}
    ap = {k: cols[k].append for k in _KEYNAMES}
    tme_cache: dict[int, object] = {}
    tme_body_cache: dict[bytes, object] = {}
    seq = 0
    for fr, fde_now in iter_frames(data, has_magic=has_magic,
                                   verify_crc=verify_crc):
        t = fr.event_type
        if t == C.GTID_EVENT or t == C.ANONYMOUS_GTID_EVENT:
            seq = 0
        elif t == C.TABLE_MAP_EVENT:
            key = bytes(fr.body)
            tme = tme_body_cache.get(key)
            if tme is None:
                tme = parse_table_map(Cur(fr.body))
                tme_body_cache[key] = tme
            tme_cache[tme.table_id] = tme
        elif t in C.ROWS_EVENTS:
            pos8 = 4 if fde_now.post_header(t, 8) == 6 else 6
            tid = int.from_bytes(fr.body[:pos8], "little")
            tme = tme_cache.get(tid)
            if tme is None:
                continue
            parsed = _parse_rows_keys(fr.body, t, fde_now, tme)
            if parsed is None:
                # fall back: full parse, keep keys only — mapped by NAME
                # so MINIMAL (partial) images resolve correctly
                _t2, rows, bnames, anames = parse_rows_event(
                    Cur(fr.body), t, fde_now, tme_cache)

                def key_of(img, names):
                    if img is None:
                        return None
                    d = dict(zip(names, img))
                    return (d.get("repo"), d.get("path"))

                parsed = [(key_of(b, bnames), key_of(a, anames))
                          for b, a in rows]
            op = ("I" if t in C.WRITE_ROWS_EVENTS
                  else "U" if t in C.UPDATE_ROWS_EVENTS else "D")
            pos, crc = fr.next_pos, fr.crc_ok
            for before, after in parsed:
                img = after if after is not None else before
                ap["op"](op)
                ap["repo"](img[0])
                ap["path"](img[1])
                if before is not None:
                    ap["before_repo"](before[0])
                    ap["before_path"](before[1])
                else:
                    ap["before_repo"](None)
                    ap["before_path"](None)
                ap["log_file"](log_file)
                ap["log_pos"](pos)
                ap["seq_in_tx"](seq)
                ap["crc_ok"](crc)
                seq += 1
        elif t == C.ROTATE_EVENT:
            tme_cache.clear()
    return cols


def _parse_rows_keys(body: memoryview, event_type: int, fde, tme):
    """Key-only row walk for all-varchar tables: parse the first two
    columns (repo, path), skip the rest by length arithmetic."""
    pos = 4 if fde.post_header(event_type, 8) == 6 else 6
    pos += 2
    if event_type in C.ROWS_EVENTS_V2:
        extra = body[pos] | (body[pos + 1] << 8)
        pos += extra
    ncol = body[pos]
    if ncol >= 0xFB or ncol > 8:
        return None
    pos += 1
    nb = (ncol + 7) // 8
    present = bytes(body[pos:pos + nb])
    pos += nb
    is_update = event_type in C.UPDATE_ROWS_EVENTS
    if is_update:
        if bytes(body[pos:pos + nb]) != present:
            return None
        pos += nb
    full = bytes([0xFF] * (ncol // 8) + ([((1 << (ncol % 8)) - 1)]
                                         if ncol % 8 else []))
    if present != full:
        return None
    widths = []
    for c in tme.columns:
        if c.type not in (C.TYPE_VARCHAR, C.TYPE_STRING):
            return None
        widths.append(1 if c.meta < 256 else 2)
    if len(widths) != ncol:
        return None
    end = len(body)
    images = 2 if is_update else 1
    out = []
    b = body
    while pos < end:
        imgs = []
        for _ in range(images):
            nullmap = b[pos]
            pos += 1
            key_vals = [None, None]
            for i in range(ncol):
                if (nullmap >> i) & 1:
                    continue
                if widths[i] == 1:
                    ln = b[pos]
                    pos += 1
                else:
                    ln = b[pos] | (b[pos + 1] << 8)
                    pos += 2
                if i < 2:
                    key_vals[i] = str(b[pos:pos + ln], "utf-8")
                pos += ln
            imgs.append(tuple(key_vals))
        if is_update:
            out.append((imgs[0], imgs[1]))
        elif event_type in C.WRITE_ROWS_EVENTS:
            out.append((None, imgs[0]))
        else:
            out.append((imgs[0], None))
    return out


def _cols_to_batch(cols: dict[str, list]):
    """Columnar lists → Arrow RecordBatch directly (no pandas object
    Series in between — one C conversion pass per column)."""
    import pyarrow as pa
    arrays = [pa.array(cols[k], type=pa.type_for_alias(
        _ARROW_TYPES.get(k, "string"))) for k in _COLNAMES]
    return pa.RecordBatch.from_arrays(arrays, names=list(_COLNAMES))


def _decode_one(data: bytes, log_file: str, has_magic: bool):
    """Vectorized kernel first (decoder/vector.py: numpy header walk +
    codegen row walk + ragged-join Arrow build, ~2× the classic kernel);
    chunks outside its fast layout (legacy versions, MINIMAL images,
    non-varchar tables, schema evolution) return None and re-decode on
    the classic path — per-chunk granularity, so a mixed dump pays the
    slow path only for the chunks that need it."""
    from .vector import decode_span_batch
    rb = decode_span_batch(data, log_file, has_magic=has_magic)
    if rb is not None:
        return rb if rb.num_rows else None
    cols = decode_span_columns(data, log_file, has_magic=has_magic)
    return _cols_to_batch(cols) if cols["op"] else None


def _decode_spans_arrow(batches):
    for rb in batches:
        d = rb.to_pydict()
        for dump_dir, log_file, off, ln in zip(
                d["dump_dir"], d["log_file"], d["chunk_off"], d["chunk_len"]):
            check_span_bounds(log_file, off, ln)
            with open(os.path.join(dump_dir, log_file), "rb") as f:
                f.seek(off)
                data = f.read(ln)
            out = _decode_one(data, log_file, off == 0)
            if out is not None:
                yield out


def _decode_blobs_arrow(batches):
    for rb in batches:
        d = rb.to_pydict()
        for log_file, off, data in zip(d["log_file"], d["chunk_off"],
                                       d["data"]):
            check_span_bounds(log_file, off, len(data))
            out = _decode_one(data, log_file, off == 0)
            if out is not None:
                yield out


def decode_changes(chunks: DataFrame, *, partitions: int | None = None) -> DataFrame:
    """Chunk-span DF → change-event DF via ``mapInArrow`` (Arrow batches
    built directly in the UDF; the pandas layer is skipped entirely).

    ``repartition`` spreads chunks evenly over the cluster *before* decode —
    decode cost is proportional to bytes, so round-robin on chunk count is
    the right pre-shuffle (spans are size-bounded by the generator).
    """
    if partitions:
        chunks = chunks.repartition(partitions)
    if "data" in chunks.columns:
        return chunks.mapInArrow(_decode_blobs_arrow, CHANGE_SCHEMA)
    return chunks.mapInArrow(_decode_spans_arrow, CHANGE_SCHEMA)


def _decode_keys_one(data: bytes, log_file: str, has_magic: bool):
    """Vectorized key pass first, classic fallback (see _decode_one)."""
    from .vector import decode_span_keys_batch
    rb = decode_span_keys_batch(data, log_file, has_magic=has_magic)
    if rb is not None:
        return rb if rb.num_rows else None
    cols = decode_span_keys(data, log_file, has_magic=has_magic)
    return _keys_to_batch(cols) if cols["op"] else None


def _decode_keys_spans_arrow(batches):
    for rb in batches:
        d = rb.to_pydict()
        for dump_dir, log_file, off, ln in zip(
                d["dump_dir"], d["log_file"], d["chunk_off"], d["chunk_len"]):
            check_span_bounds(log_file, off, ln)
            with open(os.path.join(dump_dir, log_file), "rb") as f:
                f.seek(off)
                data = f.read(ln)
            out = _decode_keys_one(data, log_file, off == 0)
            if out is not None:
                yield out


def _decode_keys_blobs_arrow(batches):
    for rb in batches:
        d = rb.to_pydict()
        for log_file, off, data in zip(d["log_file"], d["chunk_off"],
                                       d["data"]):
            check_span_bounds(log_file, off, len(data))
            out = _decode_keys_one(data, log_file, off == 0)
            if out is not None:
                yield out


def _keys_to_batch(cols: dict[str, list]):
    import pyarrow as pa
    arrays = [pa.array(cols[k], type=pa.type_for_alias(
        _ARROW_TYPES.get(k, "string"))) for k in _KEYNAMES]
    return pa.RecordBatch.from_arrays(arrays, names=list(_KEYNAMES))


def decode_keys(chunks: DataFrame, *, partitions: int | None = None) -> DataFrame:
    """Key-only decode pass (late materialization, ~3-4× cheaper than the
    full decode: values are length-skipped, never materialized)."""
    if partitions:
        chunks = chunks.repartition(partitions)
    if "data" in chunks.columns:
        return chunks.mapInArrow(_decode_keys_blobs_arrow, KEY_SCHEMA)
    return chunks.mapInArrow(_decode_keys_spans_arrow, KEY_SCHEMA)


def with_ts(events: DataFrame) -> DataFrame:
    return events.withColumn("ts", F.to_timestamp(F.from_unixtime("ts_sec")))
