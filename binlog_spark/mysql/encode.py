"""Binlog v4 byte encoders — the fixture generator's low-level writers.

These synthesize *valid* MySQL binlog v4 bytes (magic, FDE, TABLE_MAP with
FULL row metadata, GTID, QUERY, ROWS v1/v2, XID, ROTATE, CRC32 trailers),
playing the role MySQL itself plays in the reference's tests
(/root/reference/types_test.go:284-354).  Encoding rules mirror the public
binlog format that the reference decodes:
  * event header   /root/reference/events.go:138-148
  * FDE            /root/reference/events.go:162-179
  * TABLE_MAP      /root/reference/rbr.go:45-153
  * ROWS v1/v2     /root/reference/rbr.go:246-350
  * scalar types   /root/reference/types.go:118-334
"""

from __future__ import annotations

import datetime as _dt
import struct
import zlib
from typing import Any, Iterable, Sequence

from .. import constants as C

# ---------------------------------------------------------------------------
# primitive little-endian / length-encoded writers
# (mirror of /root/reference/writer.go:9-160 roles, reimplemented)
# ---------------------------------------------------------------------------


def int1(v: int) -> bytes:
    return bytes((v & 0xFF,))


def int2(v: int) -> bytes:
    return struct.pack("<H", v & 0xFFFF)


def int3(v: int) -> bytes:
    return struct.pack("<I", v & 0xFFFFFF)[:3]


def int4(v: int) -> bytes:
    return struct.pack("<I", v & 0xFFFFFFFF)


def int6(v: int) -> bytes:
    return struct.pack("<Q", v & 0xFFFFFFFFFFFF)[:6]


def int8(v: int) -> bytes:
    return struct.pack("<Q", v & 0xFFFFFFFFFFFFFFFF)


def lenenc_int(v: int) -> bytes:
    """Length-encoded integer (lenenc) per the MySQL wire format
    (decoder counterpart: /root/reference/reader.go:242-262)."""
    if v < 0xFB:
        return int1(v)
    if v < 1 << 16:
        return b"\xfc" + int2(v)
    if v < 1 << 24:
        return b"\xfd" + int3(v)
    return b"\xfe" + int8(v)


def be_bytes(v: int, n: int) -> bytes:
    return v.to_bytes(n, "big")


def null_bitmap(nulls: Sequence[bool]) -> bytes:
    """LSB-first bitmap, bit i of byte i//8 (/root/reference/rbr.go:393-400)."""
    size = (len(nulls) + 7) // 8
    out = bytearray(size)
    for i, is_null in enumerate(nulls):
        if is_null:
            out[i // 8] |= 1 << (i % 8)
    return bytes(out)


# ---------------------------------------------------------------------------
# scalar column-value encoders (inverse of /root/reference/types.go:118-304)
# ---------------------------------------------------------------------------

_DIGITS_PER_INT = 9
_COMPRESSED_BYTES = [0, 1, 1, 2, 2, 3, 3, 4, 4, 4]


def decimal_size(precision: int, scale: int) -> int:
    integral = precision - scale
    ui, uf = integral // _DIGITS_PER_INT, scale // _DIGITS_PER_INT
    ci, cf = integral - ui * _DIGITS_PER_INT, scale - uf * _DIGITS_PER_INT
    return ui * 4 + _COMPRESSED_BYTES[ci] + uf * 4 + _COMPRESSED_BYTES[cf]


def encode_decimal(text: str, precision: int, scale: int) -> bytes:
    """Encode a decimal literal into MySQL packed-decimal binary
    (inverse of /root/reference/types.go:395-463)."""
    neg = text.startswith("-")
    if neg:
        text = text[1:]
    if "." in text:
        ip, fp = text.split(".", 1)
    else:
        ip, fp = text, ""
    ip = ip.lstrip("0") or "0"
    fp = fp.ljust(scale, "0")[:scale]
    integral = precision - scale
    ip = ip.rjust(integral, "0")

    ui, uf = integral // _DIGITS_PER_INT, scale // _DIGITS_PER_INT
    ci, cf = integral - ui * _DIGITS_PER_INT, scale - uf * _DIGITS_PER_INT

    out = bytearray()
    pos = 0
    if ci:
        out += be_bytes(int(ip[:ci] or "0"), _COMPRESSED_BYTES[ci])
        pos = ci
    for _ in range(ui):
        out += be_bytes(int(ip[pos:pos + 9]), 4)
        pos += 9
    pos = 0
    for _ in range(uf):
        out += be_bytes(int(fp[pos:pos + 9]), 4)
        pos += 9
    if cf:
        out += be_bytes(int(fp[pos:pos + cf] or "0"), _COMPRESSED_BYTES[cf])

    if neg:
        out = bytearray(b ^ 0xFF for b in out)
    out[0] ^= 0x80  # sign bit: set = non-negative
    return bytes(out)


def _frac_bytes(micros: int, meta: int) -> bytes:
    n = (meta + 1) // 2
    if n == 0:
        return b""
    v = micros // (100 ** (3 - n))
    return be_bytes(v, n)


def encode_datetime2(ts: _dt.datetime, meta: int) -> bytes:
    """5-byte big-endian bitfield + fractional
    (inverse of /root/reference/types.go:211-228)."""
    ym = ts.year * 13 + ts.month
    v = (ym << 22) | (ts.day << 17) | (ts.hour << 12) | (ts.minute << 6) | ts.second
    v |= 1 << 39  # sign bit (always set for valid datetimes)
    return be_bytes(v, 5) + _frac_bytes(ts.microsecond, meta)


def encode_timestamp2(epoch_sec: int, micros: int, meta: int) -> bytes:
    return be_bytes(epoch_sec, 4) + _frac_bytes(micros, meta)


def encode_time2(total_micros: int, meta: int) -> bytes:
    """3-byte big-endian bitfield + fractional, sign-inverted for negatives
    (inverse of /root/reference/types.go:241-295)."""
    neg = total_micros < 0
    a = abs(total_micros)
    secs, frac = divmod(a, 1_000_000)
    h, rem = divmod(secs, 3600)
    m, s = divmod(rem, 60)
    v = (1 << 23) | (h << 12) | (m << 6) | s  # sign bit 1 = non-negative
    n = (meta + 1) // 2
    fv = frac // (100 ** (3 - n)) if n else 0
    if neg:
        # two's-complement over the whole (3+n)-byte big-endian quantity —
        # this is what MySQL stores and what the per-field inversion in the
        # reference (/root/reference/types.go:266-281) decodes back.
        total_bits = (3 + n) * 8
        whole = (v << (n * 8)) | fv
        whole = ((~whole) + 1) & ((1 << total_bits) - 1)
        buf = be_bytes(whole, 3 + n)
        return buf
    return be_bytes(v, 3) + (be_bytes(fv, n) if n else b"")


def encode_date(d: _dt.date) -> bytes:
    v = d.year * 16 * 32 + d.month * 32 + d.day
    return int3(v)


def encode_value(col: "ColumnDef", v: Any) -> bytes:
    """Encode one non-null column value per its MySQL type."""
    t = col.type
    if t == C.TYPE_TINY:
        return struct.pack("<B" if col.unsigned else "<b", v)
    if t == C.TYPE_SHORT:
        return struct.pack("<H" if col.unsigned else "<h", v)
    if t == C.TYPE_INT24:
        return int3(v if v >= 0 else v + (1 << 24))
    if t == C.TYPE_LONG:
        return struct.pack("<I" if col.unsigned else "<i", v)
    if t == C.TYPE_LONGLONG:
        return struct.pack("<Q" if col.unsigned else "<q", v)
    if t == C.TYPE_FLOAT:
        return struct.pack("<f", v)
    if t == C.TYPE_DOUBLE:
        return struct.pack("<d", v)
    if t == C.TYPE_NEWDECIMAL:
        precision, scale = col.meta & 0xFF, col.meta >> 8
        return encode_decimal(str(v), precision, scale)
    if t in (C.TYPE_VARCHAR, C.TYPE_STRING):
        data = v.encode("utf-8") if isinstance(v, str) else bytes(v)
        if col.meta < 256:
            return int1(len(data)) + data
        return int2(len(data)) + data
    if t == C.TYPE_ENUM:
        width = 1 if col.meta == 1 else 2
        return int1(v) if width == 1 else int2(v)
    if t == C.TYPE_SET:
        n = col.meta  # bytes
        return (v & ((1 << (8 * n)) - 1)).to_bytes(n, "little")
    if t == C.TYPE_BIT:
        nbits = ((col.meta >> 8) * 8) + (col.meta & 0xFF)
        return be_bytes(v, (nbits + 7) // 8)
    if t in (C.TYPE_BLOB, C.TYPE_GEOMETRY, C.TYPE_JSON):
        data = v.encode("utf-8") if isinstance(v, str) else bytes(v)
        return len(data).to_bytes(col.meta, "little") + data
    if t == C.TYPE_DATE:
        return encode_date(v)
    if t == C.TYPE_DATETIME2:
        return encode_datetime2(v, col.meta)
    if t == C.TYPE_TIMESTAMP2:
        sec, micros = v
        return encode_timestamp2(sec, micros, col.meta)
    if t == C.TYPE_TIME2:
        return encode_time2(v, col.meta)
    if t == C.TYPE_YEAR:
        return int1(0 if v == 0 else v - 1900)
    raise NotImplementedError(f"encode of mysql type 0x{t:02x}")


# ---------------------------------------------------------------------------
# column / table definitions
# ---------------------------------------------------------------------------


class ColumnDef:
    """Generator-side column descriptor (decoder counterpart:
    /root/reference/rbr.go:10-22)."""

    __slots__ = ("name", "type", "meta", "nullable", "unsigned", "charset", "values")

    def __init__(self, name: str, type: int, meta: int = 0, nullable: bool = True,
                 unsigned: bool = False, charset: int = 0,
                 values: Sequence[str] = ()) -> None:
        self.name = name
        self.type = type
        self.meta = meta
        self.nullable = nullable
        self.unsigned = unsigned
        self.charset = charset or (
            C.CHARSET_UTF8MB4 if type in C.STRING_TYPES else 0)
        self.values = list(values)


def varchar(name: str, max_chars: int = 255, nullable: bool = True) -> ColumnDef:
    # meta = max byte length; >=256 selects the 2-byte length prefix
    # (/root/reference/types.go:162-169)
    return ColumnDef(name, C.TYPE_VARCHAR, meta=max_chars * 4, nullable=nullable)


REPO_FILES_COLUMNS = [
    varchar("repo", 255, nullable=False),
    varchar("path", 1024, nullable=False),
    varchar("commit", 64, nullable=False),
    varchar("lang", 32, nullable=True),
    varchar("content", 65535, nullable=True),
]


# ---------------------------------------------------------------------------
# event writers
# ---------------------------------------------------------------------------

# post-header length table for binlog v4 (index = event_type - 1),
# values as emitted by MySQL 8.0 — the FDE's own entry is filled in
# by fde_body() once the table length is known.
_POST_HEADER_LEN = {
    C.START_EVENT_V3: 56,
    C.QUERY_EVENT: 13,
    C.STOP_EVENT: 0,
    C.ROTATE_EVENT: 8,
    C.INTVAR_EVENT: 0,
    C.LOAD_EVENT: 18,
    C.SLAVE_EVENT: 0,
    C.CREATE_FILE_EVENT: 4,
    C.APPEND_BLOCK_EVENT: 4,
    C.EXEC_LOAD_EVENT: 4,
    C.DELETE_FILE_EVENT: 4,
    C.NEW_LOAD_EVENT: 18,
    C.RAND_EVENT: 0,
    C.USER_VAR_EVENT: 0,
    C.XID_EVENT: 0,
    C.BEGIN_LOAD_QUERY_EVENT: 4,
    C.EXECUTE_LOAD_QUERY_EVENT: 26,
    C.TABLE_MAP_EVENT: 8,
    C.WRITE_ROWS_EVENTv0: 0,
    C.UPDATE_ROWS_EVENTv0: 0,
    C.DELETE_ROWS_EVENTv0: 0,
    C.WRITE_ROWS_EVENTv1: 8,
    C.UPDATE_ROWS_EVENTv1: 8,
    C.DELETE_ROWS_EVENTv1: 8,
    C.INCIDENT_EVENT: 2,
    C.HEARTBEAT_EVENT: 0,
    C.IGNORABLE_EVENT: 0,
    C.ROWS_QUERY_EVENT: 0,
    C.WRITE_ROWS_EVENTv2: 10,
    C.UPDATE_ROWS_EVENTv2: 10,
    C.DELETE_ROWS_EVENTv2: 10,
    C.GTID_EVENT: 42,
    C.ANONYMOUS_GTID_EVENT: 42,
    C.PREVIOUS_GTIDS_EVENT: 0,
}


def fde_body(server_version: str = "8.0.27-binlog-spark",
             checksum: bool = True) -> bytes:
    """FORMAT_DESCRIPTION body (layout: /root/reference/events.go:162-179).

    Tail = post-header-length table + checksum-algorithm byte; the decoder
    infers the checksum length from the FDE's own table entry
    (/root/reference/events.go:173-175).
    """
    table = bytearray(C.N_EVENT_TYPES)
    for typ, length in _POST_HEADER_LEN.items():
        table[typ - 1] = length
    # the FDE's own post-header length: 2+50+4+1 + len(table)
    table[C.FORMAT_DESCRIPTION_EVENT - 1] = 57 + len(table)
    sv = server_version.encode()[:50].ljust(50, b"\x00")
    alg = C.CHECKSUM_CRC32 if checksum else 0
    return int2(4) + sv + int4(0) + int1(C.HEADER_SIZE) + bytes(table) + int1(alg)


def gtid_body(sid: bytes, gno: int, flags: int = 1) -> bytes:
    """GTID body: flags u8 + 16-byte uuid + 8-byte LE gno (public format;
    the reference recognizes but skips the body, /root/reference/binlog.go:65-66)."""
    assert len(sid) == 16
    return int1(flags) + sid + int8(gno)


def query_body(schema: str, sql: str, slave_proxy_id: int = 1) -> bytes:
    """QUERY body (layout: /root/reference/events.go:220-237)."""
    sdata = schema.encode()
    return (int4(slave_proxy_id) + int4(0) + int1(len(sdata)) + int2(0)
            + int2(0) + sdata + b"\x00" + sql.encode())


def xid_body(xid: int) -> bytes:
    return int8(xid)


def intvar_body(kind: int, value: int) -> bytes:
    """INTVAR body: type(1) + value(8)
    (layout: /root/reference/events.go:284-298)."""
    return int1(kind) + int8(value)


def rand_body(seed1: int, seed2: int) -> bytes:
    """RAND body: two 8-byte seeds
    (layout: /root/reference/events.go:263-272)."""
    return int8(seed1) + int8(seed2)


#: USER_VAR value types (MySQL Item_result)
UV_STRING, UV_REAL, UV_INT, UV_DECIMAL = 0, 1, 2, 4


def user_var_body(name: str, value, charset: int = 45, *,
                  unsigned: bool = False) -> bytes:
    """USER_VAR body: name_len(4) + name + is_null(1) [+ type(1) +
    charset(4) + val_len(4) + value [+ flags(1)]]
    (layout: /root/reference/events.go:306-338).

    The value type is dispatched from the Python type: str → STRING,
    int → INT (``unsigned`` sets the trailing flags byte and the 64-bit
    encoding), float → REAL (LE double), ("decimal", text, precision,
    scale) → DECIMAL (precision(1) + scale(1) + packed decimal)."""
    ndata = name.encode()
    out = int4(len(ndata)) + ndata
    if value is None:
        return out + int1(1)
    if isinstance(value, str):
        vtype, vdata = UV_STRING, value.encode()
    elif isinstance(value, bool):
        raise NotImplementedError("bool user vars")
    elif isinstance(value, int):
        vtype = UV_INT
        vdata = value.to_bytes(8, "little", signed=not unsigned)
    elif isinstance(value, float):
        vtype, vdata = UV_REAL, struct.pack("<d", value)
    elif isinstance(value, tuple) and value[0] == "decimal":
        _, text, precision, scale = value
        vtype = UV_DECIMAL
        vdata = (int1(precision) + int1(scale)
                 + encode_decimal(text, precision, scale))
    else:
        raise NotImplementedError(f"user var type {type(value)}")
    return (out + int1(0) + int1(vtype) + int4(charset)
            + int4(len(vdata)) + vdata + int1(1 if unsigned else 0))


def incident_body(number: int, message: str) -> bytes:
    """INCIDENT body: incident number(2) + msg_len(1) + message
    (layout: /root/reference/events.go:245-255)."""
    mdata = message.encode()
    return int2(number) + int1(len(mdata)) + mdata


def rows_query_body(query: str) -> bytes:
    """ROWS_QUERY body: len(1) + query text (the length byte is vestigial
    — readers take the rest of the event;
    layout: /root/reference/rbr.go:373-386)."""
    qdata = query.encode()
    return int1(min(len(qdata), 255)) + qdata


def rotate_body(next_file: str, position: int = 4) -> bytes:
    """ROTATE body (layout: /root/reference/events.go:199-205)."""
    return int8(position) + next_file.encode()


def table_map_body(table_id: int, schema: str, table: str,
                   columns: Sequence[ColumnDef], full_metadata: bool = True,
                   pk: Sequence[int] = ()) -> bytes:
    """TABLE_MAP body with FULL row metadata
    (layout: /root/reference/rbr.go:45-153)."""
    out = bytearray()
    out += int6(table_id)
    out += int2(1)  # flags
    s, t = schema.encode(), table.encode()
    out += int1(len(s)) + s + b"\x00"
    out += int1(len(t)) + t + b"\x00"
    out += lenenc_int(len(columns))
    for c in columns:
        out += int1(c.type)

    meta = bytearray()
    for c in columns:
        if c.type in C.META_1BYTE_TYPES:
            meta += int1(c.meta)
        elif c.type in C.META_2BYTE_TYPES:
            meta += int2(c.meta)
        elif c.type == C.TYPE_STRING:
            meta += be_bytes(c.meta, 2)
    out += lenenc_int(len(meta)) + meta

    out += null_bitmap([c.nullable for c in columns])

    if full_metadata:
        # TLV 1: unsigned bitmap over numeric columns (MSB-first,
        # /root/reference/rbr.go:106-114)
        nums = [c for c in columns if c.type in C.NUMERIC_TYPES]
        if nums:
            bits = bytearray((len(nums) + 7) // 8)
            for i, c in enumerate(nums):
                if c.unsigned:
                    bits[i // 8] |= 1 << (7 - i % 8)
            out += int1(1) + lenenc_int(len(bits)) + bits
        # TLV 2: default charset of string columns
        strs = [c for c in columns if c.type in C.STRING_TYPES]
        if strs:
            payload = lenenc_int(C.CHARSET_UTF8MB4)
            out += int1(2) + lenenc_int(len(payload)) + payload
        # TLV 4: column names
        payload = bytearray()
        for c in columns:
            n = c.name.encode()
            payload += lenenc_int(len(n)) + n
        out += int1(4) + lenenc_int(len(payload)) + payload
        # TLV 5/6: SET / ENUM value lists
        for tlv, typ in ((5, C.TYPE_SET), (6, C.TYPE_ENUM)):
            cols = [c for c in columns if c.type == typ]
            if cols:
                payload = bytearray()
                for c in cols:
                    payload += lenenc_int(len(c.values))
                    for v in c.values:
                        vb = v.encode()
                        payload += lenenc_int(len(vb)) + vb
                out += int1(tlv) + lenenc_int(len(payload)) + payload
        # TLV 8: SIMPLE_PRIMARY_KEY — lenenc column ordinals
        if pk:
            payload = bytearray()
            for i in pk:
                payload += lenenc_int(i)
            out += int1(8) + lenenc_int(len(payload)) + payload
    return bytes(out)


def rows_body(event_type: int, table_id: int, columns: Sequence[ColumnDef],
              rows: Iterable[Sequence[Any]],
              before_rows: Iterable[Sequence[Any]] | None = None,
              present: Sequence[bool] | None = None,
              before_present: Sequence[bool] | None = None) -> bytes:
    """WRITE/UPDATE/DELETE_ROWS v1/v2 body
    (layout: /root/reference/rbr.go:246-350).

    For UPDATE events ``rows`` are the after-images and ``before_rows`` the
    before-images; on the wire each row is (before, after) back-to-back and
    the decoder swaps them on return (/root/reference/rbr.go:344-349).

    ``present`` / ``before_present``: columns-present bitmaps for partial
    images (binlog_row_image=MINIMAL emits PK-only before-images and
    PK+changed after-images; /root/reference/rbr.go:283-303 reads them).
    Row value lists then align to the PRESENT columns only.  Defaults to
    FULL images.
    """
    ncol = len(columns)
    after_present = list(present) if present is not None else [True] * ncol
    is_update = event_type in C.UPDATE_ROWS_EVENTS
    # wire order: image0 = before for updates, so present0 = before's
    bp = (list(before_present) if before_present is not None
          else ([True] * ncol if is_update else None))
    out = bytearray()
    out += int6(table_id)
    out += int2(0)  # flags
    if event_type in C.ROWS_EVENTS_V2:
        out += int2(2)  # extra-data length (2 = empty)
    out += lenenc_int(ncol)
    if is_update:
        out += null_bitmap(bp)
        out += null_bitmap(after_present)
    else:
        out += null_bitmap(after_present)

    def emit_row(row: Sequence[Any], pres: Sequence[bool]) -> None:
        pcols = [c for c, p in zip(columns, pres) if p]
        assert len(row) == len(pcols), "row must align to present columns"
        out.extend(null_bitmap([v is None for v in row]))
        for col, v in zip(pcols, row):
            if v is not None:
                out.extend(encode_value(col, v))

    if is_update:
        assert before_rows is not None
        for b, a in zip(before_rows, rows):
            emit_row(b, bp)
            emit_row(a, after_present)
    else:
        for row in rows:
            emit_row(row, after_present)
    return bytes(out)


def frame_event(event_type: int, body: bytes, *, timestamp: int, server_id: int,
                next_pos: int, flags: int = 0, with_checksum: bool = True) -> bytes:
    """Wrap a body in the 19-byte v4 header + CRC32 trailer.

    ``next_pos`` is the file position *after* this event
    (/root/reference/events.go:138-148; CRC covers header+body,
    /root/reference/local.go:186-198).
    """
    size = C.HEADER_SIZE + len(body) + (C.CHECKSUM_LEN if with_checksum else 0)
    header = (int4(timestamp) + int1(event_type) + int4(server_id)
              + int4(size) + int4(next_pos) + int2(flags))
    ev = header + body
    if with_checksum:
        ev += int4(zlib.crc32(ev))
    return ev
