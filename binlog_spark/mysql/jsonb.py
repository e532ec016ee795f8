"""MySQL binary JSON (JSONB) decoder.

Decodes the storage format MySQL uses for JSON columns in the binlog
(public format; decode semantics mirror /root/reference/json.go:13-300,
reimplemented from scratch in Python).  Returns plain Python values
(dict / list / str / int / float / bool / None); opaque custom types
(decimal, date, time, datetime) are rendered like the reference renders
them (decimal → exact string, temporals → formatted strings).
"""

from __future__ import annotations

import datetime as _dt
import struct

from .decode import BinlogError, decode_decimal, decimal_size

# type markers (json.go:15-30 equivalents, per the public format)
_SMALL_OBJECT = 0x00
_LARGE_OBJECT = 0x01
_SMALL_ARRAY = 0x02
_LARGE_ARRAY = 0x03
_LITERAL = 0x04
_INT16 = 0x05
_UINT16 = 0x06
_INT32 = 0x07
_UINT32 = 0x08
_INT64 = 0x09
_UINT64 = 0x0A
_DOUBLE = 0x0B
_STRING = 0x0C
_CUSTOM = 0x0F

_LIT_NULL = 0x00
_LIT_TRUE = 0x01
_LIT_FALSE = 0x02

# MySQL type codes for opaque values
_T_NEWDECIMAL = 0xF6
_T_DATE = 0x0A
_T_TIME = 0x0B
_T_DATETIME = 0x0C
_T_TIMESTAMP = 0x07


def decode_jsonb(buf: bytes) -> object:
    if len(buf) == 0:
        return None
    return _value(buf[0], buf[1:])


def _value(typ: int, data: bytes) -> object:
    if typ in (_SMALL_OBJECT, _LARGE_OBJECT):
        return _composite(data, large=typ == _LARGE_OBJECT, is_object=True)
    if typ in (_SMALL_ARRAY, _LARGE_ARRAY):
        return _composite(data, large=typ == _LARGE_ARRAY, is_object=False)
    if typ == _LITERAL:
        return _literal(data[0])
    if typ == _INT16:
        return struct.unpack_from("<h", data)[0]
    if typ == _UINT16:
        return struct.unpack_from("<H", data)[0]
    if typ == _INT32:
        return struct.unpack_from("<i", data)[0]
    if typ == _UINT32:
        return struct.unpack_from("<I", data)[0]
    if typ == _INT64:
        return struct.unpack_from("<q", data)[0]
    if typ == _UINT64:
        return struct.unpack_from("<Q", data)[0]
    if typ == _DOUBLE:
        return struct.unpack_from("<d", data)[0]
    if typ == _STRING:
        n, off = _varlen(data)
        return data[off:off + n].decode("utf-8", "replace")
    if typ == _CUSTOM:
        return _custom(data)
    raise BinlogError(f"jsonb: invalid type marker 0x{typ:02x}")


def _literal(b: int) -> object:
    if b == _LIT_NULL:
        return None
    if b == _LIT_TRUE:
        return True
    if b == _LIT_FALSE:
        return False
    raise BinlogError(f"jsonb: invalid literal 0x{b:02x}")


def _varlen(data: bytes) -> tuple[int, int]:
    """7-bit continuation length (json.go:205-231 semantics)."""
    length = 0
    for i in range(5):
        b = data[i]
        length |= (b & 0x7F) << (7 * i)
        if b & 0x80 == 0:
            return length, i + 1
    raise BinlogError("jsonb: invalid data length")


def _composite(data: bytes, *, large: bool, is_object: bool) -> object:
    w = 4 if large else 2
    fmt = "<I" if large else "<H"

    def u(off: int) -> int:
        return struct.unpack_from(fmt, data, off)[0]

    count = u(0)
    # size = u(w)  # total bytes, unused
    off = 2 * w
    keys: list[str] = []
    if is_object:
        for i in range(count):
            koff = u(off + i * (w + 2))
            klen = struct.unpack_from("<H", data, off + i * (w + 2) + w)[0]
            keys.append(data[koff:koff + klen].decode("utf-8", "replace"))
        off += count * (w + 2)

    values: list[object] = []
    for i in range(count):
        vtyp = data[off + i * (w + 1)]
        ventry = off + i * (w + 1) + 1
        if vtyp in (_LITERAL, _INT16, _UINT16) or \
                (not large and vtyp in ()) :
            # inlined small scalars
            values.append(_value(vtyp, data[ventry:ventry + w]))
        elif large and vtyp in (_INT32, _UINT32):
            values.append(_value(vtyp, data[ventry:ventry + w]))
        else:
            voff = struct.unpack_from(fmt, data, ventry)[0]
            values.append(_value(vtyp, data[voff:]))
    if is_object:
        return dict(zip(keys, values))
    return values


def _custom(data: bytes) -> object:
    """Opaque values: MySQL re-packs decimal/date/time/datetime
    (json.go:233-300 semantics)."""
    typ = data[0]
    n, off = _varlen(data[1:])
    payload = data[1 + off:1 + off + n]
    if typ == _T_NEWDECIMAL:
        precision, scale = payload[0], payload[1]
        return decode_decimal(payload[2:2 + decimal_size(precision, scale)],
                              precision, scale)
    if typ == _T_DATE:
        v = int.from_bytes(payload[:8], "little")
        raw = v >> 24
        day = raw % 32
        month = (raw >> 5) % 16
        year = raw >> 9
        return f"{year:04d}-{month:02d}-{day:02d}"
    if typ in (_T_DATETIME, _T_TIMESTAMP):
        v = int.from_bytes(payload[:8], "little")
        micros = v % (1 << 24)
        raw = v >> 24
        sec = raw % 64
        minute = (raw >> 6) % 64
        hour = (raw >> 12) % 32
        day = (raw >> 17) % 32
        month = (raw >> 22) % 16
        year = raw >> 26
        s = f"{year:04d}-{month:02d}-{day:02d} {hour:02d}:{minute:02d}:{sec:02d}"
        if micros:
            s += f".{micros:06d}"
        return s
    if typ == _T_TIME:
        v = int.from_bytes(payload[:8], "little", signed=True)
        neg = v < 0
        v = abs(v)
        micros = v % (1 << 24)
        raw = v >> 24
        sec = raw % 64
        minute = (raw >> 6) % 64
        hour = (raw >> 12)
        s = f"{hour:02d}:{minute:02d}:{sec:02d}"
        if micros:
            s += f".{micros:06d}"
        return ("-" if neg else "") + s
    # unknown opaque type: hex string
    return payload.hex()


# ---------------------------------------------------------------------------
# direct JSON-text renderer (the columnar decode hot path)
# ---------------------------------------------------------------------------

import json as _json

_esc = _json.encoder.encode_basestring_ascii  # C-accelerated


def render_json(buf: bytes) -> str:
    """JSONB → compact JSON text, byte-identical to
    ``json.dumps(decode_jsonb(buf), separators=(",", ":"))`` but without
    building the intermediate dict/list tree or re-walking it — one
    recursive pass emitting string fragments (the reference renders
    inline the same way, json.go:33-120)."""
    if len(buf) == 0:
        return "null"
    return _render(buf[0], buf[1:])


def _render_float(v: float) -> str:
    # json.dumps: float.__repr__ for finite, Infinity/NaN otherwise
    if v != v:
        return "NaN"
    if v == float("inf"):
        return "Infinity"
    if v == float("-inf"):
        return "-Infinity"
    return repr(v)


def _render(typ: int, data: bytes) -> str:
    if typ in (_SMALL_OBJECT, _LARGE_OBJECT):
        return _render_composite(data, large=typ == _LARGE_OBJECT,
                                 is_object=True)
    if typ in (_SMALL_ARRAY, _LARGE_ARRAY):
        return _render_composite(data, large=typ == _LARGE_ARRAY,
                                 is_object=False)
    if typ == _LITERAL:
        return ("null", "true", "false")[data[0]] if data[0] <= 2 else \
            _literal(data[0])  # raises on invalid
    if typ == _DOUBLE:
        return _render_float(struct.unpack_from("<d", data)[0])
    if typ == _STRING:
        n, off = _varlen(data)
        return _esc(data[off:off + n].decode("utf-8", "replace"))
    if typ == _CUSTOM:
        return _esc(_custom(data))
    # the remaining markers are the int family
    return str(_value(typ, data))


def _render_composite(data: bytes, *, large: bool, is_object: bool) -> str:
    w = 4 if large else 2
    fmt = "<I" if large else "<H"
    u = struct.unpack_from
    count = u(fmt, data, 0)[0]
    off = 2 * w
    parts: list[str] = []
    if is_object:
        for i in range(count):
            koff = u(fmt, data, off + i * (w + 2))[0]
            klen = u("<H", data, off + i * (w + 2) + w)[0]
            parts.append(
                _esc(data[koff:koff + klen].decode("utf-8", "replace")))
        off += count * (w + 2)
    vals: list[str] = []
    for i in range(count):
        vtyp = data[off + i * (w + 1)]
        ventry = off + i * (w + 1) + 1
        if vtyp in (_LITERAL, _INT16, _UINT16) or \
                (large and vtyp in (_INT32, _UINT32)):
            vals.append(_render(vtyp, data[ventry:ventry + w]))
        else:
            voff = u(fmt, data, ventry)[0]
            vals.append(_render(vtyp, data[voff:]))
    if is_object:
        return "{" + ",".join(f"{k}:{v}" for k, v in zip(parts, vals)) + "}"
    return "[" + ",".join(vals) + "]"


# ---------------------------------------------------------------------------
# encoder (fixture generator side — the server's role in round-trip tests)
# ---------------------------------------------------------------------------


def _enc_varlen(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def encode_jsonb(value) -> bytes:
    """Encode a Python value (dict / list / str / int / float / bool /
    None) into MySQL binary JSON — the inverse of decode_jsonb over the
    JSON-expressible subset (opaque custom types are decode-only).
    Ints pick the narrowest signed/unsigned marker; composites pick the
    small format unless counts/offsets overflow 16 bits."""
    typ, data = _enc_value(value)
    return bytes([typ]) + data


def _enc_value(v) -> tuple[int, bytes]:
    if v is None:
        return _LITERAL, bytes([_LIT_NULL])
    if v is True:
        return _LITERAL, bytes([_LIT_TRUE])
    if v is False:
        return _LITERAL, bytes([_LIT_FALSE])
    if isinstance(v, int):
        if -(1 << 15) <= v < (1 << 15):
            return _INT16, struct.pack("<h", v)
        if (1 << 15) <= v < (1 << 16):
            return _UINT16, struct.pack("<H", v)
        if -(1 << 31) <= v < (1 << 31):
            return _INT32, struct.pack("<i", v)
        if (1 << 31) <= v < (1 << 32):
            return _UINT32, struct.pack("<I", v)
        if -(1 << 63) <= v < (1 << 63):
            return _INT64, struct.pack("<q", v)
        if v < (1 << 64):
            return _UINT64, struct.pack("<Q", v)
        raise BinlogError("jsonb: int out of 64-bit range")
    if isinstance(v, float):
        return _DOUBLE, struct.pack("<d", v)
    if isinstance(v, str):
        b = v.encode("utf-8")
        return _STRING, _enc_varlen(len(b)) + b
    if isinstance(v, dict):
        return _enc_composite(list(v.items()), is_object=True)
    if isinstance(v, (list, tuple)):
        return _enc_composite([(None, x) for x in v], is_object=False)
    raise BinlogError(f"jsonb: cannot encode {type(v).__name__}")


def _enc_composite(items, *, is_object: bool) -> tuple[int, bytes]:
    keys_enc = [k.encode("utf-8") for k, _ in items] if is_object else []
    vals_enc = [_enc_value(x) for _, x in items]
    count = len(items)
    for large in (False, True):
        w = 4 if large else 2
        fmt = "<I" if large else "<H"
        header = 2 * w + (count * (w + 2) if is_object else 0) \
            + count * (w + 1)
        off = header
        koffs = []
        for kb in keys_enc:
            koffs.append(off)
            off += len(kb)
        # inlined small scalars sit in the entry's offset slot (the
        # decoder's rule: LITERAL/INT16/UINT16 always, INT32/UINT32 in
        # the large format)
        inline = {_LITERAL, _INT16, _UINT16}
        if large:
            inline |= {_INT32, _UINT32}
        entries: list[tuple[int, int | None, bytes]] = []
        for typ, data in vals_enc:
            if typ in inline and len(data) <= w:
                entries.append((typ, None, data))
            else:
                entries.append((typ, off, data))
                off += len(data)
        size = off
        if not large and (size > 0xFFFF or count > 0xFFFF
                          or any(len(kb) > 0xFFFF for kb in keys_enc)):
            continue
        buf = bytearray(struct.pack(fmt, count) + struct.pack(fmt, size))
        for kb, ko in zip(keys_enc, koffs):
            buf += struct.pack(fmt, ko) + struct.pack("<H", len(kb))
        for typ, voff, data in entries:
            if voff is None:
                buf += bytes([typ]) + data.ljust(w, b"\x00")
            else:
                buf += bytes([typ]) + struct.pack(fmt, voff)
        for kb in keys_enc:
            buf += kb
        for _typ, voff, data in entries:
            if voff is not None:
                buf += data
        comp = ((_LARGE_OBJECT if large else _SMALL_OBJECT) if is_object
                else (_LARGE_ARRAY if large else _SMALL_ARRAY))
        return comp, bytes(buf)
    raise BinlogError("jsonb: unreachable")
