"""Property-based encode↔decode round trips (hypothesis).

The generator (mysql/encode.py) and decoder (mysql/decode.py) are
independent implementations of the public binlog value formats; any
value either side mis-handles shows up as a round-trip mismatch.
Complements test_types_matrix.py's curated constants with generated
coverage of the packed-decimal digit grouping, temporal bitfields
(including the negative-TIME two's complement + "+1s" quirk) and
length-prefixed strings.
"""

from __future__ import annotations

import datetime as dt
import sys

from hypothesis import assume, given, settings
from hypothesis import strategies as st

sys.path.insert(0, "/root/repo")

from binlog_spark import constants as C
from binlog_spark.mysql import encode as E
from binlog_spark.mysql.decode import Col, Cur, decode_value

_S = settings(max_examples=300, deadline=None)


def _col(type_, meta=0, unsigned=False):
    return Col(0, type_, meta=meta, unsigned=unsigned)


@st.composite
def decimals(draw):
    precision = draw(st.integers(1, 30))
    scale = draw(st.integers(0, min(precision, 20)))
    mantissa = draw(st.integers(-(10 ** precision) + 1, 10 ** precision - 1))
    return precision, scale, mantissa


@given(decimals())
@_S
def test_decimal_roundtrip(ps):
    precision, scale, mantissa = ps
    digits = str(abs(mantissa)).rjust(precision, "0")
    ip, fp = digits[:precision - scale] or "0", digits[precision - scale:]
    text = ("-" if mantissa < 0 else "") + (ip.lstrip("0") or "0") \
        + (f".{fp}" if scale else "")
    cd = E.ColumnDef("d", C.TYPE_NEWDECIMAL, meta=precision | (scale << 8))
    buf = E.encode_value(cd, text)
    got = decode_value(_col(C.TYPE_NEWDECIMAL, precision | (scale << 8)),
                       Cur(memoryview(buf)))
    want = text
    if want == "-0" or want.startswith("-0.") and float(want) == 0:
        # packed decimal has no negative zero
        want = want[1:]
    assert got == want


_INT_TYPES = [(C.TYPE_TINY, 8), (C.TYPE_SHORT, 16), (C.TYPE_INT24, 24),
              (C.TYPE_LONG, 32), (C.TYPE_LONGLONG, 64)]


@given(st.sampled_from(_INT_TYPES), st.booleans(), st.data())
@_S
def test_int_roundtrip(tw, unsigned, data):
    t, bits = tw
    if unsigned:
        v = data.draw(st.integers(0, (1 << bits) - 1))
    else:
        v = data.draw(st.integers(-(1 << (bits - 1)), (1 << (bits - 1)) - 1))
    cd = E.ColumnDef("i", t, unsigned=unsigned)
    buf = E.encode_value(cd, v)
    got = decode_value(_col(t, unsigned=unsigned), Cur(memoryview(buf)))
    assert got == v


@given(st.integers(-800 * 3600 * 10 ** 6, 800 * 3600 * 10 ** 6),
       st.sampled_from([0, 3, 6]))
@_S
def test_time2_roundtrip(micros, meta):
    # truncate to the column's fractional precision like MySQL does
    step = 10 ** (6 - meta) if meta else 10 ** 6
    a = abs(micros) // step * step
    stored = -a if micros < 0 else a
    # The reference decodes negative TIME by per-field inversion plus a
    # "+1s" quirk (/root/reference/types.go:266-281) that compensates
    # exactly ONE borrow of MySQL's two's-complement storage.  Negative
    # whole-MINUTE values (sec==0, frac==0) borrow across the seconds
    # field and the reference's own decode is lossy there ("weird
    # duration behavior", its comment) — parity model inherits that, so
    # the property holds on the faithful domain.
    assume(not (stored < 0 and a % 60_000_000 == 0))
    cd = E.ColumnDef("t", C.TYPE_TIME2, meta=meta)
    buf = E.encode_value(cd, stored)
    got = decode_value(_col(C.TYPE_TIME2, meta), Cur(memoryview(buf)))
    assert got == stored


@given(st.datetimes(min_value=dt.datetime(1000, 1, 1),
                    max_value=dt.datetime(9999, 12, 31, 23, 59, 59)),
       st.sampled_from([0, 3, 6]))
@_S
def test_datetime2_roundtrip(ts, meta):
    step = 10 ** (6 - meta) if meta else 10 ** 6
    ts = ts.replace(microsecond=ts.microsecond // step * step)
    cd = E.ColumnDef("dt", C.TYPE_DATETIME2, meta=meta)
    buf = E.encode_value(cd, ts)
    got = decode_value(_col(C.TYPE_DATETIME2, meta), Cur(memoryview(buf)))
    assert got == ts


@given(st.text(max_size=300), st.sampled_from([255, 1024]))
@_S
def test_varchar_roundtrip(s, max_chars):
    meta = max_chars * 4  # utf8mb4 bytes-per-char
    cd = E.ColumnDef("v", C.TYPE_VARCHAR, meta=meta)
    buf = E.encode_value(cd, s)
    got = decode_value(_col(C.TYPE_VARCHAR, meta), Cur(memoryview(buf)))
    assert got == s
