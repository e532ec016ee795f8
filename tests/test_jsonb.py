"""MySQL binary-JSON (JSONB) decoder unit tests.

Buffers handcrafted per the public JSONB storage format (the reference's
decode semantics live at /root/reference/json.go:13-300): type marker +
payload, small objects/arrays with 16-bit counts/offsets and inlined
small scalars, 7-bit continuation string lengths.
"""

from __future__ import annotations

import struct
import sys

sys.path.insert(0, "/root/repo")

from binlog_spark.mysql.jsonb import decode_jsonb


def test_scalars():
    assert decode_jsonb(bytes([0x05]) + struct.pack("<h", -12345)) == -12345
    assert decode_jsonb(bytes([0x06]) + struct.pack("<H", 65535)) == 65535
    assert decode_jsonb(bytes([0x07]) + struct.pack("<i", -(2 ** 31))) == -(2 ** 31)
    assert decode_jsonb(bytes([0x09]) + struct.pack("<q", 2 ** 62)) == 2 ** 62
    assert decode_jsonb(bytes([0x0B]) + struct.pack("<d", 1.5)) == 1.5


def test_literals():
    assert decode_jsonb(bytes([0x04, 0x00])) is None
    assert decode_jsonb(bytes([0x04, 0x01])) is True
    assert decode_jsonb(bytes([0x04, 0x02])) is False


def test_string_short_and_long():
    assert decode_jsonb(bytes([0x0C, 2]) + b"hi") == "hi"
    # long string: 200 bytes -> 2-byte continuation length (0xC8 0x01)
    s = b"x" * 200
    assert decode_jsonb(bytes([0x0C, 0xC8, 0x01]) + s) == "x" * 200


def test_small_object():
    # {"a": 5}
    data = (struct.pack("<HH", 1, 12)          # count, size
            + struct.pack("<HH", 11, 1)        # key offset, key length
            + bytes([0x05]) + struct.pack("<h", 5)  # inlined int16 value
            + b"a")
    assert decode_jsonb(bytes([0x00]) + data) == {"a": 5}


def test_small_array():
    # [7, true]
    data = (struct.pack("<HH", 2, 10)
            + bytes([0x05]) + struct.pack("<h", 7)
            + bytes([0x04, 0x01, 0x00]))
    assert decode_jsonb(bytes([0x02]) + data) == [7, True]


def test_array_with_out_of_line_string():
    # ["hello"] — strings are not inlined: the value entry holds the type
    # byte + an offset; at the offset lies the data WITHOUT a type marker
    payload = bytes([5]) + b"hello"    # varlen + utf8
    data = (struct.pack("<HH", 1, 7 + len(payload))
            + bytes([0x0C]) + struct.pack("<H", 7)   # type, offset
            + payload)
    assert decode_jsonb(bytes([0x02]) + data) == ["hello"]


def test_empty():
    assert decode_jsonb(b"") is None


# ---------------------------------------------------------------------------
# encoder round-trip (round 3): generator-side encode_jsonb vs the decoder
# ---------------------------------------------------------------------------

def test_encode_roundtrip_basics():
    from binlog_spark.mysql.jsonb import decode_jsonb, encode_jsonb
    cases = [
        None, True, False, 0, -1, 32767, -32768, 40000, 1 << 40,
        -(1 << 40), (1 << 63) + 5, 3.5, -0.25, "", "héllo 🚀",
        [], {}, [1, "two", None, True, [3, {"k": 4}]],
        {"a": 1, "b": {"c": [1.5, "x"], "d": None}, "long" * 20: False},
    ]
    for v in cases:
        assert decode_jsonb(encode_jsonb(v)) == v, v


def test_encode_roundtrip_property():
    import hypothesis.strategies as st
    from hypothesis import given, settings

    from binlog_spark.mysql.jsonb import decode_jsonb, encode_jsonb

    scalars = st.one_of(
        st.none(), st.booleans(),
        st.integers(min_value=-(1 << 63), max_value=(1 << 64) - 1),
        st.floats(allow_nan=False, allow_infinity=False),
        st.text(max_size=40))
    values = st.recursive(
        scalars,
        lambda s: st.one_of(
            st.lists(s, max_size=6),
            st.dictionaries(st.text(max_size=12), s, max_size=6)),
        max_leaves=25)

    @settings(max_examples=200, deadline=None)
    @given(values)
    def check(v):
        assert decode_jsonb(encode_jsonb(v)) == v

    check()


def test_render_json_matches_dumps_property():
    """The direct JSONB→text renderer (columnar hot path) must be
    byte-identical to json.dumps over the decoded tree."""
    import json

    import hypothesis.strategies as st
    from hypothesis import given, settings

    from binlog_spark.mysql.jsonb import (decode_jsonb, encode_jsonb,
                                          render_json)

    scalars = st.one_of(
        st.none(), st.booleans(),
        st.integers(min_value=-(1 << 63), max_value=(1 << 64) - 1),
        st.floats(allow_nan=False, allow_infinity=False),
        st.text(max_size=40))
    values = st.recursive(
        scalars,
        lambda s: st.one_of(
            st.lists(s, max_size=6),
            st.dictionaries(st.text(max_size=12), s, max_size=6)),
        max_leaves=25)

    @settings(max_examples=200, deadline=None)
    @given(values)
    def check(v):
        buf = encode_jsonb(v)
        want = json.dumps(decode_jsonb(buf), separators=(",", ":"),
                          sort_keys=False)
        assert render_json(buf) == want

    check()


def test_compiled_multigroup_decimal_matches_decode_decimal():
    """The inlined multi-group DECIMAL codegen must be byte-exact with
    mysql.decode.decode_decimal across precisions/scales/signs."""
    import hypothesis.strategies as st
    from hypothesis import given, settings

    from binlog_spark import constants as C
    from binlog_spark.decoder.columnar import compile_event_reader
    from binlog_spark.mysql import encode as E
    from binlog_spark.mysql.decode import (Cur, decode_decimal,
                                           parse_table_map)

    @settings(max_examples=300, deadline=None)
    @given(st.integers(10, 38), st.data())
    def check(precision, data):
        scale = data.draw(st.integers(0, min(precision, 30)))
        digits = data.draw(st.text("0123456789", min_size=1,
                                   max_size=precision - scale or 1))
        frac = data.draw(st.text("0123456789", min_size=scale,
                                 max_size=scale)) if scale else ""
        neg = data.draw(st.booleans())
        lit = (("-" if neg else "") + (digits.lstrip("0") or "0")
               + (("." + frac) if frac else ""))
        coldef = E.ColumnDef("d", C.TYPE_NEWDECIMAL,
                             meta=(scale << 8) | precision)
        cell = E.encode_value(coldef, lit)
        want = decode_decimal(cell, precision, scale)
        # run the compiled whole-event reader over a 1-column write row
        tme_body = E.table_map_body(7, "s", "t", [coldef], pk=())
        tme = parse_table_map(Cur(memoryview(tme_body)))
        rd = compile_event_reader(tme, b"\x01", None, "vals")
        body = bytes([0x00]) + cell  # null bitmap (1 col, not null) + cell
        _pos, _before, after = rd(memoryview(body), 0, len(body))
        assert after[0][0] == want, (precision, scale, lit)

    check()
