"""Statement-event decode vs the generator's emission log, including the
typed USER_VAR matrix (STRING / signed + unsigned INT / REAL / DECIMAL /
NULL — /root/reference/events.go:306-338 dispatches on the value type;
round 2 hardcoded STRING)."""

from __future__ import annotations

import struct
import sys

import pytest

sys.path.insert(0, "/root/repo")

from binlog_spark.decoder.statements import decode_span_statements
from binlog_spark.mysql import encode as E
from binlog_spark.mysql import gen


@pytest.fixture(scope="module")
def stmt_dump(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stmtdump"))
    gen.generate(d, gen.GenConfig(n_changes=6000, seed=9,
                                  max_file_bytes=4 << 20),
                 chunk_target=256 * 1024)
    return d


def _decode_all(dump):
    import os
    from binlog_spark.mysql.oracle import list_files
    rows = []
    for name in list_files(dump):
        with open(os.path.join(dump, name), "rb") as f:
            cols = decode_span_statements(f.read(), name, has_magic=True)
        rows.extend(zip(*[cols[k] for k in
                          ("stmt_type", "text", "value", "log_file",
                           "log_pos")]))
    return rows


def test_statements_match_generator_log(stmt_dump):
    import pyarrow.parquet as pq
    import os
    golden = pq.read_table(
        os.path.join(stmt_dump, "golden_statements.parquet")).to_pylist()
    got = {(r[3], r[4]): r for r in _decode_all(stmt_dump)}
    uv_types = set()
    for g in golden:
        key = (g["log_file"], g["log_pos"])
        assert key in got, f"missing statement at {key}"
        r = got[key]
        assert r[0] == g["stmt_type"]
        if g["stmt_type"] == "USER_VAR":
            assert r[1] == g["text"]
            assert r[2] == g["value"], (g["text"], g["value"], r[2])
            v = g["value"]
            if v is None:
                uv_types.add("null")
            elif v.startswith("val-"):
                uv_types.add("string")
            elif "." in v and "e" not in v and len(v.split(".")[1]) == 4:
                uv_types.add("decimal")
            elif "." in v or "e" in v:
                uv_types.add("real")
            elif int(v) >= (1 << 63):
                uv_types.add("uint")
            else:
                uv_types.add("int")
    # the fixture must actually exercise every value type
    assert uv_types >= {"null", "string", "int", "uint", "real", "decimal"}


def test_user_var_bodies_roundtrip():
    """Direct body-level round trip for each value type, including the
    values the random fixture can't pin (extreme doubles, negatives)."""
    cases = [
        ("s", "héllo wörld", "héllo wörld", False),
        ("i", -(1 << 62), str(-(1 << 62)), False),
        ("u", (1 << 64) - 5, str((1 << 64) - 5), True),
        ("r", -2.5e-308, repr(-2.5e-308), False),
        ("r2", struct.unpack("<d", struct.pack("<d", 0.1))[0],
         repr(0.1), False),
        ("d", ("decimal", "-12345678.0042", 12, 4), "-12345678.0042",
         False),
        ("n", None, None, False),
    ]
    frames = b""
    pos = 4
    from binlog_spark import constants as C
    frames += C.MAGIC
    fde = E.fde_body(checksum=True)
    ev = E.frame_event(C.FORMAT_DESCRIPTION_EVENT, fde, timestamp=1,
                       server_id=1,
                       next_pos=pos + C.HEADER_SIZE + len(fde) + 4,
                       with_checksum=True)
    frames += ev
    pos += len(ev)
    for name, val, _, unsigned in cases:
        body = E.user_var_body(name, val, unsigned=unsigned)
        ev = E.frame_event(C.USER_VAR_EVENT, body, timestamp=1, server_id=1,
                           next_pos=pos + C.HEADER_SIZE + len(body) + 4,
                           with_checksum=True)
        frames += ev
        pos += len(ev)
    cols = decode_span_statements(frames, "binlog.000001", has_magic=True)
    assert cols["stmt_type"] == ["USER_VAR"] * len(cases)
    assert cols["text"] == [c[0] for c in cases]
    assert cols["value"] == [c[2] for c in cases]


def test_pre_v4_statement_bodies_decode():
    """v3 (4.0/4.1) dumps: QUERY has no status-vars block (schema starts
    after the 11-byte post-header); USER_VAR/INTVAR layouts are the v4
    ones.  The statements channel must decode a v3-head file end-to-end
    through the legacy frame iterator."""
    from binlog_spark import constants as C

    def ev3(typ, body, ts):
        return struct.pack("<IBIIIH", ts, typ, 1, 19 + len(body), 0, 0) \
            + body

    start = (struct.pack("<H", 3) + b"4.1.22-log".ljust(50, b"\x00")
             + struct.pack("<I", 0))
    sql = b"INSERT INTO t VALUES (1)"
    q_body = (struct.pack("<IIBH", 7, 0, 4, 0) + b"shop\x00" + sql)
    uv = E.user_var_body("v1", 42)
    iv = E.intvar_body(2, 777)
    data = (C.MAGIC + ev3(C.START_EVENT_V3, start, 5)
            + ev3(C.QUERY_EVENT, q_body, 6)
            + ev3(C.USER_VAR_EVENT, uv, 7)
            + ev3(C.INTVAR_EVENT, iv, 8))
    cols = decode_span_statements(data, "binlog.000001", has_magic=True)
    by_type = dict(zip(cols["stmt_type"], zip(cols["schema_name"],
                                              cols["text"], cols["value"],
                                              cols["n1"], cols["n2"])))
    assert by_type["QUERY"][0] == "shop"
    assert by_type["QUERY"][1] == sql.decode()
    assert by_type["USER_VAR"][1] == "v1"
    assert by_type["USER_VAR"][2] == "42"
    assert by_type["INTVAR"][4] == 777
