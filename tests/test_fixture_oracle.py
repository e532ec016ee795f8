"""Generator ↔ oracle round trip: the truth-defining layer (SURVEY §5).

The generator plays MySQL; the oracle plays the reference library.  Their
agreement on final state (per-row content, digest) is the base invariant
every distributed path must also satisfy.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from binlog_spark import constants as C
from binlog_spark.mysql import gen, oracle
from binlog_spark.mysql.decode import decode_chunk, iter_frames


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("binlog_fix"))
    gen.generate(d, gen.GenConfig(n_changes=5000, max_file_bytes=1 << 20),
                 chunk_target=128 * 1024)
    return d


def load_golden(d):
    out = {}
    with open(os.path.join(d, "final_state.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            out[(r["repo"], r["path"])] = r
    return out


def test_final_state_matches_golden(fixture_dir):
    state = oracle.final_state(fixture_dir)
    golden = load_golden(fixture_dir)
    assert set(state) == set(golden)
    for k, row in state.items():
        g = golden[k]
        assert row["commit"] == g["commit"]
        assert row["lang"] == g["lang"]
        assert row["content"] == g["content"]


def test_next_chain_order(fixture_dir):
    files = oracle.list_files(fixture_dir)
    assert files == sorted(files)
    assert len(files) >= 1
    # every listed file starts with the 4-byte magic
    for name in files:
        with open(os.path.join(fixture_dir, name), "rb") as f:
            assert f.read(4) == C.MAGIC


def test_crc_verified_everywhere(fixture_dir):
    for name in oracle.list_files(fixture_dir):
        with open(os.path.join(fixture_dir, name), "rb") as f:
            data = f.read()
        for fr, _fde in iter_frames(data, has_magic=True):
            assert fr.crc_ok, f"CRC mismatch in {name} at {fr.start}"


def test_corrupt_event_detected(fixture_dir):
    name = oracle.list_files(fixture_dir)[0]
    with open(os.path.join(fixture_dir, name), "rb") as f:
        data = bytearray(f.read())
    # flip a byte inside some event body past the FDE
    data[600] ^= 0xFF
    frames = list(iter_frames(bytes(data), has_magic=True))
    assert any(not fr.crc_ok for fr, _ in frames)


def test_chunk_decode_matches_whole_file(fixture_dir):
    """Chunks cut at transaction boundaries decode to the same records as
    the whole file — the parallelization theorem (SURVEY §4)."""
    with open(os.path.join(fixture_dir, "manifest.json")) as f:
        manifest = json.load(f)
    name = manifest["files"][0]
    with open(os.path.join(fixture_dir, name), "rb") as f:
        data = f.read()
    whole = decode_chunk(data, name, has_magic=True)
    chunked = []
    for (fn, off, ln) in manifest["chunks"]:
        if fn != name:
            continue
        chunked.extend(decode_chunk(data[off:off + ln], name))
    assert len(whole) == len(chunked)
    for a, b in zip(whole, chunked):
        assert (a.op, a.before, a.after, a.gtid, a.seq_in_tx, a.log_pos) == \
               (b.op, b.before, b.after, b.gtid, b.seq_in_tx, b.log_pos)


def test_gtid_and_offsets_present(fixture_dir):
    recs = list(oracle.iter_change_records(fixture_dir))
    assert all(r.gtid for r in recs)
    assert all(r.log_pos > 0 for r in recs)
    # log order is non-decreasing per file
    by_file: dict[str, int] = {}
    for r in recs:
        assert r.log_pos >= by_file.get(r.log_file, 0)
        by_file[r.log_file] = r.log_pos


def test_idempotent_replay(fixture_dir):
    """Replaying the stream twice (dup records) with GTID dedup yields the
    same state — the exactly-once invariant at oracle level."""
    recs = list(oracle.iter_change_records(fixture_dir))
    once = oracle.apply_records(iter(recs))
    twice = oracle.apply_records(iter(recs + recs))
    assert oracle.state_digest(once) == oracle.state_digest(twice)


def test_key_moving_updates_present_and_handled(fixture_dir):
    """v2 fixtures contain key-moving UPDATEs; the oracle must vacate the
    old key (a stale row there would shadow later inserts)."""
    moves = [r for r in oracle.iter_change_records(fixture_dir)
             if r.op == "U" and r.before is not None
             and (r.before[0], r.before[1]) != (r.after[0], r.after[1])]
    assert moves, "fixture has no key-moving updates"
    state = oracle.final_state(fixture_dir)
    golden = load_golden(fixture_dir)
    assert set(state) == set(golden)


def test_golden_parquet_matches_oracle(fixture_dir):
    """golden_state.parquet (generator-side truth) must agree with the
    sequential oracle's replay — two independent computations of the same
    final state."""
    import hashlib

    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(fixture_dir, "golden_state.parquet"))
    golden = {(r["repo"], r["path"]): r for r in tbl.to_pylist()}
    state = oracle.final_state(fixture_dir)
    assert set(golden) == set(state)
    for k, row in state.items():
        g = golden[k]
        assert g["commit"] == row["commit"]
        assert g["content_sha256"] == hashlib.sha256(
            (row.get("content") or "").encode()).hexdigest()


def test_golden_events_match_oracle_decode(fixture_dir):
    """golden_events.parquet (the writer's emission log) must agree with
    the sequential decode on op/keys/offsets for every event."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(fixture_dir, "golden_events.parquet"))
    golden = tbl.to_pylist()
    recs = list(oracle.iter_change_records(fixture_dir))
    assert len(golden) == len(recs)
    for g, r in zip(golden, recs):
        img = r.after if r.after is not None else r.before
        assert (g["op"], g["repo"], g["path"], g["gtid"], g["seq_in_tx"],
                g["log_file"], g["log_pos"]) == \
               (r.op, img[0], img[1], r.gtid, r.seq_in_tx, r.log_file,
                r.log_pos)


def test_binlog_version_inference(fixture_dir):
    """v4 classified from FORMAT_DESCRIPTION; v1/v3 (START_EVENT_V3
    heads) classified by event size (/root/reference/version.go:9-64
    rule) and routed to the legacy 13-/19-byte header iterator."""
    import struct

    from binlog_spark.mysql.decode import (infer_binlog_version,
                                           iter_frames)
    name = oracle.list_files(fixture_dir)[0]
    data = open(os.path.join(fixture_dir, name), "rb").read()
    assert infer_binlog_version(data) == 4

    start_body = (struct.pack("<H", 3) + b"4.1.22-log".ljust(50, b"\x00")
                  + struct.pack("<I", 0))
    v3_hdr = struct.pack("<IBIIIH", 7, C.START_EVENT_V3, 1,
                         19 + len(start_body), 4 + 19 + len(start_body), 0)
    stop3 = struct.pack("<IBIIIH", 8, 0x03, 1, 19, 0, 0)  # STOP_EVENT
    v3 = C.MAGIC + v3_hdr + start_body + stop3
    assert infer_binlog_version(v3) == 3

    body1 = (struct.pack("<H", 1) + b"3.23.57".ljust(50, b"\x00")
             + struct.pack("<I", 0))
    v1_hdr = struct.pack("<IBII", 5, C.START_EVENT_V3, 1, 13 + len(body1))
    stop1 = struct.pack("<IBII", 6, 0x03, 1, 13)
    v1 = C.MAGIC + v1_hdr + body1 + stop1
    assert infer_binlog_version(v1) == 1

    # v3: 19-byte headers, no checksum; START declares the server version
    frames = list(iter_frames(v3, has_magic=True))
    assert [f.event_type for f, _ in frames] == [C.START_EVENT_V3, 0x03]
    assert frames[0][1].binlog_version == 3
    assert frames[0][1].server_version == "4.1.22-log"
    assert frames[0][1].checksum_len == 0
    assert frames[1][0].timestamp == 8

    # v1: 13-byte headers (no log_pos/flags — next_pos synthesized)
    frames = list(iter_frames(v1, has_magic=True))
    assert [f.event_type for f, _ in frames] == [C.START_EVENT_V3, 0x03]
    assert frames[0][1].binlog_version == 1
    assert frames[0][1].server_version == "3.23.57"
    assert frames[1][0].timestamp == 6
    assert frames[0][0].next_pos == 4 + 13 + len(body1)

    # a head that is NEITHER FDE nor START_EVENT_V3 (corrupt / sliced
    # file) must raise loudly, not silently decode checksum-free via
    # the inference rule's "anything else -> v3" default
    from binlog_spark.mysql.decode import BinlogError
    rot_hdr = struct.pack("<IBIIIH", 9, C.ROTATE_EVENT, 1, 19 + 12,
                          4 + 19 + 12, 0)
    sliced = C.MAGIC + rot_hdr + b"\x00" * 12
    with pytest.raises(BinlogError):
        list(iter_frames(sliced, has_magic=True))


def test_checksum_off_dump_decodes(tmp_path):
    """binlog_checksum=NONE: the FDE declares alg 0 for file heads, and
    FDE-less mid-file chunks detect the missing trailers via the CRC
    probe — previously DEFAULT_FDE assumed CRC32 and chopped 4 body
    bytes off every event."""
    d = str(tmp_path / "nocrc")
    gen.generate(d, gen.GenConfig(n_changes=2000, checksum=False,
                                  max_file_bytes=1 << 20),
                 chunk_target=64 * 1024)
    golden = load_golden(d)
    state = oracle.final_state(d)
    assert set(state) == set(golden)
    for k, row in state.items():
        assert row["commit"] == golden[k]["commit"]
        assert row["content"] == golden[k]["content"]
    # chunk decode (no FDE, probe-inferred checksum) == whole-file decode
    manifest = json.load(open(os.path.join(d, "manifest.json")))
    name = manifest["files"][0]
    data = open(os.path.join(d, name), "rb").read()
    whole = decode_chunk(data, name, has_magic=True)
    chunked = []
    for (fn, off, ln) in manifest["chunks"]:
        if fn != name:
            continue
        chunked.extend(decode_chunk(data[off:off + ln], name))
    assert len(whole) == len(chunked) > 0
    for a, b in zip(whole, chunked):
        assert (a.op, a.before, a.after, a.log_pos) == \
               (b.op, b.before, b.after, b.log_pos)
        assert a.crc_ok and b.crc_ok
