"""Vectorized decoder (decoder/vector.py) ≡ classic kernel, per chunk.

The vector path is a pure optimization: for every fixture family it must
either produce a byte-identical Arrow batch or decline (return None) so
the caller re-decodes with the classic kernel.  These tests pin both
arms: exact equality on the layouts it claims, and honest fallback on
the layouts it must not touch (MINIMAL images, schema evolution,
mixed-type tables, legacy binlog versions).
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")

from binlog_spark.mysql import gen
from binlog_spark.decoder.kernel import _cols_to_batch, decode_span_columns
from binlog_spark.decoder.vector import decode_span_batch


def _chunks(d: str):
    import json
    with open(os.path.join(d, "manifest.json")) as f:
        m = json.load(f)
    for log_file, off, ln in m["chunks"]:
        with open(os.path.join(d, log_file), "rb") as f:
            f.seek(off)
            yield log_file, off, f.read(ln)


def _classic(data: bytes, log_file: str, has_magic: bool):
    cols = decode_span_columns(data, log_file, has_magic=has_magic)
    return _cols_to_batch(cols)


def _assert_all_equal(d: str, min_vectorized: int = 1):
    n_vec = 0
    for log_file, off, data in _chunks(d):
        rb_v = decode_span_batch(data, log_file, has_magic=off == 0)
        rb_c = _classic(data, log_file, off == 0)
        if rb_v is None:
            continue  # fallback chunk — classic path is authoritative
        n_vec += 1
        assert pa.Table.from_batches([rb_v]).equals(
            pa.Table.from_batches([rb_c])), f"{log_file}@{off} differs"
    assert n_vec >= min_vectorized


def test_vector_equals_classic_default(tmp_path):
    d = str(tmp_path / "dump")
    gen.generate(d, gen.GenConfig(n_changes=4000, max_file_bytes=1 << 20,
                                  seed=7), chunk_target=128 * 1024)
    _assert_all_equal(d, min_vectorized=5)


def test_vector_equals_classic_checksum_off(tmp_path):
    d = str(tmp_path / "dump")
    gen.generate(d, gen.GenConfig(n_changes=2000, checksum=False, seed=11,
                                  max_file_bytes=1 << 20),
                 chunk_target=128 * 1024)
    _assert_all_equal(d, min_vectorized=3)


def test_vector_equals_classic_key_moves_and_hot_key(tmp_path):
    d = str(tmp_path / "dump")
    gen.generate(d, gen.GenConfig(n_changes=3000, key_move_ratio=0.3,
                                  hot_key_ratio=0.3, seed=13,
                                  max_file_bytes=1 << 20),
                 chunk_target=128 * 1024)
    _assert_all_equal(d, min_vectorized=3)


def test_vector_corrupt_crc_flagged(tmp_path):
    """A flipped byte inside a rows-event body must surface as
    crc_ok=False on that event's records in BOTH paths."""
    d = str(tmp_path / "dump")
    gen.generate(d, gen.GenConfig(n_changes=500, seed=17,
                                  max_file_bytes=4 << 20),
                 chunk_target=1 << 20)
    log_file, off, data = next(iter(_chunks(d)))
    # find a rows event and flip a byte in its body (not the header)
    from binlog_spark import constants as C
    from binlog_spark.mysql.decode import iter_frames
    target = None
    for fr, _ in iter_frames(data, has_magic=off == 0):
        if fr.event_type in C.ROWS_EVENTS:
            target = fr.start
            break
    assert target is not None
    ba = bytearray(data)
    ba[target + 40] ^= 0x01  # stays ASCII — classic must not utf-8-fail
    data = bytes(ba)
    rb_v = decode_span_batch(data, log_file, has_magic=off == 0)
    rb_c = _classic(data, log_file, off == 0)
    assert rb_v is not None
    assert pa.Table.from_batches([rb_v]).equals(
        pa.Table.from_batches([rb_c]))
    assert not all(rb_v.column("crc_ok").to_pylist())


def test_vector_equals_classic_minimal_images(tmp_path):
    """MINIMAL row images ride the fast path since r5: per-mask
    specialized walkers must reproduce the classic kernel's partial
    rows byte-for-byte — including present_cols csvs, PK-only before
    images, and null-vs-absent column distinctions."""
    d = str(tmp_path / "dump")
    gen.generate(d, gen.GenConfig(n_changes=1500, minimal_images=True,
                                  seed=19, key_move_ratio=0.2,
                                  max_file_bytes=1 << 20),
                 chunk_target=128 * 1024)
    _assert_all_equal(d, min_vectorized=3)


def test_vector_minimal_keys_equal_classic(tmp_path):
    from binlog_spark.decoder.kernel import _keys_to_batch, decode_span_keys
    from binlog_spark.decoder.vector import decode_span_keys_batch
    d = str(tmp_path / "dump")
    gen.generate(d, gen.GenConfig(n_changes=1500, minimal_images=True,
                                  seed=19, key_move_ratio=0.2,
                                  max_file_bytes=1 << 20),
                 chunk_target=128 * 1024)
    n_vec = 0
    for log_file, off, data in _chunks(d):
        rb_v = decode_span_keys_batch(data, log_file, has_magic=off == 0)
        if rb_v is None:
            continue
        n_vec += 1
        rb_c = _keys_to_batch(decode_span_keys(data, log_file,
                                               has_magic=off == 0))
        assert pa.Table.from_batches([rb_v]).equals(
            pa.Table.from_batches([rb_c])), f"{log_file}@{off} differs"
    assert n_vec >= 3


def test_vector_declines_exotic_layouts(tmp_path):
    """Schema evolution (extra columns) must route to the classic
    kernel (None), never decode wrong."""
    d = str(tmp_path / "dump")
    gen.generate(d, gen.GenConfig(n_changes=800, evolve_at=200, seed=23,
                                  max_file_bytes=1 << 20),
                 chunk_target=128 * 1024)
    saw_fallback = False
    for log_file, off, data in _chunks(d):
        rb_v = decode_span_batch(data, log_file, has_magic=off == 0)
        if rb_v is None:
            saw_fallback = True
            continue
        rb_c = _classic(data, log_file, off == 0)
        assert pa.Table.from_batches([rb_v]).equals(
            pa.Table.from_batches([rb_c]))
    assert saw_fallback


def test_vector_keys_equal_classic(tmp_path):
    from binlog_spark.decoder.kernel import _keys_to_batch, decode_span_keys
    from binlog_spark.decoder.vector import decode_span_keys_batch
    d = str(tmp_path / "dump")
    gen.generate(d, gen.GenConfig(n_changes=3000, key_move_ratio=0.2,
                                  seed=29, max_file_bytes=1 << 20),
                 chunk_target=128 * 1024)
    n_vec = 0
    for log_file, off, data in _chunks(d):
        rb_v = decode_span_keys_batch(data, log_file, has_magic=off == 0)
        if rb_v is None:
            continue
        n_vec += 1
        rb_c = _keys_to_batch(decode_span_keys(data, log_file,
                                               has_magic=off == 0))
        assert pa.Table.from_batches([rb_v]).equals(
            pa.Table.from_batches([rb_c])), f"{log_file}@{off} differs"
    assert n_vec >= 3


def test_vector_empty_and_garbage():
    assert decode_span_batch(b"", "binlog.000001").num_rows == 0
    # garbage head with magic → decline (classic raises loudly)
    garbage = b"\xfebin" + os.urandom(64)
    assert decode_span_batch(garbage, "binlog.000001",
                             has_magic=True) is None
