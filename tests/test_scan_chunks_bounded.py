"""scan_chunks must walk headers through a bounded window, never
f.read() a whole file into driver memory (VERDICT r5 #5)."""

from __future__ import annotations

import builtins
import os

from binlog_spark.decoder.chunks import read_manifest, scan_chunks
from binlog_spark.mysql import gen

DUMP = "/tmp/scan_bounded_fixture"


def _fixture() -> str:
    if not os.path.exists(os.path.join(DUMP, "manifest.json")):
        gen.generate(DUMP, gen.GenConfig(n_changes=3000,
                                         max_file_bytes=256 << 10),
                     chunk_target=64 << 10)
    return DUMP


def test_window_size_invariant():
    d = _fixture()
    small = scan_chunks(d, chunk_target=64 << 10, io_block=8 << 10)
    big = scan_chunks(d, chunk_target=64 << 10, io_block=64 << 20)
    assert small == big
    assert small, "fixture produced no chunks"
    # spans tile each file contiguously from offset 4
    by_file: dict[str, list] = {}
    for name, off, ln in small:
        by_file.setdefault(name, []).append((off, ln))
    for spans in by_file.values():
        pos = 4
        for off, ln in spans:
            assert off == pos
            pos = off + ln
    # and cover the same byte range the manifest records
    man = {(f, int(o), int(ln)) for f, o, ln in read_manifest(d)["chunks"]}
    man_end = {f: max(o + ln for (f2, o, ln) in man if f2 == f)
               for f in by_file}
    for f, spans in by_file.items():
        assert spans[-1][0] + spans[-1][1] == man_end[f]


def test_reads_are_bounded():
    d = _fixture()
    real_open = builtins.open
    max_read = 0

    class Tracking:
        def __init__(self, fh):
            self._fh = fh

        def read(self, n=-1):
            nonlocal max_read
            data = self._fh.read(n)
            max_read = max(max_read, len(data))
            return data

        def __getattr__(self, name):
            return getattr(self._fh, name)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            self._fh.close()

    def tracked_open(path, mode="r", *a, **kw):
        fh = real_open(path, mode, *a, **kw)
        return Tracking(fh) if "b" in mode else fh

    builtins.open = tracked_open
    try:
        scan_chunks(d, chunk_target=64 << 10, io_block=32 << 10)
    finally:
        builtins.open = real_open
    assert 0 < max_read <= 32 << 10
