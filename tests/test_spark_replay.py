"""Distributed replay ↔ sequential oracle parity — the headline invariant
(BASELINE.json:6): after full replay the engine reproduces the reference-
semantics final state byte-for-byte (per-row sha256(content)), is resumable
from any checkpoint, and re-running is a no-op.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from binlog_spark.cdc.pipeline import reduce_changes, final_state, state_fingerprint
from binlog_spark.cdc.replay import replay
from binlog_spark.decoder.chunks import chunks_df, seek
from binlog_spark.decoder.kernel import decode_changes
from binlog_spark.lake.table import LakeTable
from binlog_spark.mysql import gen, oracle


@pytest.fixture(scope="module")
def dump_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dump"))
    gen.generate(d, gen.GenConfig(n_changes=8000, max_file_bytes=1 << 20),
                 chunk_target=128 * 1024)
    return d


@pytest.fixture(scope="module")
def oracle_digest(dump_dir):
    return oracle.state_digest(oracle.final_state(dump_dir))


def test_decode_counts_match_oracle(spark, dump_dir):
    events = decode_changes(chunks_df(spark, dump_dir))
    n_spark = events.count()
    n_oracle = sum(1 for _ in oracle.iter_change_records(dump_dir))
    assert n_spark == n_oracle
    assert events.filter(~F.col("crc_ok")).count() == 0


def test_reduce_matches_oracle_digest(spark, dump_dir, oracle_digest):
    events = decode_changes(chunks_df(spark, dump_dir))
    state = final_state(reduce_changes(events), extra_names=[])
    assert state_fingerprint(state) == oracle_digest


def test_salted_reduce_same_digest(spark, dump_dir, oracle_digest):
    events = decode_changes(chunks_df(spark, dump_dir))
    state = final_state(reduce_changes(events, salt_buckets=8),
                        extra_names=[])
    assert state_fingerprint(state) == oracle_digest


def test_full_replay_into_lake(spark, dump_dir, oracle_digest, tmp_path):
    root = str(tmp_path / "lake")
    table = replay(spark, dump_dir, root, chunks_per_batch=None, n_buckets=8)
    got = table.read(spark)
    assert state_fingerprint(got) == oracle_digest


def test_batched_replay_and_resume(spark, dump_dir, oracle_digest, tmp_path):
    """Replay in several batches; kill after batch k and resume — final
    state must be identical for every k (SURVEY §7 Phase 5 test)."""
    root = str(tmp_path / "lake_batched")
    table = replay(spark, dump_dir, root, chunks_per_batch=20, n_buckets=8)
    assert state_fingerprint(table.read(spark)) == oracle_digest
    n_snaps = len(table.snapshots())
    assert n_snaps > 2  # really was multi-batch
    # re-run: every batch already committed -> zero new snapshots
    table2 = replay(spark, dump_dir, root, chunks_per_batch=20, n_buckets=8)
    assert len(table2.snapshots()) == n_snaps
    # checkpoint offsets advance monotonically
    offs = [s["offsets"] for s in table.snapshots() if s.get("offsets")]
    assert offs == sorted(offs, key=lambda o: (o["log_file"], o["next_pos"]))


def test_resume_from_partial(spark, dump_dir, oracle_digest, tmp_path):
    """Simulate a crash mid-replay: run only a prefix of batches, then
    resume with the full plan."""
    from binlog_spark.cdc.replay import plan_batches, _batch_id
    from binlog_spark.cdc.pipeline import reduce_changes as reduce_c
    root = str(tmp_path / "lake_partial")
    all_chunks = [tuple(r) for r in chunks_df(spark, dump_dir).collect()]
    batches = plan_batches(all_chunks, 25)
    # manually apply only the first half
    table = LakeTable(root, n_buckets=8)
    table.create()
    for i, spans in enumerate(batches[:len(batches) // 2]):
        bid = _batch_id(dump_dir, i, [s[1:] for s in spans])
        cdf = spark.createDataFrame(spans, "dump_dir string, log_file string,"
                                    " chunk_off long, chunk_len long")
        table.merge(spark, reduce_c(decode_changes(cdf)), batch_id=bid)
    partial_snaps = len(table.snapshots())
    assert partial_snaps == len(batches) // 2 + 1
    # resume via the public entry point
    table = replay(spark, dump_dir, root, chunks_per_batch=25, n_buckets=8)
    assert state_fingerprint(table.read(spark)) == oracle_digest


def test_merge_idempotent_same_batch_id(spark, dump_dir, tmp_path):
    root = str(tmp_path / "lake_idem")
    events = decode_changes(chunks_df(spark, dump_dir))
    upserts = reduce_changes(events)
    table = LakeTable(root, n_buckets=8)
    table.create()
    s1 = table.merge(spark, upserts, batch_id="b1")
    s2 = table.merge(spark, upserts, batch_id="b1")
    assert s2.get("skipped") is True
    assert table.current_snapshot_id() == s1["snapshot_id"]


def test_time_travel(spark, dump_dir, tmp_path):
    root = str(tmp_path / "lake_tt")
    table = replay(spark, dump_dir, root, chunks_per_batch=40, n_buckets=8)
    snaps = table.snapshots()
    assert len(snaps) >= 3
    mid = snaps[1]["snapshot_id"]
    n_mid = table.read(spark, snapshot_id=mid).count()
    n_cur = table.read(spark).count()
    assert n_mid <= n_cur or snaps[1]["stats"].get("deletes", 0) >= 0
    # snapshot 0 is the empty table
    assert table.read(spark, snapshot_id=0).count() == 0


def test_seek_predicate(spark, dump_dir):
    chunks = chunks_df(spark, dump_dir)
    first = chunks.orderBy("log_file", "chunk_off").first()
    rest = seek(chunks, first.log_file, first.chunk_off + first.chunk_len)
    assert rest.count() == chunks.count() - 1


def test_lineage_written(spark, dump_dir, tmp_path):
    import os
    root = str(tmp_path / "lake_lin")
    replay(spark, dump_dir, root, chunks_per_batch=None, n_buckets=8)
    lin_dir = os.path.join(root, "lineage")
    assert os.path.isdir(lin_dir) and len(os.listdir(lin_dir)) >= 1
    lin = spark.read.parquet(os.path.join(lin_dir, "*"))
    n_changes = sum(r.events_decoded for r in lin.collect())
    n_oracle = sum(1 for _ in oracle.iter_change_records(dump_dir))
    assert n_changes == n_oracle
