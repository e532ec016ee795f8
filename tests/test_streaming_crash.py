"""Crash injection for streaming exactly-once (VERDICT r4 ask #6).

The exactly-once claim is double-keyed: Spark's streaming checkpoint
dedups batch replays at the source, the lake's batch-id idempotence
dedups them at the sink (streaming/tail.py module docstring).  Clean
runs never exercise the second key — these tests kill the query in BOTH
crash windows and restart it on the same checkpoint:

  * window A — after the lake MERGE committed, before the streaming
    checkpoint commit (injected via the on_batch callback, which runs
    exactly between the two): the replayed batch must be SKIPPED by the
    sink's batch-id check, not re-applied;
  * window B — before the MERGE committed (injected by patching
    LakeTable.merge to raise on its first call): the replayed batch must
    apply exactly once.

Both restarts must converge to the sequential oracle's digest with
exactly one snapshot per batch id.
"""

from __future__ import annotations

import sys
from collections import Counter

import pytest

sys.path.insert(0, "/root/repo")

from binlog_spark.cdc.pipeline import state_fingerprint
from binlog_spark.lake.table import LakeTable
from binlog_spark.mysql import gen, oracle
from binlog_spark.streaming.tail import stream_apply


@pytest.fixture(scope="module")
def crash_dump(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("crashdump"))
    gen.generate(d, gen.GenConfig(n_changes=5000, max_file_bytes=32 << 10),
                 chunk_target=64 * 1024)
    files = oracle.list_files(d)
    # stream_blobs triggers 16 files per micro-batch: ≥2 batches needed
    # so a crash on batch 0 leaves real work for the restart
    assert len(files) > 16, f"fixture produced only {len(files)} files"
    return d


def _assert_exactly_once(spark, table, dump_dir):
    want = oracle.state_digest(oracle.final_state(dump_dir))
    assert state_fingerprint(table.read(spark)) == want
    ids = [s["batch_id"] for s in table.snapshots() if s.get("batch_id")]
    dupes = {b: n for b, n in Counter(ids).items() if n > 1}
    assert not dupes, f"batch ids committed more than once: {dupes}"


def test_crash_after_merge_before_checkpoint_commit(spark, crash_dump,
                                                    tmp_path):
    root = str(tmp_path / "crashlakeA")
    ckpt = str(tmp_path / "crashckptA")
    seen: list[dict] = []

    def boom(batch_id: int, snap: dict) -> None:
        seen.append(snap)
        if len(seen) == 1:
            # merge committed, streaming checkpoint NOT yet committed
            raise RuntimeError("injected crash: window A")

    q = stream_apply(spark, crash_dump, root, ckpt, n_buckets=8,
                     available_now=True, on_batch=boom)
    with pytest.raises(Exception, match="window A"):
        q.awaitTermination(300)
    table = LakeTable(root, n_buckets=8)
    committed_mid = table.committed_batch_ids()
    assert len(committed_mid) >= 1  # the merge DID land before the crash

    # restart on the same checkpoint: Spark replays the uncommitted
    # micro-batch; the sink must skip it by batch id
    replays: list[dict] = []
    q = stream_apply(spark, crash_dump, root, ckpt, n_buckets=8,
                     available_now=True,
                     on_batch=lambda b, s: replays.append(s))
    q.awaitTermination(300)
    assert any(s.get("skipped") for s in replays), \
        "the replayed batch was re-applied instead of skipped"
    _assert_exactly_once(spark, table, crash_dump)


def test_crash_before_merge_commit(spark, crash_dump, tmp_path,
                                   monkeypatch):
    root = str(tmp_path / "crashlakeB")
    ckpt = str(tmp_path / "crashckptB")
    real_merge = LakeTable.merge
    calls = {"n": 0}

    def flaky_merge(self, spark_, upserts, batch_id, offsets=None):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected crash: window B")
        return real_merge(self, spark_, upserts, batch_id, offsets=offsets)

    monkeypatch.setattr(LakeTable, "merge", flaky_merge)
    q = stream_apply(spark, crash_dump, root, ckpt, n_buckets=8,
                     available_now=True)
    with pytest.raises(Exception, match="window B"):
        q.awaitTermination(300)
    table = LakeTable(root, n_buckets=8)
    assert table.committed_batch_ids() == set()  # nothing landed

    monkeypatch.setattr(LakeTable, "merge", real_merge)
    q = stream_apply(spark, crash_dump, root, ckpt, n_buckets=8,
                     available_now=True)
    q.awaitTermination(300)
    _assert_exactly_once(spark, table, crash_dump)
