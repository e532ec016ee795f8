"""binlog_row_image=MINIMAL: partial before/after images end-to-end.

The reference reads columns-present subsets (/root/reference/rbr.go:283-303);
round 1 decoded them but the apply path assumed FULL images.  Here the
whole pipeline — decode (present_cols), per-column reduction
(reduce_changes_minimal), patch-aware MERGE — must reproduce the
sequential oracle's state across multiple batches (cross-batch patches
exercise the merge coalesce).
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from binlog_spark.cdc.pipeline import state_fingerprint
from binlog_spark.cdc.replay import replay
from binlog_spark.mysql import gen, oracle


@pytest.fixture(scope="module")
def minimal_dump(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mindump"))
    gen.generate(d, gen.GenConfig(n_changes=3000, minimal_images=True,
                                  max_file_bytes=1 << 20),
                 chunk_target=256 * 1024)
    return d


def test_fixture_has_partial_images(minimal_dump):
    recs = list(oracle.iter_change_records(minimal_dump))
    partial_u = [r for r in recs if r.op == "U" and r.partial]
    pk_only_d = [r for r in recs if r.op == "D" and len(r.columns) == 2]
    assert len(partial_u) > 50
    assert len(pk_only_d) > 25
    # MINIMAL before-images are PK-only
    assert all(r.before_columns == ("repo", "path") for r in partial_u)


def test_minimal_replay_matches_oracle(spark, minimal_dump, tmp_path):
    want = oracle.state_digest(oracle.final_state(minimal_dump))
    root = str(tmp_path / "minlake")
    table = replay(spark, minimal_dump, root, chunks_per_batch=4,
                   n_buckets=8, minimal_images=True)
    assert len(table.snapshots()) > 1, "want multiple merge batches"
    assert state_fingerprint(table.read(spark)) == want


def test_minimal_replay_idempotent(spark, minimal_dump, tmp_path):
    root = str(tmp_path / "minlake2")
    t1 = replay(spark, minimal_dump, root, chunks_per_batch=4,
                n_buckets=8, minimal_images=True)
    sid = t1.current_snapshot_id()
    t2 = replay(spark, minimal_dump, root, chunks_per_batch=4,
                n_buckets=8, minimal_images=True)
    assert t2.current_snapshot_id() == sid


def test_minimal_with_schema_evolution(spark, tmp_path):
    """MINIMAL images + mid-stream ALTER: extras patch per column too."""
    d = str(tmp_path / "minevo")
    gen.generate(d, gen.GenConfig(n_changes=3000, minimal_images=True,
                                  evolve_at=1500, max_file_bytes=1 << 20),
                 chunk_target=256 * 1024)
    want = oracle.state_digest(oracle.final_state(d))
    root = str(tmp_path / "minevolake")
    table = replay(spark, d, root, chunks_per_batch=4, n_buckets=8,
                   minimal_images=True)
    got = table.read(spark)
    assert "branch" in got.columns
    assert state_fingerprint(got) == want


def test_minimal_streaming_drain(spark, minimal_dump, tmp_path):
    """MINIMAL images through the Structured Streaming tail: per-batch
    column patches + the patch-aware MERGE must still reproduce the
    sequential oracle digest."""
    from binlog_spark.streaming.tail import stream_apply
    root = str(tmp_path / "minslake")
    ckpt = str(tmp_path / "minsckpt")
    q = stream_apply(spark, minimal_dump, root, ckpt, n_buckets=8,
                     available_now=True, minimal_images=True)
    q.awaitTermination(300)
    from binlog_spark.lake.table import LakeTable
    table = LakeTable(root, n_buckets=8)
    want = oracle.state_digest(oracle.final_state(minimal_dump))
    assert state_fingerprint(table.read(spark)) == want
