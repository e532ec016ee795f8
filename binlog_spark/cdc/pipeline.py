"""CDC semantics over the decoded change-event DataFrame.

All-declarative (Catalyst-optimizable) implementations of the stages the
reference leaves to its caller loop (/root/reference/doc.go:33-66), designed
for the shuffle profile at 10^10 events:

  * GTID dedup           — one shuffle on (gtid, seq_in_tx)
  * last-writer-wins     — ``max_by`` aggregation (partial/map-side combine;
                           cheaper than a window sort at scale)
  * hot-key salting      — optional two-stage aggregation for skewed keys
  * key-change handling  — updates whose key moved emit a tombstone at the
                           old key (generalizes /root/reference/rbr.go:344-349)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: commit-order sort key within the replicated stream: file, then position,
#: then row order within the transaction (/root/reference/binlog.go:23-26).
ORDER_COLS = ("log_file", "log_pos", "seq_in_tx")

KEY_COLS = ("repo", "path")
DATA_COLS = ("commit", "lang", "content")


def _order_struct() -> F.Column:
    return F.struct(*[F.col(c) for c in ORDER_COLS])


def dedup_gtid(events: DataFrame) -> DataFrame:
    """Exactly-once at the event level: per-GTID, per-row dedup
    (BASELINE.json:6; the reference skips GTID bodies —
    /root/reference/events.go:354 — this is the gap the engine fills)."""
    return events.dropDuplicates(["gtid", "seq_in_tx"])


def quarantine_bad_crc(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split off CRC-failed rows — never silently dropped (SURVEY A28)."""
    return events.filter(F.col("crc_ok")), events.filter(~F.col("crc_ok"))


def with_key_change_tombstones(events: DataFrame) -> DataFrame:
    """An UPDATE that moved the row's key must delete the old key too."""
    moved = events.filter(
        (F.col("op") == "U")
        & (F.col("before_repo").isNotNull())
        & ((F.col("before_repo") != F.col("repo"))
           | (F.col("before_path") != F.col("path"))))
    # no isEmpty() probe: that would execute the whole upstream once just
    # to check — the union of a (typically empty) filtered branch is free
    tomb = (moved
            .withColumn("op", F.lit("D"))
            .withColumn("repo", F.col("before_repo"))
            .withColumn("path", F.col("before_path"))
            .withColumn("commit", F.lit(None).cast("string"))
            .withColumn("lang", F.lit(None).cast("string"))
            .withColumn("content", F.lit(None).cast("string")))
    return events.unionByName(tomb)


def last_writer_wins(events: DataFrame, *, salt_buckets: int = 0) -> DataFrame:
    """Reduce the change stream to one winning record per (repo, path).

    ``max_by`` over the commit-order struct = commit-order apply without a
    per-partition sort; Spark plans it as a partial aggregation before the
    shuffle, so each map task pre-reduces its chunk's updates — the hot-key
    traffic collapses map-side.  ``salt_buckets > 0`` adds an explicit
    two-stage aggregation for pathological single-key skew (a key updated
    in ~every transaction), cf. SURVEY §7 hard-parts #5.
    """
    payload = F.struct(*[F.col(c) for c in
                         ("op", *DATA_COLS, "extra_json", *ORDER_COLS,
                          "gtid", "ts_sec")])
    if salt_buckets > 0:
        salted = events.withColumn(
            "_salt", F.pmod(F.xxhash64("gtid", "seq_in_tx"), F.lit(salt_buckets)))
        stage1 = (salted.groupBy(*KEY_COLS, "_salt")
                  .agg(F.max_by(payload, _order_struct()).alias("w")))
        stage1 = stage1.select(*KEY_COLS, "w.*")
        winner = (stage1.groupBy(*KEY_COLS)
                  .agg(F.max_by(payload, _order_struct()).alias("w")))
    else:
        winner = (events.groupBy(*KEY_COLS)
                  .agg(F.max_by(payload, _order_struct()).alias("w")))
    return winner.select(*KEY_COLS, "w.*")


def reduce_changes(events: DataFrame, *, salt_buckets: int = 0,
                   dedup: bool = False) -> DataFrame:
    """Full reduction: quarantine → [dedup] → tombstones → last-writer-wins.

    Output: one row per touched key with ``op`` in {I,U,D} — exactly the
    upsert batch the lake MERGE consumes.

    ``dedup=False`` is the default ON PURPOSE: at-least-once redelivery
    produces byte-identical records with identical (log_file, log_pos,
    seq_in_tx) order keys, so the ``max_by`` reduction already yields the
    same winner — an explicit dropDuplicates would add a second full
    shuffle of the event stream for no semantic gain (this is the
    exactly-once argument: identical-replica idempotence here, batch-id
    idempotence at the sink).  Set ``dedup=True`` only for streams that
    can re-deliver *conflicting* payloads under one (gtid, seq)."""
    good, _bad = quarantine_bad_crc(events)
    if dedup:
        good = dedup_gtid(good)
    good = with_key_change_tombstones(good)
    return last_writer_wins(good, salt_buckets=salt_buckets)


def flatten_extras(upserts: DataFrame) -> tuple[DataFrame, list[str]]:
    """Promote schema-evolution extras (the ``extra_json`` map) to real
    columns.  The distinct-key probe is a tiny aggregation over the already
    reduced batch (one row per touched key), not the event stream."""
    if "extra_json" not in upserts.columns:
        return upserts, []
    names = sorted(
        r[0] for r in upserts
        .filter(F.col("extra_json").isNotNull())
        .select(F.explode(F.json_object_keys("extra_json")))
        .distinct().collect())
    for n in names:
        upserts = upserts.withColumn(
            n, F.get_json_object("extra_json", f"$.{n}"))
    return upserts.drop("extra_json"), names


def final_state(upserts: DataFrame) -> DataFrame:
    """Terminal state of an empty-start replay: drop tombstones, promote
    schema-evolution extras."""
    flat, extras = flatten_extras(upserts)
    return (flat.filter(F.col("op") != "D")
            .select(*KEY_COLS, *DATA_COLS, *extras))


def state_fingerprint(state: DataFrame) -> str:
    """Order-insensitive digest of a (repo, path, commit, lang, content)
    state DF — comparable across engines via the same row serialization as
    the oracle's digest (binlog_spark.mysql.oracle.state_digest)."""
    import hashlib
    import json
    base = ("repo", "path", "commit", "lang", "content")
    extra_cols = [c for c in state.columns if c not in base]
    rows = (state
            .select("repo", "path", "commit", "lang",
                    F.sha2(F.coalesce(F.col("content"), F.lit("")), 256)
                    .alias("content_sha"), *extra_cols)
            .orderBy("repo", "path")
            .collect())
    h = hashlib.sha256()
    for r in rows:
        extras = {c: r[c] for c in extra_cols if r[c] is not None}
        line = json.dumps([r.repo, r.path, r.commit, r.lang, r.content_sha,
                           extras],
                          separators=(",", ":"), sort_keys=True)
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()
