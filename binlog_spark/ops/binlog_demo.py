"""The flagship CDC path as a driver-checkable query: generate a
deterministic binlog fixture (cached per scale), replay it through the full
distributed pipeline, and return the final lake state.

Rows-only oracle (binlog bytes aren't SQL); the digest-level parity with
the sequential oracle is asserted in tests/test_spark_replay.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SF_CHANGES = {"sf0.001": 4000, "sf0.01": 20000, "sf0.1": 400000}


def _fixture_dir(sf_dir: str) -> tuple[str, int]:
    sf = os.path.basename(os.path.normpath(sf_dir)) or "sf0.01"
    n = _SF_CHANGES.get(sf, 20000)
    # v4: typed USER_VAR values (string/int/unsigned/real/decimal) in the
    # statement stream; v3 added key-moves + statement events + goldens
    return f"/tmp/binlog_fixture_v4_{sf}_{n}", n


def ensure_fixture(sf_dir: str) -> str:
    from ..mysql import gen
    d, n = _fixture_dir(sf_dir)
    marker = os.path.join(d, "manifest.json")
    if not os.path.exists(marker):
        gen.generate(d, gen.GenConfig(n_changes=n, max_file_bytes=16 << 20),
                     chunk_target=1 << 20)
    return d


def binlog_replay_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → dedup → commit-order reduce; returns the replayed final
    state with the per-row sha256(content) invariant column
    (BASELINE.json:15)."""
    from ..cdc.pipeline import final_state, reduce_changes, \
        scan_extra_columns
    from ..decoder.chunks import chunks_df
    from ..decoder.kernel import decode_changes
    from ..session import ship_package
    ship_package(spark)
    dump = ensure_fixture(sf_dir)
    cdf = chunks_df(spark, dump)
    spans = [tuple(r) for r in cdf.collect()]
    events = decode_changes(cdf)
    state = final_state(reduce_changes(events),
                        extra_names=scan_extra_columns(spans))
    return (state.select("repo", "path", "commit", "lang",
                         F.sha2(F.coalesce("content", F.lit("")), 256)
                         .alias("content_sha256"))
            .orderBy("repo", "path"))


_SF_TYPED = {"sf0.001": 1000, "sf0.01": 4000, "sf0.1": 20000}


def binlog_typed_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic-table decode over a mixed-type fixture (all 17 column type
    families through the distributed path); JSON row images."""
    from ..decoder.chunks import chunks_df
    from ..decoder.generic import decode_changes_generic
    from ..mysql.gen_typed import generate_typed
    from ..session import ship_package
    ship_package(spark)
    sf = os.path.basename(os.path.normpath(sf_dir)) or "sf0.01"
    n = _SF_TYPED.get(sf, 4000)
    d = f"/tmp/binlog_typed_v3_{sf}_{n}"
    if not os.path.exists(os.path.join(d, "manifest.json")):
        generate_typed(d, n_changes=n)
    return (decode_changes_generic(chunks_df(spark, d))
            .orderBy("log_file", "log_pos", "seq_in_tx"))


def binlog_decode_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw decoded change-event stream (op mix + offsets), the decoder's
    public face.  Oracle: the same aggregation over the generator's
    emission log (golden_events.parquet — generator-side truth, written by
    mysql.gen.write_goldens, independent of the decoder)."""
    from ..decoder.chunks import chunks_df
    from ..decoder.kernel import decode_changes
    from ..session import ship_package
    ship_package(spark)
    dump = ensure_fixture(sf_dir)
    ev = decode_changes(chunks_df(spark, dump))
    return (ev.groupBy("op", "log_file")
            .agg(F.count("*").alias("n_events"),
                 F.max("log_pos").alias("max_pos"),
                 F.countDistinct("gtid").alias("n_tx"))
            .orderBy("log_file", "op"))


def binlog_events_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVERY decoded change event — op, key, before-key, payload digest,
    dedup identity, commit-order offset — compared row-for-row against the
    generator's emission log.  The hardest decoder check the driver can
    run: any mis-framed event, wrong image, broken TABLE_MAP cache or
    chunk-boundary bug shows up as a value-hash mismatch."""
    from ..decoder.chunks import chunks_df
    from ..decoder.kernel import decode_changes
    from ..session import ship_package
    ship_package(spark)
    dump = ensure_fixture(sf_dir)
    ev = decode_changes(chunks_df(spark, dump))
    return (ev.select(
        "op", "repo", "path", "before_repo", "before_path", "commit",
        "lang",
        F.when(F.col("op") != "D",
               F.sha2(F.coalesce("content", F.lit("")), 256))
        .alias("content_sha256"),
        "gtid", "seq_in_tx", "log_file", "log_pos", "ts_sec")
        .orderBy("log_file", "log_pos", "seq_in_tx"))


_SF_MINIMAL = {"sf0.001": 2000, "sf0.01": 8000, "sf0.1": 40000}


def _minimal_fixture(sf_dir: str) -> str:
    from ..mysql import gen
    sf = os.path.basename(os.path.normpath(sf_dir)) or "sf0.01"
    n = _SF_MINIMAL.get(sf, 8000)
    d = f"/tmp/binlog_minimal_v1_{sf}_{n}"
    if not os.path.exists(os.path.join(d, "manifest.json")):
        gen.generate(d, gen.GenConfig(n_changes=n, minimal_images=True,
                                      max_file_bytes=8 << 20),
                     chunk_target=512 << 10)
    return d


def binlog_minimal_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full replay of a binlog_row_image=MINIMAL dump (partial
    before/after images, PK-only deletes, key-move lineage) through the
    per-column reduction + patch-aware MERGE, vs the generator's final
    state (golden_state.parquet — generator-side truth)."""
    import shutil

    from ..cdc.replay import replay
    from ..session import ship_package
    ship_package(spark)
    d = _minimal_fixture(sf_dir)
    lake = f"{d}_lake"
    shutil.rmtree(lake, ignore_errors=True)
    # ONE throughput-sized batch (a real deployment batches gigabytes;
    # micro-batch resume is exercised in tests/) — each extra batch pays
    # a fixed ~6 s of merge/plan machinery regardless of data volume
    table = replay(spark, d, lake, chunks_per_batch=None, n_buckets=8,
                   lineage=False, minimal_images=True)
    state = table.read(spark)
    return (state.select("repo", "path", "commit", "lang",
                         F.sha2(F.coalesce("content", F.lit("")), 256)
                         .alias("content_sha256"))
            .orderBy("repo", "path"))


def binlog_statement_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The statement-event side channel: QUERY (BEGIN + DDL), ROWS_QUERY,
    INTVAR/RAND/USER_VAR session state and INCIDENT markers, decoded with
    commit-order offsets (reference parity:
    /root/reference/events.go:211-338, rbr.go:373-386).  Oracle: the
    generator's statement emission log (golden_statements.parquet)."""
    from ..decoder.chunks import chunks_df
    from ..decoder.statements import decode_statements
    from ..session import ship_package
    ship_package(spark)
    dump = ensure_fixture(sf_dir)
    return (decode_statements(chunks_df(spark, dump))
            .select("stmt_type", "schema_name", "text", "value", "n1",
                    "n2", "gtid", "log_file", "log_pos", "ts_sec")
            .orderBy("log_file", "log_pos"))


_SF_MULTI = {"sf0.001": 1500, "sf0.01": 6000, "sf0.1": 30000}


def golden_paths(sf_dir: str) -> dict[str, str]:
    """Ensure every binlog fixture (and its golden parquet) exists for the
    given scale and return the golden file paths — the DuckDB oracle twins
    read these via read_parquet()."""
    from ..mysql.gen_multi import generate_multi
    from ..mysql.gen_typed import generate_typed
    dump = ensure_fixture(sf_dir)
    sf = os.path.basename(os.path.normpath(sf_dir)) or "sf0.01"
    nt = _SF_TYPED.get(sf, 4000)
    dt = f"/tmp/binlog_typed_v3_{sf}_{nt}"
    if not os.path.exists(os.path.join(dt, "manifest.json")):
        generate_typed(dt, n_changes=nt)
    nm = _SF_MULTI.get(sf, 6000)
    dm = f"/tmp/binlog_multi_v4_{sf}_{nm}"
    if not os.path.exists(os.path.join(dm, "manifest.json")):
        generate_multi(dm, n_changes=nm)
    dmm = _multi_minimal_fixture(sf_dir)
    return {
        "state": os.path.join(dump, "golden_state.parquet"),
        "events": os.path.join(dump, "golden_events.parquet"),
        "statements": os.path.join(dump, "golden_statements.parquet"),
        "typed": os.path.join(dt, "golden_typed.parquet"),
        "multi": os.path.join(dm, "golden_multi.parquet"),
        "multi_minimal": os.path.join(dmm, "golden_multi.parquet"),
        "minimal_state": os.path.join(_minimal_fixture(sf_dir),
                                      "golden_state.parquet"),
    }


def _multi_minimal_fixture(sf_dir: str) -> str:
    from ..mysql.gen_multi import generate_multi
    sf = os.path.basename(os.path.normpath(sf_dir)) or "sf0.01"
    n = _SF_MULTI.get(sf, 6000)
    d = f"/tmp/binlog_multi_min_v1_{sf}_{n}"
    if not os.path.exists(os.path.join(d, "manifest.json")):
        generate_multi(d, n_changes=n, seed=13, minimal_images=True)
    return d


def binlog_multi_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table replay: one stream demultiplexed into one lake table per
    source table, keyed by each table's TABLE_MAP primary key (cdc.multi).
    Returns the union of all final table states as (schema, table,
    pk_json, row_json) — deterministic under the seeded fixture."""
    import json
    import shutil

    from ..cdc.multi import replay_generic
    from ..mysql.gen_multi import generate_multi
    from ..session import ship_package
    ship_package(spark)
    sf = os.path.basename(os.path.normpath(sf_dir)) or "sf0.01"
    n = _SF_MULTI.get(sf, 6000)
    d = f"/tmp/binlog_multi_v4_{sf}_{n}"
    if not os.path.exists(os.path.join(d, "manifest.json")):
        generate_multi(d, n_changes=n)
    lake = f"{d}_lake"
    shutil.rmtree(lake, ignore_errors=True)
    tables = replay_generic(spark, d, lake, chunks_per_batch=16)
    return _render_tables(spark, tables)


def _render_tables(spark: SparkSession, tables: dict) -> DataFrame:
    out = None
    for (sch, tbl), t in sorted(tables.items()):
        pk = list(t.key_cols)
        base = t.read(spark)
        df = base.select(
            F.lit(sch).alias("table_schema"), F.lit(tbl).alias("table_name"),
            F.to_json(F.struct(*pk)).alias("pk_json"),
            F.to_json(F.struct(*base.columns)).alias("row_json"))
        out = df if out is None else out.unionByName(df)
    return out.orderBy("table_schema", "table_name", "pk_json")


def binlog_multi_minimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table replay of a binlog_row_image=MINIMAL dump: partial
    before/after images on arbitrary TABLE_MAP schemas routed through the
    generic per-column reduction (cdc.multi.table_upserts_minimal) and
    the patch-aware MERGE.  Oracle: the generator's live state
    (golden_multi.parquet of the minimal fixture — generator-side
    truth)."""
    import shutil

    from ..cdc.multi import replay_generic
    from ..session import ship_package
    ship_package(spark)
    d = _multi_minimal_fixture(sf_dir)
    lake = f"{d}_lake"
    shutil.rmtree(lake, ignore_errors=True)
    # one throughput-sized batch — see binlog_minimal_state's note
    tables = replay_generic(spark, d, lake, chunks_per_batch=None)
    return _render_tables(spark, tables)
