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
    return f"/tmp/binlog_fixture_{sf}_{n}", n


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
    from ..cdc.pipeline import final_state, reduce_changes
    from ..decoder.chunks import chunks_df
    from ..decoder.kernel import decode_changes
    from ..session import ship_package
    ship_package(spark)
    dump = ensure_fixture(sf_dir)
    events = decode_changes(chunks_df(spark, dump))
    state = final_state(reduce_changes(events))
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
    d = f"/tmp/binlog_typed_{sf}_{n}"
    if not os.path.exists(os.path.join(d, "manifest.json")):
        generate_typed(d, n_changes=n)
    return (decode_changes_generic(chunks_df(spark, d))
            .orderBy("log_file", "log_pos", "seq_in_tx"))


def binlog_decode_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw decoded change-event stream (op mix + offsets), the decoder's
    public face."""
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


_SF_MULTI = {"sf0.001": 1500, "sf0.01": 6000, "sf0.1": 30000}


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
    d = f"/tmp/binlog_multi_{sf}_{n}"
    if not os.path.exists(os.path.join(d, "manifest.json")):
        generate_multi(d, n_changes=n)
    lake = f"{d}_lake"
    shutil.rmtree(lake, ignore_errors=True)
    tables = replay_generic(spark, d, lake, chunks_per_batch=16)
    out = None
    for (sch, tbl), t in sorted(tables.items()):
        pk = list(t.key_cols)
        cols = t.read(spark).columns
        df = t.read(spark).select(
            F.lit(sch).alias("table_schema"), F.lit(tbl).alias("table_name"),
            F.to_json(F.struct(*pk)).alias("pk_json"),
            F.to_json(F.struct(*cols)).alias("row_json"))
        out = df if out is None else out.unionByName(df)
    return out.orderBy("table_schema", "table_name", "pk_json")
