"""Benchmark harness — prints ONE JSON line with per-query seconds.

Headline: the CDC path itself (decode-only events/sec and end-to-end
decode→dedup→reduce→MERGE events/sec on a generated binlog fixture scaled
to the SF), plus the relational / dedup / ANN suite on the driver testdata.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default all cores).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or os.cpu_count() or 8)
    sf_name = os.path.basename(os.path.normpath(sf_dir))

    from binlog_spark.session import get_spark, ship_package
    spark = get_spark("binlog-spark-bench", cores=cores,
                      shuffle_partitions=max(cores, 16))
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)

    from binlog_spark.cdc.pipeline import final_state, reduce_changes
    from binlog_spark.cdc.replay import replay
    from binlog_spark.decoder.chunks import chunks_df, read_manifest
    from binlog_spark.decoder.kernel import decode_changes
    from binlog_spark.ops import (binlog_demo, cdc_events, dedup, relational,
                                  similarity, text)

    dump = binlog_demo.ensure_fixture(sf_dir)
    n_changes = read_manifest(dump)["n_changes"]

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def run(name: str, fn) -> None:
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)

    # warm-up (excluded): JVM codegen + one Python worker per core — a
    # cluster pays this once per executor lifetime, not per job
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    decode_changes(chunks_df(spark, dump).limit(cores * 2)).count()

    # --- CDC engine headline ---
    run("binlog_decode",
        lambda: decode_changes(chunks_df(spark, dump)).count())
    extras["decode_events_per_sec"] = round(
        n_changes / timings["binlog_decode"], 1)

    lake_root = f"/tmp/bench_lake_{os.getpid()}"
    shutil.rmtree(lake_root, ignore_errors=True)

    def _apply():
        replay(spark, dump, lake_root, n_buckets=max(cores, 16),
               lineage=False)
    run("binlog_apply_e2e", _apply)
    extras["apply_events_per_sec"] = round(
        n_changes / timings["binlog_apply_e2e"], 1)
    shutil.rmtree(lake_root, ignore_errors=True)

    run("binlog_reduce",
        lambda: final_state(reduce_changes(
            decode_changes(chunks_df(spark, dump)))).count())

    # --- relational / CDC-twin suite ---
    run("q1", lambda: relational.q1_pricing_summary(spark, sf_dir).collect())
    run("q3", lambda: relational.q3_top_orders(spark, sf_dir).collect())
    run("q5", lambda: relational.q5_region_revenue(spark, sf_dir).collect())
    run("top_customers",
        lambda: relational.top_customers(spark, sf_dir).collect())
    run("sessionize",
        lambda: relational.sessionize_events(spark, sf_dir).count())
    run("cdc_apply", lambda: cdc_events.cdc_apply(spark, sf_dir).count())

    # --- training-data ops ---
    run("doc_token_stats", lambda: text.doc_token_stats(spark, sf_dir).count())
    run("doc_minhash_dups",
        lambda: dedup.doc_minhash_dups(spark, sf_dir).count())
    run("ann_bruteforce",
        lambda: similarity.ann_bruteforce_topk(spark, sf_dir).count())

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_name,
        "cores": cores,
        "binlog_changes": n_changes,
        **extras,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
