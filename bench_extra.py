"""Side benchmark harness for optimization work (bench.py is frozen).

Runs any subset of the headline queries with the same calls as bench.py,
but each sample also records the process-tree CPU seconds (JVM + Python
workers) so external host steal (wall up, CPU flat) is distinguishable
from real work changes (CPU up).  Gated on the /proc/stat busy-core
delta like bench.py.

Usage:
    python bench_extra.py [query ...]        # default: all
    SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... REPEAT=3 python bench_extra.py
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "tools"))


def tree_cpu_sec() -> float:
    """utime+stime of this process tree (JVM + every Python worker)."""
    hz = os.sysconf("SC_CLK_TCK")
    procs = {}
    for path in glob.glob("/proc/[0-9]*/stat"):
        try:
            raw = open(path).read()
            pid_part, rest = raw.rsplit(")", 1)
            pid = int(pid_part.split(" ", 1)[0])
            f = rest.split()
            procs[pid] = (int(f[1]),
                          (int(f[11]) + int(f[12])
                           + int(f[13]) + int(f[14])) / hz)
        except Exception:
            pass
    kids = {os.getpid()}
    grew = True
    while grew:
        grew = False
        for pid, (ppid, _) in procs.items():
            if ppid in kids and pid not in kids:
                kids.add(pid)
                grew = True
    return sum(procs[p][1] for p in kids if p in procs)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = (int(os.environ.get("SPARK_GRAFT_CPUS") or 0)
             or os.cpu_count() or 8)
    repeat = int(os.environ.get("REPEAT", "1"))
    only = set(sys.argv[1:])

    from bench_scaling import ext_busy_cores, wait_quiet

    from binlog_spark.session import get_spark, ship_package
    spark = get_spark("binlog-spark-bench-extra", cores=cores,
                      shuffle_partitions=max(cores, 16))
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)

    from binlog_spark.cdc.multi import replay_generic
    from binlog_spark.cdc.pipeline import (final_state, reduce_changes,
                                           scan_extra_columns)
    from binlog_spark.cdc.replay import replay
    from binlog_spark.decoder.chunks import chunks_df, read_manifest
    from binlog_spark.decoder.kernel import decode_changes
    from binlog_spark.mysql.gen_multi import generate_multi
    from binlog_spark.ops import (binlog_demo, cdc_events, dedup, relational,
                                  similarity, text)

    dump = binlog_demo.ensure_fixture(sf_dir)
    read_manifest(dump)["n_changes"]
    sf_name = os.path.basename(os.path.normpath(sf_dir))

    lake_root = f"/tmp/bext_lake_{os.getpid()}"

    def _apply():
        shutil.rmtree(lake_root, ignore_errors=True)
        replay(spark, dump, lake_root, n_buckets=max(cores, 16),
               lineage=False)

    multi_changes = {"sf0.001": 5000, "sf0.01": 20000}.get(sf_name, 100_000)
    multi_dump = f"/tmp/bench_multi_{multi_changes}"
    if not os.path.exists(os.path.join(multi_dump, "manifest.json")):
        generate_multi(multi_dump, n_changes=multi_changes, seed=3)
    multi_lake = f"/tmp/bext_mlake_{os.getpid()}"

    def _multi():
        shutil.rmtree(multi_lake, ignore_errors=True)
        replay_generic(spark, multi_dump, multi_lake)

    def _reduce():
        spans = [tuple(r) for r in chunks_df(spark, dump).collect()]
        final_state(reduce_changes(decode_changes(chunks_df(spark, dump))),
                    extra_names=scan_extra_columns(spans)).count()

    queries = {
        "binlog_decode":
            lambda: decode_changes(chunks_df(spark, dump)).count(),
        "binlog_apply_e2e": _apply,
        "binlog_reduce": _reduce,
        "binlog_multi_replay": _multi,
        "binlog_minimal_replay":
            lambda: binlog_demo.binlog_minimal_state(spark, sf_dir).count(),
        "binlog_multi_minimal":
            lambda: binlog_demo.binlog_multi_minimal(spark, sf_dir).count(),
        "binlog_typed_decode":
            lambda: binlog_demo.binlog_typed_decode(spark, sf_dir).count(),
        "binlog_statements":
            lambda: binlog_demo.binlog_statement_events(spark,
                                                        sf_dir).count(),
        "q1": lambda: relational.q1_pricing_summary(spark, sf_dir).collect(),
        "q3": lambda: relational.q3_top_orders(spark, sf_dir).collect(),
        "q5": lambda: relational.q5_region_revenue(spark, sf_dir).collect(),
        "top_customers":
            lambda: relational.top_customers(spark, sf_dir).collect(),
        "sessionize":
            lambda: relational.sessionize_events(spark, sf_dir).count(),
        "cdc_apply": lambda: cdc_events.cdc_apply(spark, sf_dir).count(),
        "doc_token_stats":
            lambda: text.doc_token_stats(spark, sf_dir).count(),
        "doc_minhash_dups":
            lambda: dedup.doc_minhash_dups(spark, sf_dir).count(),
        "ann_bruteforce":
            lambda: similarity.ann_bruteforce_topk(spark, sf_dir).count(),
    }

    # warm-up mirrors bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    decode_changes(chunks_df(spark, dump)).count()

    results = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        samples = []
        for _ in range(repeat):
            busy = wait_quiet(timeout=60)
            c0 = tree_cpu_sec()
            t0 = time.time()
            fn()
            wall = round(time.time() - t0, 3)
            cpu = round(tree_cpu_sec() - c0, 2)
            post = ext_busy_cores(interval=1.0)
            samples.append({"wall": wall, "cpu": cpu,
                            "ext": round(max(busy, post), 2)})
        results[name] = samples
        print(json.dumps({name: samples}), flush=True)

    shutil.rmtree(lake_root, ignore_errors=True)
    shutil.rmtree(multi_lake, ignore_errors=True)
    spark.stop()
    best = {n: min(s["wall"] for s in v) for n, v in results.items()}
    print(json.dumps({"metric": "bench_extra", "queries": best,
                      "sf": sf_name, "cores": cores,
                      "value": round(sum(best.values()), 3)}))


if __name__ == "__main__":
    main()
