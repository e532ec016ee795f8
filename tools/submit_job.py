"""A literal ``spark-submit --py-files`` entry point (the north rule's
deployment surface): replays a dump dir into a lake table and prints one
JSON status line.

    # package the engine (also done automatically by ship_package):
    python - <<'PY'
    from binlog_spark.session import ship_package  # builds the zip
    PY
    spark-submit --py-files /tmp/binlog_spark_<pid>.zip \
        tools/submit_job.py DUMP_DIR LAKE_ROOT [--minimal] [--batch-chunks N]

On a real cluster the session comes from spark-submit's conf (master,
executors); this script only *uses* the provided session — no
local[...] assumptions.  The same code path is what `python -m
binlog_spark replay` and the tests drive; see tools/submit_demo.sh for
an end-to-end run against a generated fixture.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("dump_dir")
    p.add_argument("lake_root")
    p.add_argument("--batch-chunks", type=int, default=None)
    p.add_argument("--buckets", type=int, default=32)
    p.add_argument("--minimal", action="store_true")
    args = p.parse_args()

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName("binlog-spark-replay").getOrCreate()
    # ship the package to executors even if --py-files was forgotten
    # (idempotent when it wasn't)
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from binlog_spark.cdc.replay import replay_throughput
    from binlog_spark.session import ship_package
    ship_package(spark)
    res = replay_throughput(spark, args.dump_dir, args.lake_root,
                            chunks_per_batch=args.batch_chunks,
                            n_buckets=args.buckets,
                            minimal_images=args.minimal)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
