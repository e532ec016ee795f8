#!/usr/bin/env bash
# End-to-end spark-submit --py-files demonstration (north-rule surface):
# generate a fixture, package the engine, submit the replay job with a
# cluster-shaped invocation, and verify the final state digest.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
DUMP="${1:-/tmp/submit_demo_dump}"
LAKE="${2:-/tmp/submit_demo_lake}"
CORES="${SPARK_GRAFT_CPUS:-8}"

python - <<PY
import sys; sys.path.insert(0, "$REPO")
import os
from binlog_spark.mysql import gen
if not os.path.exists("$DUMP/manifest.json"):
    gen.generate("$DUMP", gen.GenConfig(n_changes=20000), chunk_target=1<<20)
# build the py-files zip the way ship_package does, at a stable path
import zipfile
pkg = os.path.join("$REPO", "binlog_spark")
with zipfile.ZipFile("/tmp/binlog_spark_pkg.zip", "w") as z:
    for root, _d, files in os.walk(pkg):
        for n in files:
            if n.endswith(".py"):
                full = os.path.join(root, n)
                z.write(full, os.path.relpath(full, "$REPO"))
print("packaged /tmp/binlog_spark_pkg.zip")
PY

rm -rf "$LAKE"
spark-submit --master "local[$CORES]" \
  --conf spark.sql.shuffle.partitions="$CORES" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.ui.enabled=false \
  --py-files /tmp/binlog_spark_pkg.zip \
  "$REPO/tools/submit_job.py" "$DUMP" "$LAKE"

python - <<PY
import sys; sys.path.insert(0, "$REPO")
from binlog_spark.mysql import oracle
from binlog_spark.cdc.pipeline import state_fingerprint
from binlog_spark.lake.table import LakeTable
from binlog_spark.session import get_spark_shipped
want = oracle.state_digest(oracle.final_state("$DUMP"))
spark = get_spark_shipped("verify", cores=4)
spark.sparkContext.setLogLevel("ERROR")
got = state_fingerprint(LakeTable("$LAKE").read(spark))
print("digest match:", got == want)
assert got == want
spark.stop()
PY
