"""SparkSession factory with the engine's tuned defaults.

Scale posture (SURVEY §4): AQE on (runtime coalescing + skew-join
splitting), explicit shuffle partitioning sized to cores, Arrow enabled for
the pandas-UDF decode path.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def ship_package(spark: SparkSession) -> str:
    """Ship binlog_spark to executors (the `spark-submit --py-files` story,
    BASELINE.json:6).  Required whenever the driver's cwd isn't the repo
    root — executor workers re-import the package by name."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(tempfile.gettempdir(),
                         f"binlog_spark_{os.getpid()}.zip")
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for root, _dirs, files in os.walk(pkg_dir):
                for name in files:
                    if name.endswith(".py"):
                        full = os.path.join(root, name)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        z.write(full, rel)
    spark.sparkContext.addPyFile(zpath)
    return zpath


def get_spark(app: str = "binlog-spark", cores: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 8)
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    return (
        SparkSession.builder
        .master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def get_spark_shipped(app: str = "binlog-spark", cores: int | None = None,
                      shuffle_partitions: int | None = None) -> SparkSession:
    spark = get_spark(app, cores, shuffle_partitions)
    ship_package(spark)
    return spark
