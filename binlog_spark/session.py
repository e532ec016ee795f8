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
    # Size the JVM for local[cores], not for the whole host: without
    # ActiveProcessorCount the JVM sees every logical CPU and sizes GC
    # workers / ForkJoin / netty pools for all of them, so at
    # local[N < host] those service threads COMPETE with the N task
    # threads instead of riding spare cores — measured +16% CPU/event at
    # local[16] on a 32-logical host, which reads as a fake N→4N scaling
    # loss.  A real cluster executor runs in a cgroup where the JVM sees
    # exactly its own cores; this reproduces that.  Worker-side math
    # libraries are pinned to one thread each for the same reason (one
    # Python worker per task thread already saturates the allotment).
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
                "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    return (
        SparkSession.builder
        .master(f"local[{cores}]")
        .appName(app)
        .config("spark.driver.extraJavaOptions",
                f"-XX:ActiveProcessorCount={cores}")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # zstd lake/staging files: −38% bytes vs snappy on the CDC state
        # table (130 → 80 MB at sf0.1) at the same measured write wall —
        # guide §6; results are format-identical
        .config("spark.sql.parquet.compression.codec", "zstd")
        # PySpark 4 captures a user call site on every DataFrame API call
        # to enrich error messages: a Python stack walk plus one py4j
        # round-trip EACH (pyspark.errors.utils._capture_call_site) —
        # profiled at ~1.2 s of driver time on one cold replay query
        # (~400 wrapped calls × ~3 ms, plus a one-time IPython import it
        # drags in).  Pure diagnostics; results are unaffected.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
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


def local_df(spark: SparkSession, rows: list, ddl: str):
    """Small driver-side rowset → a LocalRelation-backed DataFrame.

    ``createDataFrame(list-of-rows)`` plans a pickled-Python-RDD scan
    that restarts Python workers on EVERY action referencing the frame
    (~0.3-0.7 s each at local[32]); routing through pandas + Arrow
    yields a JVM LocalTableScan instead.  DECIMAL columns are converted
    to ``decimal.Decimal`` up front (Arrow refuses raw ints there);
    any conversion surprise falls back to the slow-but-sure list path."""
    from pyspark.sql.types import (ByteType, DecimalType, IntegerType,
                                   LongType, ShortType, _parse_datatype_string)
    st = _parse_datatype_string(ddl)
    if not rows:
        return spark.createDataFrame([], st)
    try:
        import decimal

        import pandas as pd
        names = [f.name for f in st.fields]
        raw = list(rows)
        pdf = pd.DataFrame(raw, columns=names)
        for i, f in enumerate(st.fields):
            if isinstance(f.dataType, DecimalType):
                pdf[f.name] = pdf[f.name].map(
                    lambda v: None if v is None else decimal.Decimal(int(v)))
            elif isinstance(f.dataType, (ByteType, ShortType, IntegerType,
                                         LongType)):
                # the pd.DataFrame constructor infers float64 for int
                # columns containing None, silently rounding values above
                # 2^53 (e.g. pack_ord with file_no >= 256); rebuild the
                # column from the raw Python ints as nullable Int64
                pdf[f.name] = pd.array([r[i] for r in raw], dtype="Int64")
        return spark.createDataFrame(pdf, st)
    except Exception:
        return spark.createDataFrame(rows, st)
