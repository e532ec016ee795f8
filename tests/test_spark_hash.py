"""Bit-exactness of the pure-Python XXH64 reimplementation against
Spark's ``F.xxhash64`` — the foundation of every hash-dependent oracle
(SimHash / MinHash / LSH golden parquet)."""

from __future__ import annotations

import random
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from binlog_spark.functions import spark_hash as sh


def test_strings_match_spark(spark):
    rnd = random.Random(1)
    strs = ["", "a", "hello world", "x" * 7, "y" * 8, "z" * 31, "w" * 32,
            "v" * 100, "üñïçø∂é",
            *(f"tok{rnd.randrange(10 ** 9)}" for _ in range(40))]
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    got = [r[0] for r in df.select(F.xxhash64("s")).collect()]
    assert got == [sh.xxhash64(s) for s in strs]


def test_longs_and_ints_match_spark(spark):
    rnd = random.Random(2)
    longs = [0, 1, -1, 2 ** 62, -2 ** 62,
             *(rnd.randrange(-2 ** 63, 2 ** 63) for _ in range(40))]
    df = spark.createDataFrame([(v,) for v in longs], "v long")
    got = [r[0] for r in df.select(F.xxhash64("v")).collect()]
    assert got == [sh.xxhash64(v) for v in longs]

    ints = [0, 1, -1, 2 ** 31 - 1, -2 ** 31,
            *(rnd.randrange(-2 ** 31, 2 ** 31) for _ in range(40))]
    df = spark.createDataFrame([(v,) for v in ints], "v int")
    got = [r[0] for r in df.select(F.xxhash64("v")).collect()]
    assert got == [sh.xxhash64(("int", v)) for v in ints]


def test_chaining_and_nulls_match_spark(spark):
    rnd = random.Random(3)
    # int literal seed + string column — the MinHash shape
    strs = [f"shingle {i} {rnd.randrange(100)}" for i in range(20)]
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    got = [r[0] for r in df.select(F.xxhash64(F.lit(7), "s")).collect()]
    assert got == [sh.xxhash64(("int", 7), s) for s in strs]

    # 8 chained longs — the LSH band-bucket shape
    rows = [tuple(rnd.randrange(-2 ** 63, 2 ** 63) for _ in range(8))
            for _ in range(10)]
    df = spark.createDataFrame(
        rows, ", ".join(f"c{i} long" for i in range(8)))
    got = [r[0] for r in
           df.select(F.xxhash64(*[f"c{i}" for i in range(8)])).collect()]
    assert got == [sh.xxhash64(*row) for row in rows]

    # NULLs are skipped, not hashed
    df = spark.createDataFrame([("a", None), (None, None)],
                               "s string, t string")
    got = [r[0] for r in df.select(F.xxhash64("s", "t")).collect()]
    assert got == [sh.xxhash64("a", None), sh.xxhash64(None, None)]


def test_java_mod():
    assert sh.java_mod(7, 3) == 1
    assert sh.java_mod(-7, 3) == -1
    assert sh.java_mod(7, -3) == 1
    assert sh.java_mod(-7, -3) == -1
