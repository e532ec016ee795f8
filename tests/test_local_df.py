"""local_df must not lose integer precision above 2^53.

The pandas fast path coerces int+None columns to float64 unless the
integral columns are rebuilt as nullable Int64; a rounded pack_ord
(file_no >= 256 packs past 2^53) silently shifts the dead-generation
boundary in the MINIMAL closure (ADVICE r5, high)."""

from __future__ import annotations

from binlog_spark.session import local_df


def test_nullable_bigint_exact(spark):
    # pack_ord-style values: file_no << 45 | log_pos << 15 | seq
    big = (300 << 45) | (12345 << 15) | 7    # > 2^53, odd low bits
    rows = [(1, big, None), (2, big + 1, big + 3), (3, None, big - 5)]
    df = local_df(spark, rows, "k INT, m_ord BIGINT, arr_ord BIGINT")
    got = {r["k"]: (r["m_ord"], r["arr_ord"]) for r in df.collect()}
    assert got == {1: (big, None), 2: (big + 1, big + 3),
                   3: (None, big - 5)}
    # still a JVM-local relation, not a pickled-RDD scan
    assert "LocalTableScan" in df._jdf.queryExecution().executedPlan().toString()


def test_empty_and_decimal_paths(spark):
    assert local_df(spark, [], "a BIGINT").count() == 0
    df = local_df(spark, [(1, 10**20)], "k INT, v DECIMAL(38,0)")
    assert df.collect()[0]["v"] == 10**20
