"""wide_order through the multi-table path (ADVICE r5, medium): the
generic per-table reductions must honor the unclamped DECIMAL order when
a transaction exceeds the 32767 seq clamp."""

from __future__ import annotations

from binlog_spark.cdc.multi import table_upserts


def _staged(spark, rows):
    from pyspark.sql.types import (ArrayType, BooleanType, IntegerType,
                                   LongType, StringType, StructField,
                                   StructType)
    schema = StructType([
        StructField("op", StringType()),
        StructField("before_vals", ArrayType(StringType())),
        StructField("after_vals", ArrayType(StringType())),
        StructField("before_present", StringType()),
        StructField("after_present", StringType()),
        StructField("gtid", StringType()),
        StructField("seq_in_tx", IntegerType()),
        StructField("log_file", StringType()),
        StructField("log_pos", LongType()),
        StructField("ts_sec", LongType()),
        StructField("crc_ok", BooleanType()),
    ])
    return spark.createDataFrame(rows, schema)


def test_wide_order_resolves_beyond_seq_clamp(spark):
    # two updates to ONE key inside one huge transaction, both beyond
    # the 32767 clamp: narrow order ties (arbitrary winner), wide picks
    # the later seq
    rows = [
        ("I", None, ["1", "old"], None, None, "g:1", 100,
         "bin.000001", 1000, 0, True),
        ("U", ["1", "old"], ["1", "mid"], None, None, "g:1", 39000,
         "bin.000001", 1000, 0, True),
        ("U", ["1", "mid"], ["1", "new"], None, None, "g:1", 40000,
         "bin.000001", 1000, 0, True),
    ]
    staged = _staged(spark, rows)
    up = table_upserts(staged, ["id", "val"], ["id"], wide_order=True)
    got = {r.id: r.val for r in up.collect()}
    assert got == {"1": "new"}


def test_replay_generic_signature_accepts_wide_order():
    import inspect

    from binlog_spark.cdc import multi
    for fn in (multi.replay_generic, multi.apply_staged_batch,
               multi.table_upserts, multi.table_upserts_minimal):
        assert "wide_order" in inspect.signature(fn).parameters
