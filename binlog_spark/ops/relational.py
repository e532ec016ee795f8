"""Relational operator coverage over the driver testdata (SURVEY §2 Table B).

The reference has no relational operators (it's a protocol decoder); these
queries evidence the engine-side Spark primitives the CDC pipeline is built
from — scans, filters, broadcast + shuffle joins, aggregations, windows,
sorts/limits — each with a DuckDB-oracle twin in __spark_entry__.py.

Scale notes: small dims (region, nation, customer at these SFs) are
broadcast explicitly; aggregates go through partial (map-side) combine;
top-k uses sort+limit (TakeOrderedAndProject), not a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single-scan aggregate with map-side combine."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))
                               * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
                 F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                 F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
                 F.round(F.avg("l_discount"), 4).alias("avg_disc"),
                 F.count("*").alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: broadcast dim filter + shuffle join + top-k."""
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01"))
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01"))
    # dim filter BEFORE the fact shuffle: broadcast-semi the BUILDING
    # customers into orders first, so the lineitem⋈orders exchange moves
    # only qualifying orders (guide §2.3: shuffle fewer bytes)
    orders = orders.join(F.broadcast(cust),
                         orders.o_custkey == cust.c_custkey)
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("l_orderkey",
                     F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"))
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2).alias("revenue"))
            .orderBy(F.desc("revenue"), "l_orderkey")
            .limit(10))


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join, dims broadcast, revenue per nation."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1999-01-01")))
    li = _t(spark, sf_dir, "lineitem")
    # restrict suppliers to ASIA nations BEFORE the fact joins (the
    # region/nation dims broadcast into supplier, not into the joined
    # fact stream): the supplier join then probes 1/5 the rows and the
    # post-join stream never carries non-ASIA rows (guide §2.3)
    supp_asia = (supp
                 .join(F.broadcast(nation),
                       supp.s_nationkey == nation.n_nationkey)
                 .join(F.broadcast(region),
                       nation.n_regionkey == region.r_regionkey)
                 .select("s_suppkey", "s_nationkey", "n_name"))
    return (li
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .join(supp_asia, (li.l_suppkey == supp_asia.s_suppkey)
                  & (cust.c_nationkey == supp_asia.s_nationkey))
            .groupBy("n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2).alias("revenue"))
            .orderBy(F.desc("revenue"), "n_name"))


def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function coverage: dense_rank over aggregated spend.

    Top-k FIRST (sort+limit → TakeOrderedAndProject, like q3), THEN the
    rank window over just those k rows: the previous global dense_rank
    funnelled every per-customer aggregate through one window partition
    (VERDICT r5 #7).  The window's order key includes the unique
    c_custkey, so there are no ties and the first 10 dense_ranks over
    the full set equal the ranks over the top-10 — same rows, same
    ranks."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    spend = (orders.groupBy("o_custkey")
             .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
                  F.count("*").alias("n_orders")))
    top = (spend.join(F.broadcast(cust), spend.o_custkey == cust.c_custkey)
           .select(F.col("c_custkey"), F.col("c_name"),
                   F.col("c_mktsegment"), F.col("total_spend"),
                   F.col("n_orders"))
           .orderBy(F.desc("total_spend"), F.asc("c_custkey"))
           .limit(10))
    return (top.withColumn("spend_rank",
                           F.dense_rank().over(
                               Window.orderBy(F.desc("total_spend"),
                                              F.asc("c_custkey")))
                           .cast("long"))
            .filter(F.col("spend_rank") <= 10)
            .orderBy("spend_rank"))


def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-style semi join (TPC-H Q4 shape)."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1997-07-01")))
    li = (_t(spark, sf_dir, "lineitem")
          .filter(F.col("l_returnflag") == "R")
          .select("l_orderkey").distinct())
    return (orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("order_count"))
            .orderBy("o_orderpriority"))


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful window coverage: gap-based sessionization (30 min) —
    the batch shape of the streaming session operator."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (F.unix_timestamp("ts")
           - F.unix_timestamp(F.lag("ts").over(w))).alias("gap")
    marked = ev.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull(), 1)
        .when(F.unix_timestamp("ts")
              - F.unix_timestamp(F.lag("ts").over(w)) > 1800, 1)
        .otherwise(0))
    return (marked.groupBy("user_id")
            .agg(F.sum("new_session").cast("long").alias("n_sessions"),
                 F.count("*").alias("n_events"))
            .orderBy("user_id"))
