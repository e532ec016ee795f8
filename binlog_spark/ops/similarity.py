"""Similarity search over the ``embeddings`` table (array<float> column).

Baseline: brute-force cosine top-k with built-in higher-order functions
(zip_with + aggregate — JVM-side, no Python).  Scale path: random-
hyperplane LSH bucketing so each query only scans its bucket (+ optional
multi-probe), the standard recall/cost trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # cast to double so both engines accumulate in f64 (determinism of the
    # rounded cosine + rank vs the DuckDB oracle)
    return (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .withColumn("embedding", F.col("embedding").cast("array<double>")))


def _dot(a: str, b: str) -> F.Column:
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0).cast("double"), lambda acc, v: acc + v)


def _norm(c: str) -> F.Column:
    return F.sqrt(F.aggregate(F.col(c), F.lit(0.0).cast("double"),
                              lambda acc, v: acc + v * v))


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str,
                        n_queries: int = 5, k: int = 3) -> DataFrame:
    """Exact cosine top-k for the first ``n_queries`` vectors (self
    excluded).  The query side is broadcast — the corpus is scanned once."""
    emb = _emb(spark, sf_dir)
    q = (emb.filter(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("q_id"),
                 F.col("embedding").alias("q_emb")))
    pairs = (emb.crossJoin(F.broadcast(q))
             .filter(F.col("vec_id") != F.col("q_id"))
             .select("q_id", "vec_id",
                     (_dot("embedding", "q_emb")
                      / (_norm("embedding") * _norm("q_emb"))).alias("cos")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (pairs.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("q_id", "rank", "vec_id", F.round("cos", 4).alias("cos"))
            .orderBy("q_id", "rank"))


N_PLANES = 8


def _lsh_bucket(emb_col: str, dim: int) -> F.Column:
    """Sign bits against deterministic pseudo-random hyperplanes.

    Plane weights come from a hash of (plane, coordinate) — identical on
    every executor with zero driver-side state to broadcast."""
    bucket = F.lit(0).cast("long")
    for p in range(N_PLANES):
        proj = F.aggregate(
            F.zip_with(
                F.col(emb_col),
                F.transform(F.sequence(F.lit(0), F.lit(dim - 1)),
                            lambda i: ((F.xxhash64(F.lit(p), i) % 1000)
                                       .cast("double") / 500.0 - 1.0)),
                lambda x, y: x * y),
            F.lit(0.0).cast("double"), lambda acc, v: acc + v)
        bucket = bucket + F.when(proj > 0, F.lit(2 ** p)).otherwise(0)
    return bucket


def ann_lsh_topk(spark: SparkSession, sf_dir: str,
                 n_queries: int = 5, k: int = 3) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.
    Rows-only oracle (bucketing is hash-dependent); recall vs. brute force
    is asserted in tests."""
    emb = _emb(spark, sf_dir)
    dim = len(emb.select("embedding").first()[0])
    bucketed = emb.withColumn("bucket", _lsh_bucket("embedding", dim))
    q = (bucketed.filter(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("q_id"),
                 F.col("embedding").alias("q_emb"),
                 F.col("bucket").alias("q_bucket")))
    pairs = (bucketed.join(F.broadcast(q),
                           (F.col("bucket") == F.col("q_bucket"))
                           & (F.col("vec_id") != F.col("q_id")))
             .select("q_id", "vec_id",
                     (_dot("embedding", "q_emb")
                      / (_norm("embedding") * _norm("q_emb"))).alias("cos")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (pairs.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("q_id", "rank", "vec_id", F.round("cos", 4).alias("cos"))
            .orderBy("q_id", "rank"))


def embedding_neardup(spark: SparkSession, sf_dir: str,
                      threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within LSH buckets."""
    emb = _emb(spark, sf_dir)
    dim = len(emb.select("embedding").first()[0])
    b = emb.withColumn("bucket", _lsh_bucket("embedding", dim))
    l, r = b.alias("l"), b.alias("r")
    return (l.join(r, (F.col("l.bucket") == F.col("r.bucket"))
                   & (F.col("l.vec_id") < F.col("r.vec_id")))
            .select(F.col("l.vec_id").alias("vec_a"),
                    F.col("r.vec_id").alias("vec_b"),
                    (F.aggregate(F.zip_with(F.col("l.embedding"),
                                            F.col("r.embedding"),
                                            lambda x, y: x * y),
                                 F.lit(0.0).cast("double"),
                                 lambda acc, v: acc + v)
                     / (F.sqrt(F.aggregate(F.col("l.embedding"),
                                           F.lit(0.0).cast("double"),
                                           lambda a, v: a + v * v))
                        * F.sqrt(F.aggregate(F.col("r.embedding"),
                                             F.lit(0.0).cast("double"),
                                             lambda a, v: a + v * v)))
                     ).alias("cos"))
            .filter(F.col("cos") >= threshold)
            .select("vec_a", "vec_b", F.round("cos", 4).alias("cos"))
            .orderBy("vec_a", "vec_b"))
