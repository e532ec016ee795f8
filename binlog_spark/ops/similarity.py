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


N_PLANES = 6   # bits per table
N_TABLES = 4   # independent hash tables (multi-table LSH: recall compounds)


def _lsh_bucket(emb_col: str, dim: int, table: int = 0) -> F.Column:
    """Sign bits against deterministic pseudo-random hyperplanes.

    Plane weights come from a hash of (table, plane, coordinate) —
    identical on every executor with zero driver-side state to
    broadcast."""
    bucket = F.lit(0).cast("long")
    for p in range(N_PLANES):
        seed = table * N_PLANES + p
        proj = F.aggregate(
            F.zip_with(
                F.col(emb_col),
                F.transform(F.sequence(F.lit(0), F.lit(dim - 1)),
                            lambda i, s=seed: ((F.xxhash64(F.lit(s), i) % 1000)
                                               .cast("double") / 500.0 - 1.0)),
                lambda x, y: x * y),
            F.lit(0.0).cast("double"), lambda acc, v: acc + v)
        bucket = bucket + F.when(proj > 0, F.lit(2 ** p)).otherwise(0)
    return bucket


def _lsh_tables(emb: DataFrame, dim: int) -> DataFrame:
    """(vec_id, embedding, table, bucket) — one row per hash table."""
    entries = F.array(*[
        F.struct(F.lit(t).alias("table"),
                 _lsh_bucket("embedding", dim, t).alias("bucket"))
        for t in range(N_TABLES)])
    return (emb.select("vec_id", "embedding",
                       F.explode(entries).alias("e"))
            .select("vec_id", "embedding",
                    F.col("e.table").alias("table"),
                    F.col("e.bucket").alias("bucket")))


def ann_lsh_topk(spark: SparkSession, sf_dir: str,
                 n_queries: int = 5, k: int = 3) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH: a
    candidate qualifies if it shares ANY table's bucket with the query
    (recall compounds across tables: 1-(1-p^bits)^tables).  Rows-only
    oracle (hash-dependent); recall vs. brute force asserted in tests."""
    emb = _emb(spark, sf_dir)
    dim = len(emb.select("embedding").first()[0])
    tabs = _lsh_tables(emb, dim)
    q = (tabs.filter(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("q_id"),
                 F.col("embedding").alias("q_emb"),
                 "table", F.col("bucket").alias("q_bucket")))
    cand = (tabs.join(F.broadcast(q),
                      (tabs.table == q.table)
                      & (F.col("bucket") == F.col("q_bucket"))
                      & (F.col("vec_id") != F.col("q_id")))
            .select("q_id", "vec_id", "embedding", "q_emb")
            .dropDuplicates(["q_id", "vec_id"]))
    pairs = cand.select(
        "q_id", "vec_id",
        (_dot("embedding", "q_emb")
         / (_norm("embedding") * _norm("q_emb"))).alias("cos"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (pairs.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("q_id", "rank", "vec_id", F.round("cos", 4).alias("cos"))
            .orderBy("q_id", "rank"))


N_CELLS = 16
KMEANS_ITERS = 2


def _ivf_assign(spark: SparkSession, emb: DataFrame, dim: int) -> tuple:
    """IVF coarse quantizer: k-means-lite centroids (deterministic seed
    vectors = the first N_CELLS embeddings, 2 Lloyd iterations, all
    DataFrame ops), returns (assigned DF with 'cell', centroids list)."""
    cents = [list(r.embedding) for r in
             emb.orderBy("vec_id").limit(N_CELLS).collect()]
    for _ in range(KMEANS_ITERS):
        cent_lit = F.array(*[
            F.array(*[F.lit(float(x)) for x in c]) for c in cents])
        dists = F.transform(
            cent_lit,
            lambda c: F.aggregate(
                F.zip_with(F.col("embedding"), c,
                           lambda x, y: (x - y) * (x - y)),
                F.lit(0.0).cast("double"), lambda a, v: a + v))
        assigned = emb.withColumn("d", dists).withColumn(
            "cell",
            (F.array_position(F.col("d"), F.array_min(F.col("d"))) - 1)
            .cast("int")).drop("d")
        # recompute centroids: mean per cell per coordinate
        sums = (assigned.groupBy("cell")
                .agg(F.count("*").alias("n"),
                     *[F.sum(F.element_at("embedding", i + 1)).alias(f"s{i}")
                       for i in range(dim)])
                .collect())
        new_cents = list(cents)
        for r in sums:
            new_cents[r.cell] = [r[f"s{i}"] / r.n for i in range(dim)]
        cents = new_cents
    cent_lit = F.array(*[
        F.array(*[F.lit(float(x)) for x in c]) for c in cents])
    dists = F.transform(
        cent_lit,
        lambda c: F.aggregate(
            F.zip_with(F.col("embedding"), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0).cast("double"), lambda a, v: a + v))
    assigned = emb.withColumn("d", dists).withColumn(
        "cell",
        (F.array_position(F.col("d"), F.array_min(F.col("d"))) - 1)
        .cast("int")).drop("d")
    return assigned, cents


def ann_ivf_topk(spark: SparkSession, sf_dir: str,
                 n_queries: int = 5, k: int = 3,
                 n_probe: int = 4) -> DataFrame:
    """IVF ANN: corpus partitioned into coarse cells; each query scans only
    its ``n_probe`` nearest cells.  The scale path where LSH recall is too
    hash-lucky: cell assignment is data-adaptive.  Rows-only oracle;
    recall vs brute force asserted in tests."""
    emb = _emb(spark, sf_dir)
    dim = len(emb.select("embedding").first()[0])
    assigned, cents = _ivf_assign(spark, emb, dim)
    q = (assigned.filter(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("q_id"),
                 F.col("embedding").alias("q_emb")))
    # per-query probe cells (driver-side: n_queries × N_CELLS is tiny)
    import math
    qrows = q.collect()
    probe_rows = []
    for r in qrows:
        d2 = [(sum((a - b) * (a - b) for a, b in zip(r.q_emb, c)), i)
              for i, c in enumerate(cents)]
        for _, cell in sorted(d2)[:n_probe]:
            probe_rows.append((r.q_id, cell))
    probes = spark.createDataFrame(probe_rows, "q_id long, cell int")
    cand = (assigned.join(F.broadcast(probes), "cell")
            .filter(F.col("vec_id") != F.col("q_id"))
            .join(F.broadcast(q), "q_id")
            .select("q_id", "vec_id",
                    (_dot("embedding", "q_emb")
                     / (_norm("embedding") * _norm("q_emb"))).alias("cos")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (cand.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("q_id", "rank", "vec_id", F.round("cos", 4).alias("cos"))
            .orderBy("q_id", "rank"))


def embedding_neardup(spark: SparkSession, sf_dir: str,
                      threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within multi-table LSH
    buckets (a pair qualifies if it collides in any table)."""
    emb = _emb(spark, sf_dir)
    dim = len(emb.select("embedding").first()[0])
    b = _lsh_tables(emb, dim)
    l, r = b.alias("l"), b.alias("r")
    pairs = (l.join(r, (F.col("l.table") == F.col("r.table"))
                    & (F.col("l.bucket") == F.col("r.bucket"))
                    & (F.col("l.vec_id") < F.col("r.vec_id")))
             .select(F.col("l.vec_id").alias("vec_a"),
                     F.col("r.vec_id").alias("vec_b"),
                     F.col("l.embedding").alias("ea"),
                     F.col("r.embedding").alias("eb"))
             .dropDuplicates(["vec_a", "vec_b"]))
    cos = (F.aggregate(F.zip_with("ea", "eb", lambda x, y: x * y),
                       F.lit(0.0).cast("double"), lambda a, v: a + v)
           / (F.sqrt(F.aggregate("ea", F.lit(0.0).cast("double"),
                                 lambda a, v: a + v * v))
              * F.sqrt(F.aggregate("eb", F.lit(0.0).cast("double"),
                                   lambda a, v: a + v * v))))
    return (pairs.withColumn("cos", cos)
            .filter(F.col("cos") >= threshold)
            .select("vec_a", "vec_b", F.round("cos", 4).alias("cos"))
            .orderBy("vec_a", "vec_b"))
