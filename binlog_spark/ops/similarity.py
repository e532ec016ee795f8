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
    excluded).  The query side is broadcast — the corpus is scanned once.

    Norms are projected ONCE per row before the cross join (the same
    fold expression, so the doubles are bit-identical): inlined they
    re-ran per (query, vector) pair — n_queries× the corpus-norm work
    in the interpreted higher-order fold.  The corpus scan is spread to
    full width first (a single small parquet file plans as one split)."""
    from .dedup import _spread
    emb = _spread(spark, _emb(spark, sf_dir))
    q = (emb.filter(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("q_id"),
                 F.col("embedding").alias("q_emb"),
                 _norm("embedding").alias("q_nrm")))
    corp = emb.select("vec_id", "embedding", _norm("embedding").alias("nrm"))
    pairs = (corp.crossJoin(F.broadcast(q))
             .filter(F.col("vec_id") != F.col("q_id"))
             .select("q_id", "vec_id",
                     (_dot("embedding", "q_emb")
                      / (F.col("nrm") * F.col("q_nrm"))).alias("cos")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (pairs.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("q_id", "rank", "vec_id", F.round("cos", 4).alias("cos"))
            .orderBy("q_id", "rank"))


N_PLANES = 6   # bits per table
N_TABLES = 4   # independent hash tables (multi-table LSH: recall compounds)


def _plane_weights_expr(seed: int, dim: int) -> F.Column:
    """Deterministic pseudo-random hyperplane: weight_i =
    (pmod(xxhash64(seed, i), 2001) - 1000) / 1000 ∈ [-1, 1], symmetric
    around zero.  NOTE the single-parameter lambda: PySpark dispatches on
    lambda arity, so a two-parameter lambda would silently receive
    (element, index) and clobber a default-argument seed capture — the
    seed must be closed over via this factory function's scope."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: ((F.pmod(F.xxhash64(F.lit(seed), i), F.lit(2001))
                    - F.lit(1000)).cast("double") / 1000.0))


def _lsh_bucket(emb_col: str, dim: int, table: int = 0) -> F.Column:
    """Sign bits against deterministic pseudo-random hyperplanes.

    Plane weights come from a hash of (table, plane, coordinate) —
    identical on every executor with zero driver-side state to
    broadcast."""
    bucket = F.lit(0).cast("long")
    for p in range(N_PLANES):
        proj = F.aggregate(
            F.zip_with(F.col(emb_col),
                       _plane_weights_expr(table * N_PLANES + p, dim),
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


N_PROBE_FLIPS = 2  # extra buckets per table: flip the k lowest-margin bits


def _lsh_query_probes(emb: DataFrame, dim: int,
                      n_flips: int = N_PROBE_FLIPS) -> DataFrame:
    """(q_id, q_emb, table, bucket) — MULTI-PROBE query-side buckets: per
    table, the exact bucket plus ``n_flips`` single-bit flips of the
    hyperplanes with the smallest |projection| (the bits most likely to
    disagree for a true neighbor).  Probing is query-side only, so the
    corpus index stays one row per (vector, table) — recall rises without
    growing the index, the standard multi-probe trade."""
    per_table = []
    for t in range(N_TABLES):
        projs = F.array(*[
            F.aggregate(
                F.zip_with(F.col("embedding"),
                           _plane_weights_expr(t * N_PLANES + p, dim),
                           lambda x, y: x * y),
                F.lit(0.0).cast("double"), lambda acc, v: acc + v)
            for p in range(N_PLANES)])
        per_table.append(F.struct(F.lit(t).alias("table"),
                                  projs.alias("projs")))
    exploded = (emb.select("vec_id", "embedding",
                           F.explode(F.array(*per_table)).alias("e"))
                .select("vec_id", "embedding",
                        F.col("e.table").alias("table"),
                        F.col("e.projs").alias("projs")))
    bucket = F.aggregate(
        F.sequence(F.lit(0), F.lit(N_PLANES - 1)),
        F.lit(0).cast("long"),
        lambda acc, p: acc + F.when(
            F.element_at(F.col("projs"), p + 1) > 0,
            F.pow(F.lit(2.0), p).cast("long")).otherwise(0))
    # lowest-|proj| plane indices: sort (|proj|, idx) structs, take k
    margins = F.array_sort(F.transform(
        F.sequence(F.lit(0), F.lit(N_PLANES - 1)),
        lambda p: F.struct(
            F.abs(F.element_at(F.col("projs"), p + 1)).alias("m"),
            p.alias("idx"))))
    flips = F.transform(F.slice(margins, 1, n_flips),
                        lambda s: s["idx"])
    probes = F.concat(
        F.array(bucket),
        F.transform(flips, lambda i: bucket.bitwiseXOR(
            F.pow(F.lit(2.0), i).cast("long"))))
    return (exploded
            .select(F.col("vec_id").alias("q_id"),
                    F.col("embedding").alias("q_emb"), "table",
                    F.explode(probes).alias("bucket")))


def ann_lsh_topk(spark: SparkSession, sf_dir: str,
                 n_queries: int = 5, k: int = 3) -> DataFrame:
    """Approximate top-k via multi-table multi-probe random-hyperplane
    LSH: a candidate qualifies if it shares ANY probed bucket of ANY
    table with the query (recall compounds across tables AND probes;
    the corpus index stays one entry per vector per table).  Oracle:
    bit-exact sequential replay (ops/goldens.py); recall vs. brute force
    asserted in tests."""
    emb = _emb(spark, sf_dir)
    dim = len(emb.select("embedding").first()[0])
    tabs = _lsh_tables(emb, dim)
    q = _lsh_query_probes(emb.filter(F.col("vec_id") < n_queries), dim)
    cand = (tabs.join(F.broadcast(q),
                      (tabs.table == q.table)
                      & (tabs.bucket == q.bucket)
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
KMEANS_ITERS = 4
IVF_SAMPLE_CAP = 4096


def kmeans_sample(sample: list[list[float]],
                  k: int = N_CELLS, iters: int = KMEANS_ITERS) -> list:
    """Deterministic driver-side k-means over a BOUNDED sample (numpy
    Lloyd iterations; init = first k sample vectors).  Shared verbatim
    with the sequential oracle (ops/goldens.py) — the centroid VALUES are
    part of the operator's spec, and both engines consume the same ones.
    Sample size is capped, so this never becomes a driver bottleneck no
    matter the corpus size (the scale-unsafe alternatives are centroid
    literals baked into the plan and per-iteration collects of per-dim
    sums over the full corpus)."""
    import numpy as np
    x = np.asarray(sample, dtype=np.float64)
    cents = x[:k].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        cell = d2.argmin(axis=1)
        for c in range(k):
            m = cell == c
            if m.any():
                cents[c] = x[m].mean(axis=0)
    return [[float(v) for v in c] for c in cents]


def _sqdist(a, b) -> float:
    d = 0.0
    for x, y in zip(a, b):
        d += (x - y) * (x - y)
    return d


def _ivf_assign(spark: SparkSession, emb: DataFrame) -> tuple:
    """IVF coarse quantizer, scale-shaped:

      1. deterministic bounded sample (``vec_id % stride == 0``, a
         pushdown-able predicate; ≤ ~IVF_SAMPLE_CAP rows collected)
      2. k-means on the sample, driver-side (kmeans_sample)
      3. centroids broadcast as a ONE-ROW DataFrame and cross-joined —
         never embedded in the plan (16×dim literals blow up plan size
         and codegen at real dimensions)
      4. distributed cell assignment: per-row argmin over the centroid
         array column, all JVM higher-order functions

    Returns (assigned DF with 'cell', centroids list)."""
    n = emb.count()
    stride = max(1, n // IVF_SAMPLE_CAP)
    sample_rows = (emb.filter(F.col("vec_id") % stride == 0)
                   .select("vec_id", "embedding").collect())
    sample = [list(r.embedding)
              for r in sorted(sample_rows, key=lambda r: r.vec_id)]
    cents = kmeans_sample(sample)
    from ..session import local_df
    cent_df = F.broadcast(local_df(
        spark, [(cents,)], "cents array<array<double>>"))
    dists = F.transform(
        F.col("cents"),
        lambda c: F.aggregate(
            F.zip_with(F.col("embedding"), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0).cast("double"), lambda a, v: a + v))
    assigned = (emb.crossJoin(cent_df)
                .withColumn("d", dists)
                .withColumn(
                    "cell",
                    (F.array_position(F.col("d"), F.array_min(F.col("d"))) - 1)
                    .cast("int"))
                .drop("d", "cents"))
    return assigned, cents


def ann_ivf_topk(spark: SparkSession, sf_dir: str,
                 n_queries: int = 5, k: int = 3,
                 n_probe: int = 6) -> DataFrame:
    """IVF ANN: corpus partitioned into coarse cells; each query scans only
    its ``n_probe`` nearest cells.  The scale path where LSH recall is too
    hash-lucky: cell assignment is data-adaptive.  Oracle: sequential
    Python replay of the same spec (ops/goldens.py — identical centroids,
    identical fold order, golden parquet); recall vs brute force asserted
    in tests."""
    emb = _emb(spark, sf_dir)
    assigned, cents = _ivf_assign(spark, emb)
    q = (assigned.filter(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("q_id"),
                 F.col("embedding").alias("q_emb")))
    # per-query probe cells (driver-side: n_queries × N_CELLS is tiny)
    qrows = q.collect()
    probe_rows = []
    for r in qrows:
        d2 = [(_sqdist(r.q_emb, c), i) for i, c in enumerate(cents)]
        for _, cell in sorted(d2)[:n_probe]:
            probe_rows.append((r.q_id, cell))
    from ..session import local_df
    probes = local_df(spark, probe_rows, "q_id long, cell int")
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


#: planted near-duplicate synthesis: vec_ids below this get a near-dup
#: twin at id + NEARDUP_ID_BASE (deterministic, written once per scale)
NEARDUP_PLANT = 64
NEARDUP_ID_BASE = 1_000_000
NEARDUP_VERSION = "v1"


def neardup_input_path(sf_dir: str) -> str:
    """Augmented embeddings table for the near-dup operator: the sf
    embeddings plus deterministic planted near-duplicates (the raw
    fixture has NO pairs above cosine 0.95, which made the operator a
    green-looking no-op).  Both the Spark query and the DuckDB/Python
    oracle read this same parquet.  Even plant ids are exact scaled
    copies (cosine 1.0); odd ids carry hash-derived noise at ~0.15
    relative norm (cosine ≈ 0.98–0.995)."""
    import math
    import os
    sf = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = f"/tmp/emb_neardup_{NEARDUP_VERSION}_{sf}.parquet"
    if os.path.exists(out):
        return out
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions.spark_hash import hash_int
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = tbl.column("vec_id").to_pylist()
    embs = tbl.column("embedding").to_pylist()
    new_ids, new_embs = list(ids), [[float(v) for v in e] for e in embs]
    for vid, e in zip(ids, embs):
        if vid >= NEARDUP_PLANT:
            continue
        e = [float(v) for v in e]
        if vid % 2 == 0:
            twin = [v * 1.25 for v in e]
        else:
            nrm = math.sqrt(sum(v * v for v in e))
            scale = 0.15 * nrm / math.sqrt(len(e))
            twin = [v + scale * ((hash_int(i, vid) % 2001) / 1000.0 - 1.0)
                    for i, v in enumerate(e)]
        new_ids.append(NEARDUP_ID_BASE + vid)
        new_embs.append(twin)
    out_tbl = pa.table({
        "vec_id": pa.array(new_ids, pa.int64()),
        "embedding": pa.array(new_embs, pa.list_(pa.float32())),
    })
    tmp = out + ".tmp"
    pq.write_table(out_tbl, tmp)
    os.rename(tmp, out)
    return out


def embedding_neardup(spark: SparkSession, sf_dir: str,
                      threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within multi-table LSH
    buckets (a pair qualifies if it collides in any table), over the
    planted-near-dup augmented table (neardup_input_path).  Oracle:
    sequential Python replay of the same buckets + exact cosine
    (ops/goldens.py); recall of the planted pairs asserted in tests."""
    emb = (spark.read.parquet(neardup_input_path(sf_dir))
           .withColumn("embedding", F.col("embedding").cast("array<double>")))
    dim = len(emb.select("embedding").first()[0])
    # collision join + pair dedup over IDS ONLY — a pair colliding in k
    # tables must not shuffle 2·dim doubles k times just to throw k−1
    # copies away; embeddings attach once per verified candidate pair
    bk = _lsh_tables(emb, dim).select("vec_id", "table", "bucket")
    l, r = bk.alias("l"), bk.alias("r")
    pairs = (l.join(r, (F.col("l.table") == F.col("r.table"))
                    & (F.col("l.bucket") == F.col("r.bucket"))
                    & (F.col("l.vec_id") < F.col("r.vec_id")))
             .select(F.col("l.vec_id").alias("vec_a"),
                     F.col("r.vec_id").alias("vec_b"))
             .dropDuplicates(["vec_a", "vec_b"]))
    ea = emb.select(F.col("vec_id").alias("vec_a"),
                    F.col("embedding").alias("ea"))
    eb = emb.select(F.col("vec_id").alias("vec_b"),
                    F.col("embedding").alias("eb"))
    pairs = pairs.join(ea, "vec_a").join(eb, "vec_b")
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
