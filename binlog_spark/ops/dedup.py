"""Deduplication operators over ``documents`` — exact and near-dup.

Scale shapes: exact dedup is a hash groupBy (one shuffle on the digest);
MinHash+LSH is the standard shingle → minhash → band → bucket-join pipeline
where candidate generation never goes quadratic — only same-bucket pairs are
compared, and verified pairs get an exact n-gram Jaccard from a
re-aggregation rather than a cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Raise scan parallelism for expression-heavy per-document work.

    The documents table is a single small parquet file at the bench SFs,
    so the scan plans as 1-2 input splits and every downstream
    expression fused into the scan stage (shingling, hashing) runs on
    1-2 cores no matter the cluster size.  A round-robin repartition to
    the session's default parallelism costs one tiny text shuffle and
    buys full-width execution; at real scale the scan already has more
    splits than cores and this is a no-op."""
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content digest: canonical id + duplicate count per
    distinct text (md5 — oracle-checkable)."""
    d = _docs(spark, sf_dir)
    return (d.groupBy(F.md5("text").alias("text_md5"))
            .agg(F.min("doc_id").alias("canonical_doc_id"),
                 F.count("*").alias("n_copies"))
            .orderBy("canonical_doc_id"))


N_HASHES = 32
BAND_SIZE = 4  # 8 bands of 4 hashes


def _shingles(n: int = 3, toks: F.Column | None = None) -> F.Column:
    """Word n-gram shingles of the token array.

    Semantics (pinned by the golden oracles): tokens = split(trim(text),
    '\\s+'); for >= n tokens the shingles are every n consecutive tokens
    joined by one space; for < n tokens the single shingle is all tokens
    joined by one space.  The per-element expression is three
    ``element_at`` lookups + one flat ``concat`` — measured ~6x cheaper
    than the previous ``concat_ws(slice(...))`` form, which allocated a
    sub-array per shingle inside the interpreted higher-order transform
    (guide §1.2 step 2: per-task work).  Pass a pre-projected ``toks``
    column (see ``_doc_shingles``) so the split runs once per row, not
    once per lambda element."""
    if toks is None:
        toks = F.split(F.trim(F.col("text")), r"\s+")
    sep = F.lit(" ")
    full = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat(*[x for j in range(n)
                             for x in ((sep,) if j else ())
                             + (F.element_at(toks, i + j + 1),)]))
    return F.when(F.size(toks) < n,
                  F.array(F.concat_ws(" ", toks))).otherwise(full)


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id + distinct-shingle array, full-width.

    The token array is projected to a real column first: an inline
    ``split(...)`` referenced from inside the transform lambda is
    re-evaluated per element (O(tokens²) re-splits per document — this
    alone was most of the 50k-doc pipeline's wall); bound to an alias,
    CollapseProject keeps it (non-cheap expression, multiply used) and
    the split runs once per row."""
    d = _spread(spark, _docs(spark, sf_dir))
    toksed = d.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks"))
    return toksed.select(
        "doc_id",
        F.array_distinct(_shingles(toks=F.col("toks"))).alias("shs"))


def _signature_cols(shs: F.Column) -> list:
    """The N_HASHES minhash columns over a distinct-shingle array:
    h{seed} = min over shingles of xxhash64(seed, shingle).  Computed
    per document row with ``array_min(transform(...))`` — no explode, no
    shuffle, no 32-column hash-aggregate state; the hash spec
    (xxhash64 over the seed literal + shingle string) is byte-identical
    to the exploded groupBy it replaces."""
    def hash_with(seed: int):
        # a one-arg lambda: F.transform treats a second parameter as a
        # request for the element index, which would replace the seed
        return lambda s: F.xxhash64(F.lit(seed), s)

    return [F.array_min(F.transform(shs, hash_with(seed)))
            .alias(f"h{seed}") for seed in range(N_HASHES)]


def doc_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures: distinct shingles per doc, hash with N seeds,
    elementwise min — one map-side pass, linear in corpus size."""
    return (_doc_shingles(spark, sf_dir)
            .select("doc_id", *_signature_cols(F.col("shs"))))


def doc_minhash_dups(spark: SparkSession, sf_dir: str,
                     threshold: float = 0.5) -> DataFrame:
    """Near-dup pairs via LSH banding + minhash-estimated Jaccard.

    Candidates come from band-bucket self-joins (skew-safe: identical-band
    groups are tiny unless docs really collide); the estimate is the
    fraction of agreeing minhashes.  Rows-only oracle (hash-dependent).
    """
    # ONE pass over the signatures: pack them into a single array column
    # (cached: N_HASHES longs/doc), derive the band buckets by EXPLODING
    # per-band structs (an 8-way union would rescan the signature table
    # once per band), and verify candidates against the packed array —
    # each join side carries one array column, not 32 scalar columns
    n_bands = N_HASHES // BAND_SIZE
    sig = doc_minhash_signatures(spark, sf_dir).select(
        "doc_id", F.array(*[F.col(f"h{i}")
                            for i in range(N_HASHES)]).alias("sig")).cache()

    def band_bucket(b: int) -> F.Column:
        return F.xxhash64(*[F.element_at("sig", b * BAND_SIZE + i + 1)
                            for i in range(BAND_SIZE)])

    exploded = sig.select("doc_id", F.explode(F.array(*[
        F.struct(F.lit(b).alias("band"), band_bucket(b).alias("bucket"))
        for b in range(n_bands)])).alias("bb")) \
        .select("doc_id", "bb.band", "bb.bucket")
    left = exploded.alias("l")
    right = exploded.alias("r")
    cand = (left.join(right,
                      (F.col("l.band") == F.col("r.band"))
                      & (F.col("l.bucket") == F.col("r.bucket"))
                      & (F.col("l.doc_id") < F.col("r.doc_id")))
            .select(F.col("l.doc_id").alias("doc_a"),
                    F.col("r.doc_id").alias("doc_b"))
            .distinct())
    agree = F.size(F.filter(
        F.zip_with(F.col("a.sig"), F.col("b.sig"),
                   lambda x, y: x == y), lambda v: v))
    pairs = (cand
             .join(sig.alias("a"), cand.doc_a == F.col("a.doc_id"))
             .join(sig.alias("b"), cand.doc_b == F.col("b.doc_id"))
             .select("doc_a", "doc_b",
                     (agree / F.lit(N_HASHES)).alias("est_jaccard"))
             .filter(F.col("est_jaccard") >= threshold)
             .orderBy("doc_a", "doc_b"))
    return pairs


def doc_dedup_clusters(spark: SparkSession, sf_dir: str,
                       threshold: float = 0.5) -> DataFrame:
    """Cluster assignment over the near-dup pair graph: every document
    gets a cluster id = the MIN doc_id of its connected component (the
    canonical survivor a dedup pipeline keeps), plus the cluster size.

    Distributed connected components by iterative min-label propagation
    (the GraphX/GraphFrames CC shape): each round every node takes the
    min label among itself and its neighbors; converges in ≤ diameter
    rounds — near-dup components are almost-cliques from shared LSH
    buckets, so a handful of rounds suffice; the loop stops on a
    converged round (count of changed labels = 0, one small action per
    round) and is capped defensively.  Oracle: sequential union-find
    over the same golden pairs (ops/goldens.py)."""
    d = _docs(spark, sf_dir)
    pairs = doc_minhash_dups(spark, sf_dir, threshold=threshold) \
        .select("doc_a", "doc_b")
    # the pair pipeline (shingle → minhash → band join) must run ONCE,
    # not once per propagation round; labels persist per round so each
    # iteration's plan reads the previous cached frontier, keeping
    # lineage depth constant (the GraphX-style CC discipline)
    edges = (pairs.union(pairs.select(F.col("doc_b").alias("doc_a"),
                                      F.col("doc_a").alias("doc_b")))
             .persist())
    labels = d.select("doc_id", F.col("doc_id").alias("label")).persist()
    for _ in range(20):
        nbr = (edges.join(labels,
                          edges.doc_a == labels.doc_id, "inner")
               .groupBy(F.col("doc_b").alias("doc_id"))
               .agg(F.min("label").alias("nbr_label")))
        new_labels = (labels.join(nbr, "doc_id", "left")
                      .select("doc_id",
                              F.least("label",
                                      F.coalesce("nbr_label", "label"))
                              .alias("label"))
                      .persist())
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "doc_id")
                   .filter(F.col("n.label") != F.col("o.label")).count())
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return (labels.join(sizes, "label")
            .select("doc_id", F.col("label").alias("cluster_id"),
                    "cluster_size")
            .orderBy("doc_id"))


def doc_ngram_jaccard(spark: SparkSession, sf_dir: str,
                      threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard for LSH candidates: |A∩B| via a shingle-level
    join of candidates only (never all-pairs), |A∪B| = |A|+|B|−|A∩B|."""
    cand = doc_minhash_dups(spark, sf_dir, threshold=0.3) \
        .select("doc_a", "doc_b")
    sh = (_doc_shingles(spark, sf_dir)
          .select("doc_id", F.explode("shs").alias("sh")))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (cand
             .join(sh.alias("sa"), cand.doc_a == F.col("sa.doc_id"))
             .join(sh.alias("sb"),
                   (cand.doc_b == F.col("sb.doc_id"))
                   & (F.col("sa.sh") == F.col("sb.sh")))
             .groupBy("doc_a", "doc_b")
             .agg(F.count("*").alias("n_inter")))
    return (inter
            .join(sizes.alias("za"), inter.doc_a == F.col("za.doc_id"))
            .join(sizes.alias("zb"), inter.doc_b == F.col("zb.doc_id"))
            .select("doc_a", "doc_b",
                    F.round(F.col("n_inter")
                            / (F.col("za.n_sh") + F.col("zb.n_sh")
                               - F.col("n_inter")), 4).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold)
            .orderBy("doc_a", "doc_b"))
