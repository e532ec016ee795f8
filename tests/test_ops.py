"""Invariants for the hash-dependent (rows-only) ops + the driver entry.

The SQL-expressible ops are gated by tools/check_contract.py (DuckDB twin);
these tests cover what SQL can't: LSH consistency with brute force, minhash
estimate sanity vs exact Jaccard, simhash locality, and the flagship entry.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def test_entry_runs(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"repo", "path", "commit", "lang",
                               "content_sha256"}


def test_lsh_cos_agrees_with_bruteforce(spark):
    """Every LSH hit's cosine must equal the exact cosine for that pair
    (bucketing only restricts candidates; it must not change the metric)."""
    from binlog_spark.ops.similarity import ann_bruteforce_topk, ann_lsh_topk
    brute = ann_bruteforce_topk(spark, SF, n_queries=5, k=50)
    lsh = ann_lsh_topk(spark, SF, n_queries=5, k=3)
    exact = {(r.q_id, r.vec_id): r.cos for r in brute.collect()}
    for r in lsh.collect():
        key = (r.q_id, r.vec_id)
        if key in exact:  # brute truncated at k=50
            assert abs(exact[key] - r.cos) < 1e-6


def test_ivf_recall_vs_bruteforce(spark):
    """IVF with n_probe=6/16 cells must recover most of the exact top-3
    (data-adaptive cells beat hash-lucky LSH)."""
    from binlog_spark.ops.similarity import ann_bruteforce_topk, ann_ivf_topk
    brute = {(r.q_id, r.vec_id)
             for r in ann_bruteforce_topk(spark, SF, n_queries=5, k=3).collect()}
    ivf = {(r.q_id, r.vec_id)
           for r in ann_ivf_topk(spark, SF, n_queries=5, k=3).collect()}
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.7, f"IVF recall too low: {recall}"
    # and every IVF cosine is exact (candidate restriction only)
    exact = {(r.q_id, r.vec_id): r.cos
             for r in ann_bruteforce_topk(spark, SF, n_queries=5, k=100).collect()}
    for r in ann_ivf_topk(spark, SF, n_queries=5, k=3).collect():
        if (r.q_id, r.vec_id) in exact:
            assert abs(exact[(r.q_id, r.vec_id)] - r.cos) < 1e-6


def test_minhash_estimates_track_exact_jaccard(spark):
    from binlog_spark.ops.dedup import doc_minhash_dups, doc_ngram_jaccard
    est = {(r.doc_a, r.doc_b): r.est_jaccard
           for r in doc_minhash_dups(spark, SF, threshold=0.3).collect()}
    exact = {(r.doc_a, r.doc_b): r.jaccard
             for r in doc_ngram_jaccard(spark, SF, threshold=0.0).collect()}
    assert est, "expected some near-dup candidates in the corpus"
    # minhash is an unbiased estimator: mean absolute error small over pairs
    common = [k for k in est if k in exact]
    assert common
    mae = sum(abs(est[k] - exact[k]) for k in common) / len(common)
    assert mae < 0.25, f"minhash estimate off: MAE={mae}"


def test_exact_dedup_partitions_corpus(spark):
    from binlog_spark.ops.dedup import doc_exact_dedup
    d = doc_exact_dedup(spark, SF)
    total = d.groupBy().sum("n_copies").collect()[0][0]
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert total == n_docs


def test_simhash_deterministic_and_local(spark):
    """Same text → same simhash; a doc is closer (hamming) to itself than
    to a random other doc on average."""
    from pyspark.sql import functions as F
    from binlog_spark.ops.text import doc_simhash
    s1 = {r.doc_id: r.simhash64 for r in doc_simhash(spark, SF).collect()}
    s2 = {r.doc_id: r.simhash64 for r in doc_simhash(spark, SF).collect()}
    assert s1 == s2


def test_multimodal_stub_flags_real_decode(spark):
    from binlog_spark.ops.multimodal import real_image_decode
    with pytest.raises(NotImplementedError):
        real_image_decode(b"\x89PNG")


def test_embedding_neardup_finds_planted_pairs(spark):
    """The near-dup operator must recover the deterministically planted
    near-duplicates (exact scaled copies collide in every LSH table;
    noise-perturbed twins at cos≈0.99 compound across 4 tables)."""
    from binlog_spark.ops.similarity import (NEARDUP_ID_BASE, NEARDUP_PLANT,
                                             embedding_neardup)
    got = {(r.vec_a, r.vec_b): r.cos
           for r in embedding_neardup(spark, SF).collect()}
    planted = {(v, v + NEARDUP_ID_BASE) for v in range(NEARDUP_PLANT)}
    found = planted & set(got)
    recall = len(found) / len(planted)
    assert recall >= 0.9, f"planted near-dup recall too low: {recall}"
    # exact scaled copies have cosine exactly 1
    for v in range(0, NEARDUP_PLANT, 2):
        if (v, v + NEARDUP_ID_BASE) in got:
            assert got[(v, v + NEARDUP_ID_BASE)] == 1.0


def test_lsh_tables_are_independent(spark):
    """Regression for the lambda-arity bug: the 4 LSH tables must hash
    with DIFFERENT hyperplanes (a two-parameter lambda in F.transform
    silently received (element, index) and made every table identical)."""
    from pyspark.sql import functions as F
    from binlog_spark.ops.similarity import _emb, _lsh_tables
    emb = _emb(spark, SF).limit(50)
    tabs = _lsh_tables(emb, 64)
    pivot = (tabs.groupBy("vec_id").pivot("table", [0, 1, 2, 3])
             .agg(F.first("bucket")))
    rows = pivot.collect()
    identical = sum(1 for r in rows if r["0"] == r["1"] == r["2"] == r["3"])
    assert identical < len(rows) / 2, "LSH tables look identical"


def test_lsh_multiprobe_recall(spark):
    """Multi-probe LSH (exact bucket + 2 low-margin bit flips per table)
    recovers a solid fraction of the exact top-3.  Deterministic: the
    hash, the probes and the data are all fixed."""
    from binlog_spark.ops.similarity import ann_bruteforce_topk, ann_lsh_topk
    brute = {(r.q_id, r.vec_id)
             for r in ann_bruteforce_topk(spark, SF, n_queries=5, k=3).collect()}
    lsh = {(r.q_id, r.vec_id)
           for r in ann_lsh_topk(spark, SF, n_queries=5, k=3).collect()}
    recall = len(brute & lsh) / len(brute)
    assert recall >= 0.5, f"multi-probe LSH recall too low: {recall}"
