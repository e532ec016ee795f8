"""Text-analysis operators over the ``documents`` table — the
training-data-pipeline layer (language ID, quality scoring, token counting,
fingerprinting).  All JVM-side expressions (split/regexp/md5); no Python in
the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: marker words for the n-gram language-ID heuristic (counts of language-
#: distinctive tokens; deterministic and SQL-twin-able).
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "de"],
    "de": ["der", "und", "das"],
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _tokens(col: str = "text") -> F.Column:
    return F.split(F.trim(F.col(col)), r"\s+")


def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + distinct ratio per document."""
    d = _docs(spark, sf_dir)
    toks = _tokens()
    return (d.select("doc_id",
                     F.col("n_chars"),
                     F.size(toks).cast("long").alias("n_tokens"),
                     F.size(F.array_distinct(toks)).cast("long")
                     .alias("n_uniq_tokens"))
            .withColumn("uniq_ratio",
                        F.round(F.col("n_uniq_tokens")
                                / F.col("n_tokens"), 4))
            .orderBy("doc_id"))


#: BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation —
#: the GPT-2-style split shape, kept to a regex subset both Spark (Java
#: regex) and DuckDB (RE2) interpret identically.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def doc_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, BPE-ish: regex pre-tokenization (letters / digits /
    punctuation runs) alongside the whitespace count."""
    d = _docs(spark, sf_dir)
    toks = _tokens()
    bpe = F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), F.lit(0))
    return (d.select("doc_id",
                     F.size(toks).cast("long").alias("n_ws_tokens"),
                     F.size(bpe).cast("long").alias("n_bpe_tokens"),
                     F.size(F.array_distinct(bpe)).cast("long")
                     .alias("n_bpe_uniq"))
            .withColumn("bpe_per_ws",
                        F.round(F.col("n_bpe_tokens")
                                / F.col("n_ws_tokens"), 4))
            .orderBy("doc_id"))


def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/space/word-length heuristics → band."""
    d = _docs(spark, sf_dir)
    toks = _tokens()
    n_spaces = (F.length("text")
                - F.length(F.regexp_replace("text", " ", "")))
    q = (d.select("doc_id", "lang",
                  F.length("text").cast("long").alias("len"),
                  F.size(toks).cast("long").alias("n_tokens"),
                  n_spaces.cast("long").alias("n_spaces"))
         .withColumn("avg_word_len",
                     F.round((F.col("len") - F.col("n_spaces"))
                             / F.col("n_tokens"), 4))
         .withColumn("quality_band",
                     F.when(F.col("n_tokens") < 10, "short")
                     .when(F.col("avg_word_len") > 10, "junk")
                     .otherwise("ok")))
    return q.orderBy("doc_id")


def doc_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via marker-token counts (n-gram heuristic): argmax of
    per-language marker occurrences, 'und' when no marker hits."""
    d = _docs(spark, sf_dir)
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    scores = []
    for lang, markers in LANG_MARKERS.items():
        score = None
        for m in markers:
            token = f" {m} "
            cnt = ((F.length(padded)
                    - F.length(F.regexp_replace(padded, token, "")))
                   / len(token))
            score = cnt if score is None else score + cnt
        scores.append(score.cast("long").alias(f"score_{lang}"))
    scored = d.select("doc_id", F.col("lang").alias("actual_lang"), *scores)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for l in langs:  # first-match argmax, deterministic order
        pred = pred.when(F.col(f"score_{l}") == best, F.lit(l))
    return (scored.withColumn("pred_lang", pred)
            .select("doc_id", "actual_lang", "pred_lang",
                    *[f"score_{l}" for l in langs])
            .orderBy("doc_id"))


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: full-text digest + head fingerprint
    (md5 — identical across engines, so oracle-checkable)."""
    d = _docs(spark, sf_dir)
    return (d.select("doc_id",
                     F.md5(F.col("text")).alias("fp_full"),
                     F.md5(F.substring("text", 1, 64)).alias("fp_head"),
                     F.length("text").cast("long").alias("len"))
            .orderBy("doc_id"))


def doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash over whitespace tokens — sign-aggregated xxhash64
    bits, all with built-in expressions (explode → bit ops → agg).

    No SQL oracle (xxhash64 is Spark-specific) → rows-only check.
    """
    d = _docs(spark, sf_dir)
    tok = (d.select("doc_id", F.explode(_tokens()).alias("tok"))
           .withColumn("h", F.xxhash64("tok")))
    # For each of 64 bits, sum(+1/-1); simhash bit = 1 if sum > 0.
    bits = [F.sum(F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1,
                         1).otherwise(-1)).alias(f"b{b}")
            for b in range(64)]
    agg = tok.groupBy("doc_id").agg(*bits)
    sim = None
    for b in range(64):
        term = F.when(F.col(f"b{b}") > 0,
                      F.lit(1).cast("long") * (2 ** b if b < 63 else -(2 ** 63))
                      ).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    return (agg.select("doc_id", sim.alias("simhash64"))
            .orderBy("doc_id"))
