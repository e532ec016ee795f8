"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC apply on sf0.001; ``queries()``
exposes every implemented operator from SURVEY.md §2 plus the training-
data-pipeline layer; ``oracle_sql()`` gives the DuckDB twin for each
SQL-expressible query (hash-dependent ops — minhash/simhash/LSH and the
binlog byte pipeline — are rows-only by design and asserted against the
sequential oracle in tests/ instead).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from binlog_spark.ops import (binlog_demo, cdc_events, dedup, multimodal,
                              relational, similarity, text)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full binlog replay (decode → GTID dedup → commit-order
    apply) at the smallest scale, returning the final lake state with the
    per-row sha256(content) invariant (BASELINE.json:15)."""
    return binlog_demo.binlog_replay_state(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # --- the CDC engine itself (oracles: golden parquet written by the
        # fixture generator / sequential oracle, read via read_parquet) ---
        "binlog_replay_state": binlog_demo.binlog_replay_state,
        "binlog_minimal_state": binlog_demo.binlog_minimal_state,
        "binlog_decode_events": binlog_demo.binlog_decode_events,
        "binlog_events_full": binlog_demo.binlog_events_full,
        "binlog_statement_events": binlog_demo.binlog_statement_events,
        "binlog_typed_decode": binlog_demo.binlog_typed_decode,
        "binlog_multi_table": binlog_demo.binlog_multi_table,
        "binlog_multi_minimal": binlog_demo.binlog_multi_minimal,
        # --- CDC semantics with a SQL twin (events table) ---
        "cdc_dedup": cdc_events.cdc_dedup,
        "cdc_last_event": cdc_events.cdc_last_event,
        "cdc_offsets": cdc_events.cdc_offsets,
        "cdc_apply": cdc_events.cdc_apply,
        # --- relational coverage (SURVEY §2 Table B) ---
        "q1_pricing_summary": relational.q1_pricing_summary,
        "q3_top_orders": relational.q3_top_orders,
        "q5_region_revenue": relational.q5_region_revenue,
        "top_customers": relational.top_customers,
        "order_priority_counts": relational.order_priority_counts,
        "sessionize_events": relational.sessionize_events,
        # --- text analysis (documents) ---
        "doc_token_stats": text.doc_token_stats,
        "doc_bpe_tokens": text.doc_bpe_tokens,
        "doc_quality": text.doc_quality,
        "doc_langid": text.doc_langid,
        "doc_fingerprint": text.doc_fingerprint,
        "doc_simhash": text.doc_simhash,
        # --- dedup (documents) ---
        "doc_exact_dedup": dedup.doc_exact_dedup,
        "doc_minhash_dups": dedup.doc_minhash_dups,
        "doc_ngram_jaccard": dedup.doc_ngram_jaccard,
        "doc_dedup_clusters": dedup.doc_dedup_clusters,
        # --- similarity search (embeddings) ---
        "ann_bruteforce_topk": similarity.ann_bruteforce_topk,
        "ann_lsh_topk": similarity.ann_lsh_topk,
        "ann_ivf_topk": similarity.ann_ivf_topk,
        "embedding_neardup": similarity.embedding_neardup,
        # --- multimodal plumbing (binary columns) ---
        "mm_binary_metadata": multimodal.binary_metadata,
        "mm_frame_sample": multimodal.frame_sample,
    }


def _oracle_sf_dir() -> str:
    """The scale the driver's correctness gate runs at (sf0.01); local
    harnesses (tools/check_contract.py) override via env."""
    return os.environ.get("SPARK_GRAFT_CORRECTNESS_SF",
                          "/root/testdata/sf0.01")


def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}

    # --- CDC engine: golden-parquet oracles.  golden_state/golden_events
    # are GENERATOR-side truth (the change script's live state and the
    # writer's emission log — mysql/gen.py:write_goldens), fully
    # independent of the decoder; golden_typed is the sequential
    # single-threaded oracle pass (mysql/gen_typed.py:write_typed_golden);
    # golden_multi is the multi-table script's live state
    # (mysql/gen_multi.py:write_multi_golden).
    from binlog_spark.ops import binlog_demo
    g = binlog_demo.golden_paths(_oracle_sf_dir())

    sql["binlog_replay_state"] = f"""
        SELECT repo, path, commit, lang, content_sha256
        FROM read_parquet('{g["state"]}') ORDER BY repo, path
    """

    sql["binlog_minimal_state"] = f"""
        SELECT repo, path, commit, lang, content_sha256
        FROM read_parquet('{g["minimal_state"]}') ORDER BY repo, path
    """

    sql["binlog_decode_events"] = f"""
        SELECT op, log_file, count(*) AS n_events,
               max(log_pos) AS max_pos,
               count(DISTINCT gtid) AS n_tx
        FROM read_parquet('{g["events"]}')
        GROUP BY op, log_file ORDER BY log_file, op
    """

    sql["binlog_events_full"] = f"""
        SELECT op, repo, path, before_repo, before_path, commit, lang,
               content_sha256, gtid, seq_in_tx, log_file, log_pos, ts_sec
        FROM read_parquet('{g["events"]}')
        ORDER BY log_file, log_pos, seq_in_tx
    """

    sql["binlog_statement_events"] = f"""
        SELECT stmt_type, schema_name, text, value, n1, n2, gtid,
               log_file, log_pos, ts_sec
        FROM read_parquet('{g["statements"]}')
        ORDER BY log_file, log_pos
    """

    sql["binlog_typed_decode"] = f"""
        SELECT op, table_schema, table_name, before_json, after_json,
               gtid, seq_in_tx, log_file, log_pos, ts_sec, crc_ok
        FROM read_parquet('{g["typed"]}')
        ORDER BY log_file, log_pos, seq_in_tx
    """

    sql["binlog_multi_table"] = f"""
        SELECT table_schema, table_name, pk_json, row_json
        FROM read_parquet('{g["multi"]}')
        ORDER BY table_schema, table_name, pk_json
    """

    sql["binlog_multi_minimal"] = f"""
        SELECT table_schema, table_name, pk_json, row_json
        FROM read_parquet('{g["multi_minimal"]}')
        ORDER BY table_schema, table_name, pk_json
    """

    sql["cdc_dedup"] = """
        SELECT user_id, event_type, event_id, round(value, 4) AS value
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                           ORDER BY event_id) AS rn
              FROM events)
        WHERE rn = 1
        ORDER BY user_id, event_type
    """

    sql["cdc_last_event"] = """
        SELECT user_id,
               event_type AS last_type,
               round(value, 4) AS last_value,
               event_id AS last_event_id,
               n_events
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                           ORDER BY ts DESC, event_id DESC) AS rn,
                     count(*) OVER (PARTITION BY user_id) AS n_events
              FROM events)
        WHERE rn = 1
        ORDER BY user_id
    """

    sql["cdc_offsets"] = """
        SELECT event_type, max(event_id) AS max_offset,
               count(*) AS n_events,
               count(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type ORDER BY event_type
    """

    sql["cdc_apply"] = """
        WITH dels AS (
            SELECT user_id, max(ROW(ts, event_id)) AS del_ord
            FROM events WHERE event_type = 'error' GROUP BY user_id),
        live AS (
            SELECT e.* FROM events e LEFT JOIN dels d USING (user_id)
            WHERE e.event_type <> 'error'
              AND (d.del_ord IS NULL OR ROW(e.ts, e.event_id) > d.del_ord))
        SELECT user_id, event_type, round(value, 4) AS value, event_id
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                           ORDER BY ts DESC, event_id DESC) AS rn
              FROM live)
        WHERE rn = 1
        ORDER BY user_id
    """

    sql["q1_pricing_summary"] = """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """

    sql["q3_top_orders"] = """
        SELECT l_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
        GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """

    sql["q5_region_revenue"] = """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """

    sql["top_customers"] = """
        WITH spend AS (
            SELECT o_custkey, round(sum(o_totalprice), 2) AS total_spend,
                   count(*) AS n_orders
            FROM orders GROUP BY o_custkey)
        SELECT c_custkey, c_name, c_mktsegment, total_spend, n_orders,
               spend_rank
        FROM (SELECT s.*, c.c_custkey, c.c_name, c.c_mktsegment,
                     dense_rank() OVER (ORDER BY total_spend DESC,
                                        o_custkey ASC) AS spend_rank
              FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey)
        WHERE spend_rank <= 10
        ORDER BY spend_rank
    """

    sql["order_priority_counts"] = """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """

    sql["sessionize_events"] = """
        WITH marked AS (
            SELECT user_id,
                   CASE WHEN lag(ts) OVER w IS NULL THEN 1
                        WHEN floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM marked GROUP BY user_id ORDER BY user_id
    """

    sql["doc_token_stats"] = """
        WITH t AS (SELECT doc_id, n_chars,
                          string_split_regex(trim(text), '\\s+') AS toks
                   FROM documents)
        SELECT doc_id, n_chars,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq_tokens,
               round(CAST(len(list_distinct(toks)) AS DOUBLE)
                     / len(toks), 4) AS uniq_ratio
        FROM t ORDER BY doc_id
    """

    from binlog_spark.ops.text import BPE_PATTERN
    sql["doc_bpe_tokens"] = f"""
        WITH t AS (SELECT doc_id,
                          string_split_regex(trim(text), '\\s+') AS ws,
                          regexp_extract_all(text, '{BPE_PATTERN}') AS bpe
                   FROM documents)
        SELECT doc_id,
               CAST(len(ws) AS BIGINT) AS n_ws_tokens,
               CAST(len(bpe) AS BIGINT) AS n_bpe_tokens,
               CAST(len(list_distinct(bpe)) AS BIGINT) AS n_bpe_uniq,
               round(CAST(len(bpe) AS DOUBLE) / len(ws), 4) AS bpe_per_ws
        FROM t ORDER BY doc_id
    """

    sql["doc_quality"] = """
        WITH t AS (SELECT doc_id, lang,
                          CAST(length(text) AS BIGINT) AS len,
                          CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                              AS n_tokens,
                          CAST(length(text) - length(replace(text, ' ', ''))
                               AS BIGINT) AS n_spaces
                   FROM documents)
        SELECT doc_id, lang, len, n_tokens, n_spaces,
               round(CAST(len - n_spaces AS DOUBLE) / n_tokens, 4) AS avg_word_len,
               CASE WHEN n_tokens < 10 THEN 'short'
                    WHEN CAST(len - n_spaces AS DOUBLE) / n_tokens > 10 THEN 'junk'
                    ELSE 'ok' END AS quality_band
        FROM t ORDER BY doc_id
    """

    # marker scores: occurrences of ' <marker> ' in the space-padded text
    def _score(markers: list[str]) -> str:
        terms = []
        for m in markers:
            token = f" {m} "
            terms.append(f"(length(p) - length(replace(p, '{token}', '')))"
                         f" / {len(token)}")
        return " + ".join(terms)

    from binlog_spark.ops.text import LANG_MARKERS
    score_cols = ",\n               ".join(
        f"CAST({_score(ms)} AS BIGINT) AS score_{l}"
        for l, ms in LANG_MARKERS.items())
    langs = list(LANG_MARKERS)
    greatest = f"greatest({', '.join('score_' + l for l in langs)})"
    pred = "CASE WHEN " + greatest + " <= 0 THEN 'und' " + " ".join(
        f"WHEN score_{l} = {greatest} THEN '{l}'" for l in langs) + " END"
    sql["doc_langid"] = f"""
        WITH padded AS (SELECT doc_id, lang AS actual_lang,
                               ' ' || text || ' ' AS p
                        FROM documents),
        scored AS (SELECT doc_id, actual_lang,
               {score_cols}
        FROM padded)
        SELECT doc_id, actual_lang, {pred} AS pred_lang,
               {', '.join('score_' + l for l in langs)}
        FROM scored ORDER BY doc_id
    """

    sql["doc_fingerprint"] = """
        SELECT doc_id, md5(text) AS fp_full,
               md5(substr(text, 1, 64)) AS fp_head,
               CAST(length(text) AS BIGINT) AS len
        FROM documents ORDER BY doc_id
    """

    sql["doc_exact_dedup"] = """
        SELECT md5(text) AS text_md5,
               min(doc_id) AS canonical_doc_id,
               count(*) AS n_copies
        FROM documents GROUP BY md5(text)
        ORDER BY canonical_doc_id
    """

    sql["ann_bruteforce_topk"] = """
        WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb
                   FROM embeddings WHERE vec_id < 5),
        pairs AS (
            SELECT q.q_id, e.vec_id,
                   list_inner_product(e.embedding::DOUBLE[], q.q_emb)
                   / (sqrt(list_inner_product(e.embedding::DOUBLE[],
                                              e.embedding::DOUBLE[]))
                      * sqrt(list_inner_product(q.q_emb, q.q_emb))) AS cos
            FROM embeddings e, q WHERE e.vec_id <> q.q_id),
        ranked AS (SELECT q_id, vec_id, cos,
                          row_number() OVER (PARTITION BY q_id
                                             ORDER BY cos DESC, vec_id) AS rank
                   FROM pairs)
        SELECT q_id, rank, vec_id, round(cos, 4) AS cos
        FROM ranked WHERE rank <= 3 ORDER BY q_id, rank
    """

    sql["mm_binary_metadata"] = """
        WITH t AS (SELECT doc_id,
                          CAST(octet_length(encode(text)) AS INT) AS n
                   FROM documents)
        SELECT doc_id, n AS n_bytes,
               CASE n % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                          ELSE 'webp' END AS format,
               CAST(64 + (n % 512) AS INT) AS width,
               CAST(64 + (n % 384) AS INT) AS height
        FROM t ORDER BY doc_id
    """

    sql["mm_frame_sample"] = """
        WITH t AS (SELECT doc_id,
                          greatest(CAST(floor((octet_length(encode(text)) + 63)
                                              / 64) AS BIGINT), 1) AS n_frames
                   FROM documents)
        SELECT doc_id,
               CAST(floor((n_frames - 1) / 7) + 1 AS BIGINT) AS n_sampled,
               CAST(7 * floor((n_frames - 1) / 7) AS BIGINT) AS last_frame_idx
        FROM t ORDER BY doc_id
    """

    # --- hash-dependent ops: golden parquet from the sequential Python
    # oracle (binlog_spark/ops/goldens.py) — a single-threaded replay of
    # each operator's spec built on the bit-exact xxhash64
    # reimplementation (functions/spark_hash.py, verified in
    # tests/test_spark_hash.py).  Recall quality is separately asserted
    # in tests/test_ops.py.
    from binlog_spark.ops import goldens
    sfd = _oracle_sf_dir()

    sql["doc_simhash"] = f"""
        SELECT doc_id, simhash64
        FROM read_parquet('{goldens.golden_doc_simhash(sfd)}')
        ORDER BY doc_id
    """

    sql["doc_minhash_dups"] = f"""
        SELECT doc_a, doc_b, est_jaccard
        FROM read_parquet('{goldens.golden_doc_minhash_dups(sfd)}')
        ORDER BY doc_a, doc_b
    """

    sql["doc_ngram_jaccard"] = f"""
        SELECT doc_a, doc_b, jaccard
        FROM read_parquet('{goldens.golden_doc_ngram_jaccard(sfd)}')
        ORDER BY doc_a, doc_b
    """

    sql["doc_dedup_clusters"] = f"""
        SELECT doc_id, cluster_id, cluster_size
        FROM read_parquet('{goldens.golden_doc_dedup_clusters(sfd)}')
        ORDER BY doc_id
    """

    sql["ann_lsh_topk"] = f"""
        SELECT q_id, rank, vec_id, cos
        FROM read_parquet('{goldens.golden_ann_lsh_topk(sfd)}')
        ORDER BY q_id, rank
    """

    sql["ann_ivf_topk"] = f"""
        SELECT q_id, rank, vec_id, cos
        FROM read_parquet('{goldens.golden_ann_ivf_topk(sfd)}')
        ORDER BY q_id, rank
    """

    sql["embedding_neardup"] = f"""
        SELECT vec_a, vec_b, cos
        FROM read_parquet('{goldens.golden_embedding_neardup(sfd)}')
        ORDER BY vec_a, vec_b
    """

    return sql
