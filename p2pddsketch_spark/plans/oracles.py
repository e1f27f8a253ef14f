"""DuckDB oracle SQL twins for `plans/queries.py` — ANSI SQL the driver
runs side-by-side with the Spark DataFrame plans (tables pre-registered
as views). Column names/aliases match the Spark output exactly; doubles
rounded to 6 on both sides to absorb 1-ulp libm differences.
"""

from __future__ import annotations

from p2pddsketch_spark.functions.ddsql import (duckdb_quantile_sql,
                                               duckdb_quantile_sql_signed)
from p2pddsketch_spark.plans.queries import QS

_WORDS = "string_split(text, ' ')"
_STOP = "['the','a','an','of','and','or','to','in','is','it']"
_DE = "['der','die','das','und','nicht']"
_FR = "['le','la','les','et','est']"

ORACLES: dict[str, str] = {}

ORACLES["dds_quantiles_lineitem"] = duckdb_quantile_sql(
    "lineitem", "l_quantity", QS, alpha=0.01)

ORACLES["dds_price_by_flag"] = duckdb_quantile_sql(
    "lineitem", "l_extendedprice", QS, alpha=0.005, group_cols=("l_returnflag",))

ORACLES["dds_value_by_user_bucket"] = duckdb_quantile_sql(
    "(SELECT CAST(user_id % 4 AS BIGINT) AS user_bucket, value FROM events) t",
    "value", [0.5, 0.99], alpha=0.01, group_cols=("user_bucket",))

ORACLES["dds_events_catalyst"] = duckdb_quantile_sql(
    "events", "value", QS, alpha=0.01)

# merged gate row (round 5): both signed-codec forms — Catalyst plan and
# mapInArrow harness — compute the identical algebra, so one signed SQL
# twin oracles both, tagged by the `form` literal
_SIGNED_SQL = duckdb_quantile_sql_signed(
    "(SELECT value - 250.0 AS centered FROM events) t", "centered",
    [0.05, 0.5, 0.95], alpha=0.01)
ORACLES["dds_signed"] = (
    f"SELECT 'catalyst' AS form, * FROM ({_SIGNED_SQL}) "
    f"UNION ALL SELECT 'harness' AS form, * FROM ({_SIGNED_SQL}) "
    f"ORDER BY form, q")

# Turnstile inserts−deletes leave exactly the non-'R' rows' buckets
# (no collapse at bin_limit 2^22), so the oracle is the plain DDSketch
# twin over the surviving rows.
ORACLES["dds_turnstile_lineitem"] = duckdb_quantile_sql(
    "(SELECT l_quantity FROM lineitem WHERE l_returnflag <> 'R') t",
    "l_quantity", [0.5, 0.95, 0.99], alpha=0.01)

ORACLES["dds_doclen_by_lang"] = duckdb_quantile_sql(
    "documents", "n_chars", QS, alpha=0.01, group_cols=("lang",))

ORACLES["dds_events_hourly"] = duckdb_quantile_sql(
    "(SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour_bucket, "
    "value FROM events) t",
    "value", [0.95], alpha=0.01, group_cols=("hour_bucket",))

from p2pddsketch_spark.functions.ddsql import (duckdb_rank_sql,
                                               duckdb_sliding_quantile_sql)

from p2pddsketch_spark.functions.ddsql import duckdb_decayed_quantile_sql

# the rollup's daily histogram equals the direct daily histogram (sum of
# hourly counts), so the oracle is the plain per-day quantile SQL
ORACLES["dds_daily_rollup"] = duckdb_quantile_sql(
    "(SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day_bucket, "
    "value FROM events) t",
    "value", [0.5, 0.95], alpha=0.01, group_cols=("day_bucket",))

ORACLES["dds_decayed_quantiles"] = duckdb_decayed_quantile_sql(
    "events", "value", "ts", [0.5, 0.95, 0.99], alpha=0.01,
    half_life_hours=168.0)

ORACLES["dds_rank_enrich"] = duckdb_rank_sql(
    "events", "value", alpha=0.01, id_cols=("event_id",),
    where="event_id < 2000")

ORACLES["dds_rank_by_user_bucket"] = duckdb_rank_sql(
    "(SELECT event_id, CAST(user_id % 4 AS BIGINT) AS user_bucket, value "
    "FROM events) t",
    "value", alpha=0.01, id_cols=("event_id",),
    group_cols=("user_bucket",), where="event_id < 2000")

ORACLES["dds_sliding_p95"] = duckdb_sliding_quantile_sql(
    "events", "value", "ts", [0.5, 0.95], alpha=0.01, window_hours=6)

# merged gate row (round 5, third rotation wave): both hourly-state
# window forms — 6 h sliding and the daily hypertable rollup — in one
# tagged frame; the sliding form has no bucket_key, so it carries the
# −1 sentinel on both sides
ORACLES["dds_windows"] = (
    f"SELECT 'sliding_6h' AS form, CAST(window_end AS VARCHAR) AS bucket, "
    f"q, CAST(-1 AS BIGINT) AS bucket_key, estimate, n "
    f"FROM ({ORACLES.pop('dds_sliding_p95')}) "
    f"UNION ALL "
    f"SELECT 'daily_rollup' AS form, day_bucket AS bucket, q, bucket_key, "
    f"estimate, n FROM ({ORACLES.pop('dds_daily_rollup')}) "
    f"ORDER BY form, bucket, q")

# token-budget mixture construction: the selection tag is mod-2^64
# arithmetic, so the twin replays it in HUGEINT and folds the same
# greedy prefix (operators/pipeline.py::duckdb_mix_sources_sql)
from p2pddsketch_spark.operators.pipeline import duckdb_mix_sources_sql

ORACLES["mix_sources"] = duckdb_mix_sources_sql(
    {f"src{i}": 700 for i in range(20)})

# DSIR importance scores toward src3, both feature spaces in one tagged
# row: the raw union-vocabulary twin and the hashed-bucket twin (B=64,
# replayed through the XXH64-in-SQL chain) — each per-occurrence term
# ROUND(·,6)-scaled and decimal-summed exactly like the Spark plan
# (operators/pipeline.py::duckdb_importance_sql)
from p2pddsketch_spark.operators.pipeline import duckdb_importance_sql

ORACLES["importance_select"] = (
    f"SELECT 'raw' AS form, doc_id, n_terms, score_bits "
    f"FROM ({duckdb_importance_sql('src3')}) "
    f"UNION ALL "
    f"SELECT 'hashed' AS form, doc_id, n_terms, score_bits "
    f"FROM ({duckdb_importance_sql('src3', hash_buckets=64)}) "
    f"ORDER BY form, doc_id")

# merged gate row (round 5): both pure-Catalyst quantile-plan forms —
# ungrouped events.value and lang-grouped documents.n_chars — in one
# row, tagged by `src` (`lang` NULL on the ungrouped side)
ORACLES["dds_catalyst"] = (
    f"SELECT 'events_value' AS src, CAST(NULL AS VARCHAR) AS lang, * "
    f"FROM ({ORACLES.pop('dds_events_catalyst')}) "
    f"UNION ALL "
    f"SELECT 'documents_len_by_lang' AS src, lang, q, bucket_key, "
    f"estimate, n FROM ({ORACLES.pop('dds_doclen_by_lang')}) "
    f"ORDER BY src, lang, q")

# merged gate row (round 5): global + cohort percentile-rank enrichment
# in one row, tagged by `scope` (`user_bucket` NULL on the global side)
ORACLES["dds_rank"] = (
    f"SELECT 'global' AS scope, CAST(NULL AS BIGINT) AS user_bucket, * "
    f"FROM ({ORACLES.pop('dds_rank_enrich')}) "
    f"UNION ALL "
    f"SELECT 'cohort' AS scope, user_bucket, event_id, pct_rank "
    f"FROM ({ORACLES.pop('dds_rank_by_user_bucket')}) "
    f"ORDER BY scope, event_id")

ORACLES["tpch_q1"] = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS sum_disc_price,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

ORACLES["join_revenue_by_nation"] = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""

ORACLES["tpch_q6"] = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(20,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01'
  AND l_shipdate < TIMESTAMP '1995-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

ORACLES["top_orders"] = """
SELECT o_orderkey, c_mktsegment,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY o_orderkey, c_mktsegment
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""

ORACLES["order_priority_semi"] = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > TIMESTAMP '1995-06-30')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

ORACLES["customers_without_orders"] = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-01-01')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

# DuckDB's native ASOF LEFT JOIN is the oracle for the union+window
# as-of implementation (ties deterministic: right side deduped).
# Round-5 merge of the events_asof_orders + events_interval_join rows:
# DuckDB's NATIVE ASOF LEFT JOIN and a plain BETWEEN range join, tagged
# and union'd exactly like the Spark frame.
ORACLES["event_joins"] = """
WITH r AS (
  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS last_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
), win AS (
  SELECT event_id AS window_id, user_id, ts AS w_start,
         ts + INTERVAL 2 HOUR AS w_end
  FROM events WHERE event_id % 97 = 0
)
SELECT 'asof' AS form, CAST(e.event_id AS BIGINT) AS a,
       CAST(r.last_orderkey AS BIGINT) AS b,
       strftime(r.o_orderdate, '%Y-%m-%d') AS tag
FROM (SELECT event_id, user_id, ts FROM events WHERE event_id < 2000) e
ASOF LEFT JOIN r
  ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
UNION ALL
SELECT 'interval' AS form, CAST(w.window_id AS BIGINT) AS a,
       CAST(e.event_id AS BIGINT) AS b, CAST(NULL AS VARCHAR) AS tag
FROM events e
JOIN win w ON e.user_id = w.user_id
          AND e.ts BETWEEN w.w_start AND w.w_end
ORDER BY form, a, b
"""

ORACLES["window_running_value"] = """
SELECT event_id, user_id,
       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 6) AS running_value,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS event_rank
FROM events
WHERE event_id < 200
ORDER BY event_id
"""

ORACLES["user_sessions"] = """
WITH marked AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       CAST(SUM(new_sess) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM marked
GROUP BY user_id
ORDER BY user_id
"""

ORACLES["revenue_cube"] = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       GROUPING(l_returnflag, l_linestatus)::BIGINT AS gid,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag, l_linestatus
"""

ORACLES["value_pivot"] = """
SELECT CAST(user_id % 4 AS BIGINT) AS user_bucket,
       CAST(COALESCE(SUM(CAST(value AS DECIMAL(20,6))) FILTER (WHERE event_type = 'click'), 0) AS DOUBLE) AS v_click,
       CAST(COALESCE(SUM(CAST(value AS DECIMAL(20,6))) FILTER (WHERE event_type = 'error'), 0) AS DOUBLE) AS v_error,
       CAST(COALESCE(SUM(CAST(value AS DECIMAL(20,6))) FILTER (WHERE event_type = 'purchase'), 0) AS DOUBLE) AS v_purchase,
       CAST(COALESCE(SUM(CAST(value AS DECIMAL(20,6))) FILTER (WHERE event_type = 'signup'), 0) AS DOUBLE) AS v_signup,
       CAST(COALESCE(SUM(CAST(value AS DECIMAL(20,6))) FILTER (WHERE event_type = 'view'), 0) AS DOUBLE) AS v_view
FROM events
GROUP BY user_bucket
ORDER BY user_bucket
"""

ORACLES["top_tokens_exact"] = f"""
SELECT token, COUNT(*) AS cnt
FROM (SELECT unnest({_WORDS}) AS token FROM documents)
GROUP BY token
ORDER BY cnt DESC, token
LIMIT 20
"""

ORACLES["distinct_tokens_by_source"] = f"""
SELECT source, COUNT(DISTINCT token) AS n_distinct
FROM (SELECT source, unnest({_WORDS}) AS token FROM documents)
GROUP BY source
ORDER BY source
"""

# merged gate row (round 5, second rotation wave): the two exact token
# aggregates — heavy hitters and per-source distincts — in one tagged
# frame; the twins compose by UNION
ORACLES["token_stats"] = (
    f"SELECT 'top' AS stat, token AS item, cnt "
    f"FROM ({ORACLES.pop('top_tokens_exact')}) "
    f"UNION ALL "
    f"SELECT 'distinct_by_source' AS stat, source AS item, "
    f"CAST(n_distinct AS BIGINT) AS cnt "
    f"FROM ({ORACLES.pop('distinct_tokens_by_source')}) "
    f"ORDER BY stat, cnt DESC, item")

ORACLES["doc_stats"] = f"""
SELECT doc_id,
       CAST(len(w) AS BIGINT) AS n_words,
       CAST(length(text) AS BIGINT) AS n_chars_computed,
       ROUND((length(text) - len(w) + 1)::DOUBLE / len(w), 6) AS avg_word_len,
       ROUND(len(list_filter(w, x -> list_contains({_STOP}, x)))::DOUBLE / len(w), 6) AS stopword_ratio,
       ROUND(len(list_distinct(w))::DOUBLE / len(w), 6) AS distinct_ratio
FROM (SELECT doc_id, text, {_WORDS} AS w FROM documents)
ORDER BY doc_id
"""

ORACLES["quality_score"] = f"""
SELECT doc_id, n_words,
       ROUND((least(n_words / 64.0, 1.0)
            + least(stopword_ratio * 5.0, 1.0)
            + distinct_ratio) / 3.0, 6) AS quality
FROM (
  SELECT doc_id,
         CAST(len(w) AS BIGINT) AS n_words,
         ROUND(len(list_filter(w, x -> list_contains({_STOP}, x)))::DOUBLE / len(w), 6) AS stopword_ratio,
         ROUND(len(list_distinct(w))::DOUBLE / len(w), 6) AS distinct_ratio
  FROM (SELECT doc_id, text, {_WORDS} AS w FROM documents)
)
ORDER BY doc_id
"""

ORACLES["language_id"] = f"""
SELECT doc_id,
       CASE WHEN n_de > n_fr AND n_de > 0 THEN 'de'
            WHEN n_fr > 0 THEN 'fr'
            ELSE 'en' END AS lang_pred
FROM (
  SELECT doc_id,
         len(list_filter(w, x -> list_contains({_DE}, x))) AS n_de,
         len(list_filter(w, x -> list_contains({_FR}, x))) AS n_fr
  FROM (SELECT doc_id, {_WORDS} AS w FROM documents)
)
ORDER BY doc_id
"""

ORACLES["token_count_regex"] = f"""
SELECT source,
       CAST(SUM(len({_WORDS})) AS BIGINT) AS n_ws_tokens,
       CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^ a-z0-9]'))) AS BIGINT) AS n_bpeish_tokens,
       CAST(SUM(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g'))) AS BIGINT) AS n_vowels,
       COUNT(*) AS n_docs
FROM documents
GROUP BY source
ORDER BY source
"""

ORACLES["repetition_stats"] = f"""
WITH ex AS (
  SELECT doc_id, unnest(CASE WHEN len(w) >= 3 THEN
           list_transform(range(1, len(w) - 1),
                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
         ELSE [] END) AS g
  FROM (SELECT doc_id, {_WORDS} AS w FROM documents)
), per_gram AS (
  SELECT doc_id, g, COUNT(*) AS c FROM ex GROUP BY doc_id, g
), per_doc AS (
  SELECT doc_id, MAX(c) AS max_gram_count, SUM(c) AS n_grams
  FROM per_gram GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_grams, 0)::BIGINT AS n_grams,
       COALESCE(p.max_gram_count, 0)::BIGINT AS max_gram_count,
       COALESCE(ROUND(p.max_gram_count::DOUBLE / p.n_grams::DOUBLE, 6), 0.0) AS rep_score
FROM (SELECT doc_id FROM documents) d
LEFT JOIN per_doc p USING (doc_id)
ORDER BY doc_id
"""

ORACLES["exact_dedup_stats"] = """
SELECT COUNT(*) AS n_docs,
       COUNT(DISTINCT md5(text)) AS n_unique,
       COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dup_docs
FROM documents
"""

# docs with < 2 words have NO 2-gram shingle (empty list, matching
# word_shingles_col) — a truncated/NULL gram must never pair short docs
_SHINGLES_2 = ("CASE WHEN len(w) >= 2 THEN "
               "list_distinct(list_transform(range(1, len(w)), "
               "i -> w[i] || ' ' || w[i+1])) ELSE [] END")

_JACCARD_PAIRS = f"""
WITH sh AS (
  SELECT doc_id AS id, {_SHINGLES_2} AS s
  FROM (SELECT doc_id, {_WORDS} AS w FROM documents)
)
SELECT a.id AS id_a, b.id AS id_b,
       ROUND(len(list_intersect(a.s, b.s))::DOUBLE /
             (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
FROM sh a, sh b
WHERE a.id < b.id
  AND len(a.s) > 0 AND len(b.s) > 0
  AND ROUND(len(list_intersect(a.s, b.s))::DOUBLE /
      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) >= 0.12
ORDER BY id_a, id_b
"""

ORACLES["ngram_jaccard_pairs"] = _JACCARD_PAIRS

# Connected components of the near-dup pair graph: the recursive CTE
# computes the reachability closure (vertex, reachable-source) over the
# symmetric edge set; MIN over reached sources = the component's minimum
# id — exactly `connected_components`' min-label fixpoint. The twin is
# df-CAP-AWARE: like the registered Spark query, candidate pairs come
# only from shingles in ≤ 200 docs (the `cold` CTE mirrors
# `ngram_jaccard_pairs(max_shingle_df=200)`'s anti-join), while the
# Jaccard verification still uses the FULL shingle sets — exact parity
# of the capped production algorithm.
ORACLES["neardup_clusters"] = f"""
WITH RECURSIVE sh AS (
  SELECT doc_id AS id, {_SHINGLES_2} AS s
  FROM (SELECT doc_id, {_WORDS} AS w FROM documents)
), ex AS (
  SELECT id, unnest(s) AS g FROM sh
), cold AS (
  SELECT g FROM ex GROUP BY g HAVING COUNT(*) <= 200
), cex AS (
  SELECT e.id, e.g FROM ex e JOIN cold USING (g)
), cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM cex a JOIN cex b ON a.g = b.g AND a.id < b.id
), pairs AS (
  SELECT c.id_a, c.id_b
  FROM cand c JOIN sh a ON a.id = c.id_a JOIN sh b ON b.id = c.id_b
  WHERE ROUND(len(list_intersect(a.s, b.s))::DOUBLE /
        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) >= 0.12
), edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), walk(id, comp) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT e.v, w.comp FROM walk w JOIN edges e ON e.u = w.id
)
SELECT id AS doc_id, MIN(comp) AS cluster_id,
       (id = MIN(comp)) AS is_canonical
FROM walk GROUP BY id ORDER BY doc_id
"""

def _mulc_u64(z: str, c: int) -> str:
    """HUGEINT SQL for (z * c) mod 2^64 without int128 overflow: split the
    constant into 32-bit halves (z < 2^64, so z·lo < 2^96 fits)."""
    hi, lo = c >> 32, c & 0xFFFFFFFF
    return (f"(({z}) * {lo}::HUGEINT + "
            f"((({z}) * {hi}::HUGEINT) % 4294967296::HUGEINT) * "
            f"4294967296::HUGEINT) % 18446744073709551616::HUGEINT")


# documents → sequences tokenization: the twin recomputes the top-512
# vocabulary with the same (count DESC, term ASC) total order and
# derives the per-doc scalars from the exploded (position, token-id)
# join — equality of Σ tid·pos pins every token id at every position.
ORACLES["tokenize_vocab"] = f"""
WITH counts AS (
  SELECT term, COUNT(*) AS cnt
  FROM (SELECT unnest({_WORDS}) AS term FROM documents) GROUP BY term
), vocab AS (
  SELECT term, ROW_NUMBER() OVER (ORDER BY cnt DESC, term ASC) - 1 AS token_id
  FROM counts QUALIFY token_id < 16
), w AS (
  SELECT doc_id, unnest(ws) AS term, unnest(range(1, len(ws) + 1)) AS pos
  FROM (SELECT doc_id, {_WORDS} AS ws FROM documents)
), joined AS (
  SELECT w.doc_id, w.pos, COALESCE(v.token_id, -1)::BIGINT AS tid
  FROM w LEFT JOIN vocab v USING (term)
), per_doc AS (
  SELECT doc_id,
         COUNT(*)::BIGINT AS n_tok,
         COUNT(*) FILTER (WHERE tid = -1)::BIGINT AS n_oov,
         SUM(tid * pos)::BIGINT AS tok_hash
  FROM joined GROUP BY doc_id
)
-- left join back onto documents: a zero-word doc appears with
-- n_tok = 0 / tok_hash = 0 (mirrors operators/pipeline.py::tokenize)
SELECT d.doc_id,
       COALESCE(p.n_tok, 0)::BIGINT AS n_tok,
       COALESCE(p.n_oov, 0)::BIGINT AS n_oov,
       COALESCE(p.tok_hash, 0)::BIGINT AS tok_hash
FROM documents d LEFT JOIN per_doc p USING (doc_id) ORDER BY doc_id
"""

# next-fit packing replayed as a recursive CTE: one step per document
# within each source stream, identical overflow rule to
# operators/pipeline.py::pack_sequences
ORACLES["pack_sequences"] = f"""
WITH RECURSIVE d AS (
  SELECT doc_id, source, len({_WORDS})::BIGINT AS w,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
), walk(source, rn, doc_id, w, pack_id, fill) AS (
  SELECT source, rn, doc_id, w, 0::BIGINT, w FROM d WHERE rn = 1
  UNION ALL
  SELECT d.source, d.rn, d.doc_id, d.w,
         CASE WHEN walk.fill > 0 AND walk.fill + d.w > 1024
              THEN walk.pack_id + 1 ELSE walk.pack_id END,
         CASE WHEN walk.fill > 0 AND walk.fill + d.w > 1024
              THEN d.w ELSE walk.fill + d.w END
  FROM walk JOIN d ON d.source = walk.source AND d.rn = walk.rn + 1
)
SELECT doc_id, source, pack_id, (fill - w) AS pack_offset
FROM walk ORDER BY doc_id
"""

# train/eval 8-gram decontamination; shingle definition mirrors
# word_shingles_col(n=8) — docs under 8 words have NO gram
_SHINGLES_8 = ("CASE WHEN len(w) >= 8 THEN "
               "list_distinct(list_transform(range(1, len(w) - 6), "
               "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]"
               " || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' "
               "|| w[i+7])) ELSE [] END")

ORACLES["decontaminate_8gram"] = f"""
WITH b AS (
  SELECT DISTINCT unnest({_SHINGLES_8}) AS g
  FROM (SELECT {_WORDS} AS w FROM documents WHERE doc_id % 97 = 0)
), t AS (
  SELECT doc_id, unnest({_SHINGLES_8}) AS g
  FROM (SELECT doc_id, {_WORDS} AS w FROM documents WHERE doc_id % 97 <> 0)
), hits AS (
  SELECT t.doc_id, COUNT(DISTINCT t.g) AS shared_grams
  FROM t JOIN b USING (g) GROUP BY t.doc_id
)
SELECT d.doc_id,
       COALESCE(h.shared_grams, 0)::BIGINT AS shared_grams,
       COALESCE(h.shared_grams, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
LEFT JOIN hits h USING (doc_id)
ORDER BY d.doc_id
"""

# overlapping word chunks (size 20, overlap 5 → stride 15): closed-form
# chunk count; md5 of each re-sliced chunk pins every boundary
ORACLES["chunk_text"] = f"""
WITH d AS (
  SELECT doc_id, {_WORDS} AS w, len({_WORDS}) AS n FROM documents
), k AS (
  SELECT doc_id, w, n,
         CASE WHEN n <= 20 THEN 1
              ELSE CAST(ceil((n - 20)::DOUBLE / 15.0) AS INT) + 1 END AS n_chunks
  FROM d
), ex AS (
  SELECT doc_id, n_chunks, unnest(range(0, n_chunks)) AS cid, w FROM k
)
SELECT doc_id,
       cid::INT AS chunk_id,
       n_chunks::INT AS n_chunks,
       len(w[cid*15 + 1 : cid*15 + 20])::BIGINT AS chunk_words,
       md5(array_to_string(w[cid*15 + 1 : cid*15 + 20], ' ')) AS chunk_hash
FROM ex ORDER BY doc_id, chunk_id
"""

# multimodal decode gate: pixel (doc_id·48+i) = splitmix64 mod 256 —
# the twin regenerates every pixel in HUGEINT SQL and aggregates the
# same exact-in-float32 features the distributed codec reports
_SM_K = 0x9E3779B97F4A7C15

ORACLES["image_decode_features"] = f"""
WITH ex AS (
  SELECT doc_id, unnest(range(0, 48)) AS i FROM documents
), s0 AS (
  SELECT doc_id, i,
         ((doc_id * 48 + i)::HUGEINT + {_SM_K}::HUGEINT)
           % 18446744073709551616::HUGEINT AS z
  FROM ex
), s1 AS (
  SELECT doc_id, i,
         {_mulc_u64("xor(z, z // 1073741824::HUGEINT)", 0xBF58476D1CE4E5B9)} AS z
  FROM s0
), s2 AS (
  SELECT doc_id, i,
         {_mulc_u64("xor(z, z // 134217728::HUGEINT)", 0x94D049BB133111EB)} AS z
  FROM s1
), px AS (
  SELECT doc_id, i,
         (xor(z, z // 2147483648::HUGEINT) % 256::HUGEINT)::BIGINT AS v
  FROM s2
)
SELECT doc_id,
       4::BIGINT AS width, 4::BIGINT AS height,
       AVG(v) FILTER (WHERE i % 3 = 0) AS mean_r,
       AVG(v) FILTER (WHERE i % 3 = 1) AS mean_g,
       AVG(v) FILTER (WHERE i % 3 = 2) AS mean_b,
       MIN(v)::BIGINT AS min_px, MAX(v)::BIGINT AS max_px
FROM px GROUP BY doc_id ORDER BY doc_id
"""

# deterministic train/val/test split: splitmix64(doc_id, seed=101)
# mod 10000 against cumulative 90/5/5 thresholds, in HUGEINT SQL
_SM_SEED_ADD_101 = (101 * 0x9E3779B97F4A7C15 + 0x9E3779B97F4A7C15) \
    & 0xFFFFFFFFFFFFFFFF

ORACLES["split_assign"] = f"""
WITH s0 AS (
  SELECT doc_id,
         (doc_id::HUGEINT + {_SM_SEED_ADD_101}::HUGEINT)
           % 18446744073709551616::HUGEINT AS z
  FROM documents
), s1 AS (
  SELECT doc_id,
         {_mulc_u64("xor(z, z // 1073741824::HUGEINT)", 0xBF58476D1CE4E5B9)} AS z
  FROM s0
), s2 AS (
  SELECT doc_id,
         {_mulc_u64("xor(z, z // 134217728::HUGEINT)", 0x94D049BB133111EB)} AS z
  FROM s1
), b AS (
  SELECT doc_id,
         (xor(z, z // 2147483648::HUGEINT) % 10000::HUGEINT)::BIGINT AS split_bucket
  FROM s2
)
SELECT doc_id, split_bucket,
       CASE WHEN split_bucket < 9000 THEN 'train'
            WHEN split_bucket < 9500 THEN 'val'
            ELSE 'test' END AS split
FROM b ORDER BY doc_id
"""

# vocabulary coverage curve: cumulative share of token occurrences of
# the (count DESC, term ASC)-ranked top-k terms
ORACLES["vocab_coverage"] = f"""
WITH counts AS (
  SELECT term, COUNT(*) AS cnt
  FROM (SELECT unnest({_WORDS}) AS term FROM documents) GROUP BY term
), tot AS (
  SELECT SUM(cnt) AS total, COUNT(*) AS n_terms_total FROM counts
), ranked AS (
  SELECT cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, term ASC) AS rank,
         SUM(cnt) OVER (ORDER BY cnt DESC, term ASC
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM counts
)
-- each requested size clamps to the distinct-term count (coverage 1.0
-- beyond the vocabulary); LEFT JOIN keeps every size row on an empty
-- corpus (coverage 0.0), mirroring operators/pipeline.py::vocab_coverage
SELECT s.vocab_size::INT AS vocab_size,
       COALESCE(ROUND(cum::DOUBLE / total::DOUBLE, 6), 0.0) AS coverage,
       n_terms_total::BIGINT AS n_terms_total
FROM (VALUES (4), (8), (16), (24)) s(vocab_size)
CROSS JOIN tot
LEFT JOIN ranked ON ranked.rank = LEAST(s.vocab_size, n_terms_total)
ORDER BY vocab_size
"""

# the UDAF build is order-invariant (additive integer bucket counts), so
# the plain quantile SQL twin is exact
ORACLES["dds_udaf_by_flag"] = duckdb_quantile_sql(
    "lineitem", "l_quantity", [0.25, 0.75, 0.99], alpha=0.01,
    group_cols=("l_returnflag",))

# day-over-day retention from per-day theta sketches: under-k keeps
# every hash, so DAU and day-pair intersections are exact counts
ORACLES["theta_daily_retention"] = """
WITH du AS (
  SELECT DISTINCT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, user_id
  FROM events
), days AS (
  SELECT day, COUNT(*) AS dau FROM du GROUP BY day
), pairs0 AS (
  SELECT d1.day, d2.day AS next_day, d1.dau, d2.dau AS dau_next
  FROM days d1 JOIN days d2
    ON d2.day = strftime(CAST(d1.day AS DATE) + INTERVAL 1 DAY, '%Y-%m-%d')
), ret AS (
  SELECT a.day, COUNT(*) AS retained
  FROM du a JOIN du b
    ON a.user_id = b.user_id
   AND b.day = strftime(CAST(a.day AS DATE) + INTERVAL 1 DAY, '%Y-%m-%d')
  GROUP BY a.day
)
SELECT p.day, p.next_day, p.dau, p.dau_next,
       COALESCE(r.retained, 0) AS retained
FROM pairs0 p LEFT JOIN ret r USING (day)
ORDER BY p.day
"""

# deterministic-by-construction counters of the multi-sketch build
# (split out of the estimates row — every value is exact): row counters
# are plain sums; bloom_hits_on_inserted = COUNT(DISTINCT user_id) by
# the Bloom no-false-negative guarantee.
ORACLES["sketch_counts_events"] = """
SELECT metric, value FROM (
  SELECT 'bloom_hits_on_inserted' AS metric,
         COUNT(DISTINCT user_id)::DOUBLE AS value FROM events
  UNION ALL
  -- counting-Bloom turnstile: every 7th user retracted; no-FN on the
  -- net-live set + weight-linearity make both rows exact counts
  SELECT 'cbf_hits_after_delete',
         (COUNT(DISTINCT user_id) FILTER (WHERE user_id % 7 <> 0))::DOUBLE
  FROM events
  UNION ALL
  SELECT 'cbf_net_weight_after_delete',
         (COUNT(user_id) FILTER (WHERE user_id % 7 <> 0))::DOUBLE
  FROM events
  UNION ALL
  SELECT 'cms_users_total', COUNT(user_id)::DOUBLE FROM events
  UNION ALL
  SELECT 'kll_value_n', COUNT(value)::DOUBLE FROM events
  UNION ALL
  -- REQ/moments skip non-finite values by documented policy, so their
  -- weight counters count FINITE values (KLL keeps inf, hence plain
  -- COUNT there); identical on inf-free data, exact on any data
  SELECT 'mom_value_n', (COUNT(*) FILTER (WHERE isfinite(value)))::DOUBLE
  FROM events
  UNION ALL
  SELECT 'n_rows', COUNT(value)::DOUBLE FROM events
  UNION ALL
  SELECT 'req_value_n', (COUNT(*) FILTER (WHERE isfinite(value)))::DOUBLE
  FROM events
) ORDER BY metric
"""

# the streaming foreachBatch build merges to the SAME final sketch as
# the batch build (additive order-invariant merge), so its twin is the
# identical hourly quantile SQL
ORACLES["streaming_dds_hourly"] = duckdb_quantile_sql(
    "(SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour_bucket, "
    "value FROM events) t",
    "value", [0.95], alpha=0.01, group_cols=("hour_bucket",))

ORACLES["bm25_topk"] = """
WITH base AS (
  SELECT doc_id,
         len(string_split(text, ' '))::DOUBLE AS dl,
         list_filter(string_split(text, ' '),
                     x -> list_contains(['hash','merge','dup'], x)) AS hits
  FROM documents
), stats AS (
  SELECT COUNT(*)::DOUBLE AS n_docs, AVG(dl) AS avgdl FROM base
), tf AS (
  SELECT doc_id, dl, term, COUNT(*)::DOUBLE AS tf
  FROM (SELECT doc_id, dl, unnest(hits) AS term FROM base WHERE len(hits) > 0)
  GROUP BY doc_id, dl, term
), dfreq AS (
  SELECT term, COUNT(*)::DOUBLE AS df_ FROM tf GROUP BY term
), scored AS (
  SELECT t.doc_id,
         ln(1.0 + (s.n_docs - d.df_ + 0.5) / (d.df_ + 0.5)) *
         (t.tf * (1.2 + 1.0)) /
         (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * t.dl / s.avgdl)) AS part
  FROM tf t JOIN dfreq d USING (term) CROSS JOIN stats s
), per_doc AS (
  SELECT doc_id, ROUND(SUM(part), 6) AS score FROM scored GROUP BY doc_id
)
SELECT doc_id, score, CAST(rnk AS INT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk
      FROM per_doc)
WHERE rnk <= 10
ORDER BY rank
"""
# MinHash-LSH with 64 bands × 2 rows has recall ≈ 1 − (1−J²)⁶⁴ ≥ 0.9998 at
# J = 0.12 and exact-Jaccard verification removes all false positives, so
# its output equals the exact pair set on this data (verified empirically;
# if a pathological miss ever appears the driver records it — that IS the
# recall contract under test).
ORACLES["minhash_lsh_pairs"] = _JACCARD_PAIRS

# 64-bit polynomial rolling hash (Horner over UTF-8 bytes, wraparound
# mod 2^64) — exact HUGEINT twin. Valid because the fixture corpus is
# ASCII (unicode(ch) == the UTF-8 byte); the seed is prepended so
# list_reduce starts from it, and the final value re-wraps to signed.
ORACLES["rolling_fingerprint"] = """
SELECT doc_id,
       CAST(CASE WHEN fp >= 9223372036854775808::HUGEINT
                 THEN fp - 18446744073709551616::HUGEINT
                 ELSE fp END AS BIGINT) AS fingerprint
FROM (
  SELECT doc_id,
         list_reduce(
           list_prepend(14695981039346656037::HUGEINT,
             list_transform(range(1, length(text) + 1),
                            i -> unicode(text[i])::HUGEINT)),
           (a, b) -> (a * 1000003 + b) % 18446744073709551616::HUGEINT) AS fp
  FROM documents)
ORDER BY doc_id
"""



_SM_SEED_ADD = (33 * 0x9E3779B97F4A7C15 + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF

# splitmix64(doc_id, seed=33) in HUGEINT-mod-2^64 SQL: the bottom-k
# sampler's tag is pure arithmetic, so the stratified sample has an
# EXACT twin — 20 smallest tags per source.
ORACLES["stratified_sample"] = f"""
WITH s0 AS (
  SELECT source, doc_id,
         (doc_id::HUGEINT + {_SM_SEED_ADD}::HUGEINT)
           % 18446744073709551616::HUGEINT AS z
  FROM documents
), s1 AS (
  SELECT source, doc_id,
         {_mulc_u64("xor(z, z // 1073741824::HUGEINT)", 0xBF58476D1CE4E5B9)} AS z
  FROM s0
), s2 AS (
  SELECT source, doc_id,
         {_mulc_u64("xor(z, z // 134217728::HUGEINT)", 0x94D049BB133111EB)} AS z
  FROM s1
), ranked AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY xor(z, z // 2147483648::HUGEINT)) AS rn
  FROM s2
)
SELECT source, doc_id FROM ranked WHERE rn <= 20
ORDER BY source, doc_id
"""

# Theta/KMV with k >= the distinct-hash count keeps EVERY hash (theta
# stays 1), so intersection/union cardinalities are exact counts — the
# fixture vocabulary (~31 tokens/source) is far under k=4096, making the
# per-pair set-op SQL a hard oracle on the theta build/merge/set-op
# machinery. Saturated-k accuracy is pytest-bound-tested.
ORACLES["theta_token_overlap"] = f"""
WITH t AS (
  SELECT DISTINCT source, unnest({_WORDS}) AS token FROM documents
), c AS (
  SELECT source, COUNT(*) AS n FROM t GROUP BY source
), inter AS (
  SELECT a.source AS sa, b.source AS sb, COUNT(*) AS i
  FROM t a JOIN t b ON a.token = b.token AND a.source < b.source
  GROUP BY sa, sb
)
SELECT ca.source AS source_a, cb.source AS source_b,
       ROUND(COALESCE(i, 0)::DOUBLE, 1) AS inter_est,
       ROUND((ca.n + cb.n - COALESCE(i, 0))::DOUBLE, 1) AS union_est
FROM c ca JOIN c cb ON ca.source < cb.source
LEFT JOIN inter ON inter.sa = ca.source AND inter.sb = cb.source
ORDER BY source_a, source_b
"""

# SpaceSaving with k >= distinct keys never evicts -> exact counts.
ORACLES["heavy_users_spacesaving"] = """
SELECT user_id, COUNT(*) AS cnt
FROM events
GROUP BY user_id
ORDER BY cnt DESC, user_id
LIMIT 10
"""

# Frequent Directions in lossless mode (ell = d >= rank): the sketch's
# gram matrix equals A'A exactly, so the twin is plain sums of element
# products (float32 inputs cast to double on both sides).
ORACLES["fd_gram_exact"] = """
WITH pairs AS (
  SELECT i.range AS i, j.range AS j
  FROM range(8) i, range(8) j
  WHERE i.range <= j.range
)
SELECT i, j,
       ROUND(SUM(embedding[CAST(i AS INT) + 1]::DOUBLE *
                 embedding[CAST(j AS INT) + 1]::DOUBLE), 6) AS gram
FROM embeddings, pairs
GROUP BY i, j
ORDER BY i, j
"""

# A-ES weighted sample: tag = ((splitmix64(id)+0.5)/2^64)^(1/w), top-20
# tags per source. Tag floats differ by <= 1 ulp across engines (libm
# pow); the selected ID set is ordering-stable on this data (pinned by
# the oracle itself: any flip would mismatch).
ORACLES["weighted_sample"] = f"""
WITH s0 AS (
  SELECT source, doc_id, n_chars,
         (doc_id::HUGEINT + {_SM_SEED_ADD}::HUGEINT)
           % 18446744073709551616::HUGEINT AS z
  FROM documents
), s1 AS (
  SELECT source, doc_id, n_chars,
         {_mulc_u64("xor(z, z // 1073741824::HUGEINT)", 0xBF58476D1CE4E5B9)} AS z
  FROM s0
), s2 AS (
  SELECT source, doc_id, n_chars,
         {_mulc_u64("xor(z, z // 134217728::HUGEINT)", 0x94D049BB133111EB)} AS z
  FROM s1
), ranked AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY power((xor(z, z // 2147483648::HUGEINT)::DOUBLE + 0.5)
                          / 18446744073709551616.0, 1.0 / n_chars) DESC,
                    doc_id) AS rn
  FROM s2
)
SELECT source, doc_id FROM ranked WHERE rn <= 20
ORDER BY source, doc_id
"""

ORACLES["ann_cosine_topk"] = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < 10
), scored AS (
  SELECT q.query_id,
         e.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS cosine
  FROM embeddings e, q
  WHERE e.vec_id != q.query_id
)
SELECT query_id, CAST(rnk AS INT) AS rank, neighbor_id, cosine
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored)
WHERE rnk <= 5
ORDER BY query_id, rnk
"""

# Full-probe configurations provably equal brute force (multiprobe
# radius = planes covers every bucket; nprobe = nlist scans every list),
# so the exact top-k SQL is a hard oracle on the ANN machinery.
ORACLES["ann_topk_lsh"] = ORACLES["ann_cosine_topk"]
ORACLES["ann_topk_ivf"] = ORACLES["ann_cosine_topk"]

ORACLES["embedding_neardup"] = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id
  AND ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.8
ORDER BY id_a, id_b
"""

# SemDeDup exactness regime (k = 1): all pairs are within-cluster, so
# the output is the exact all-pairs cosine filter with cluster_id 0.
ORACLES["semdedup_pairs"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
           FROM embeddings WHERE vec_id < 512)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, CAST(0 AS INT) AS cluster_id,
       ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.4
ORDER BY id_a, id_b
"""

# Distributed k-means exactness regime (k = 1, iters = 1): the fitted
# centroid is normalize(Σ v̂) over the row-normalized corpus — identical
# per-row normalize formula (max(‖v‖, 1e-12) floor) and final
# renormalization as operators/kmeans.py; round-6 absorbs summation-
# order float drift, the same contract as every averaged-double oracle.
ORACLES["kmeans_centroid"] = """
WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
nrm AS (
  SELECT list_transform(
           v, x -> x / greatest(sqrt(list_sum(list_transform(v, y -> y * y))),
                                1e-12)) AS nv
  FROM e
),
comp AS (
  SELECT unnest(range(1, len(nv) + 1)) AS dim1, unnest(nv) AS x FROM nrm
),
s AS (SELECT dim1 - 1 AS dim, SUM(x) AS sx FROM comp GROUP BY dim1),
nn AS (SELECT sqrt(SUM(sx * sx)) AS nrm2 FROM s)
SELECT CAST(dim AS INT) AS dim, ROUND(sx / greatest(nrm2, 1e-12), 6) AS c
FROM s, nn
ORDER BY dim
"""


# ------------------------------------------------- round-3 additions

# Bloom runtime filter has no false negatives and the exact join removes
# false positives, so the twin is the PLAIN join — any divergence means
# the filter dropped a real match.
ORACLES["bloom_filtered_join"] = """
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_totalprice > 450000.0
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

# Winsorized stats: the trim bounds are the DDSketch p01/p99 estimates,
# which the quantile twin reproduces value-exactly; the trimmed
# aggregate is then plain SQL over the same bounds.
ORACLES["winsorized_stats"] = f"""
WITH qe AS ({duckdb_quantile_sql("lineitem", "l_extendedprice", [0.01, 0.99], alpha=0.005)}),
bounds AS (
  SELECT MIN(CASE WHEN q = 0.01 THEN estimate END) AS lo,
         MIN(CASE WHEN q = 0.99 THEN estimate END) AS hi
  FROM qe)
SELECT l_returnflag,
       COUNT(*) AS n_kept,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) AS sum_price,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS avg_price
FROM lineitem CROSS JOIN bounds
WHERE l_extendedprice BETWEEN lo AND hi
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def duckdb_pagerank_sql(edge_sql: str, iterations: int,
                        damping: float = 0.85, topk: int = 20) -> str:
    """Unrolled-iteration twin of `operators.pagerank.pagerank` — one CTE
    trio (contrib, incoming, rank) per synchronous round. Ranks are
    scaled int64 nano-units quantized as floor(x·1e9 + 0.5): decimal
    ROUND-of-double differs between engines, but mul/add/div/floor are
    single correctly-rounded IEEE ops written here with exactly the
    Spark expression's association, so every iteration is bit-identical
    and the BIGINT sums are exact."""
    d = "CAST(0.85 AS DOUBLE)" if damping == 0.85 else f"CAST({damping!r} AS DOUBLE)"

    def q(x: str) -> str:
        return f"CAST(floor(({x}) * 1e9 + 0.5) AS BIGINT)"

    parts = [f"""
WITH edges AS ({edge_sql}),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM nodes),
outdeg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS odeg FROM edges GROUP BY src),
r0 AS (SELECT node, {q("CAST(1.0 AS DOUBLE) / nd")} AS rank_nano
       FROM nodes CROSS JOIN nn)"""]
    for i in range(1, iterations + 1):
        p = i - 1
        upd = (f"(CAST(1.0 AS DOUBLE) - {d}) / nn.nd + {d} * "
               f"(CAST(COALESCE(a.inc, 0) AS DOUBLE) / 1e9 "
               f"+ CAST(g.dang AS DOUBLE) / 1e9 / nn.nd)")
        parts.append(f""",
c{i} AS (SELECT e.dst AS node,
                {q("CAST(r.rank_nano AS DOUBLE) / 1e9 / o.odeg")} AS c
         FROM edges e JOIN r{p} r ON e.src = r.node JOIN outdeg o ON e.src = o.src),
a{i} AS (SELECT node, SUM(c) AS inc FROM c{i} GROUP BY node),
g{i} AS (SELECT COALESCE(SUM(rank_nano), 0) AS dang
         FROM r{p} WHERE node NOT IN (SELECT src FROM outdeg)),
r{i} AS (SELECT n.node, {q(upd)} AS rank_nano
         FROM nodes n LEFT JOIN a{i} a ON n.node = a.node
         CROSS JOIN g{i} g CROSS JOIN nn)""")
    parts.append(f"""
SELECT node, CAST(rank_nano AS DOUBLE) / 1e9 AS rank
FROM r{iterations}
ORDER BY rank DESC, node
LIMIT {topk}""")
    return "".join(parts)


ORACLES["pagerank_topk"] = duckdb_pagerank_sql(
    "SELECT l_partkey AS src, l_suppkey + 4294967296 AS dst FROM lineitem "
    "UNION "
    "SELECT l_suppkey + 4294967296 AS src, l_partkey AS dst FROM lineitem",
    iterations=3, damping=0.85, topk=20)

# Bigram-LM scoring: surprisal written as ln(x)/ln(2) on both engines
# (identical libm expression), rounded per-bigram and summed as
# DECIMAL(20,6) so shuffle order cannot move the sum.
ORACLES["bigram_surprisal"] = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
pos AS (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM toks),
bgs AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bg FROM pos),
corpus AS (SELECT bg, COUNT(*) AS cf FROM bgs GROUP BY bg),
total AS (SELECT CAST(SUM(cf) AS DOUBLE) AS tot FROM corpus),
scored AS (
  SELECT doc_id, cf,
         CAST(ROUND(-ln(CAST(cf AS DOUBLE) / tot) / ln(CAST(2.0 AS DOUBLE)), 6)
              AS DECIMAL(20,6)) AS surp
  FROM bgs JOIN corpus USING (bg) CROSS JOIN total)
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       COUNT(*) FILTER (WHERE cf < 3) AS n_rare,
       ROUND(CAST(COUNT(*) FILTER (WHERE cf < 3) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS rare_ratio,
       CAST(SUM(surp) AS DOUBLE) AS surprisal
FROM scored
GROUP BY doc_id
ORDER BY doc_id
"""


from p2pddsketch_spark.operators.layout import (duckdb_zorder_expr,
                                                 duckdb_zorder_expr_nd)

ORACLES["zorder_index"] = f"""
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       l_partkey, l_suppkey,
       {duckdb_zorder_expr("l_partkey", "l_suppkey", bits=11)} AS z
FROM lineitem
ORDER BY z, l_orderkey, l_linenumber
LIMIT 200
"""

ORACLES["zorder3_index"] = f"""
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       l_partkey, l_suppkey,
       {duckdb_zorder_expr_nd(["l_partkey", "l_suppkey", "l_orderkey"],
                              bits=10)} AS z
FROM lineitem
ORDER BY z, l_orderkey, l_linenumber
LIMIT 200
"""

# Redaction twin: identical RE2/Java-compatible patterns, identical
# email -> phone -> ip replacement order, counts on the original text.
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_PHONE = "\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
_PII_IP = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
ORACLES["redact_pii"] = f"""
WITH src AS (
  SELECT event_id,
         'contact user' || CAST(user_id AS VARCHAR)
         || ' at user' || CAST(user_id AS VARCHAR)
         || '@example.com or +1-555-'
         || lpad(CAST(user_id % 10000 AS VARCHAR), 4, '0')
         || ' ip 10.' || CAST(user_id % 256 AS VARCHAR)
         || '.0.' || CAST(event_id % 256 AS VARCHAR) AS text
  FROM events WHERE event_id < 2000)
SELECT event_id,
       regexp_replace(regexp_replace(regexp_replace(text,
           '{_PII_EMAIL}', '[EMAIL]', 'g'),
           '{_PII_PHONE}', '[PHONE]', 'g'),
           '{_PII_IP}', '[IP]', 'g') AS redacted,
       len(regexp_extract_all(text, '{_PII_EMAIL}')) AS n_email,
       len(regexp_extract_all(text, '{_PII_PHONE}')) AS n_phone,
       len(regexp_extract_all(text, '{_PII_IP}')) AS n_ip
FROM src
ORDER BY event_id
"""

ORACLES["json_props_stats"] = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       ROUND(CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS avg_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""

# Salting only routes rows to reducers — the oracle is the plain join.
ORACLES["salted_join_revenue"] = """
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

# SCD-2 merge replay: versioning the change log with one LEAD window in
# (ts, event_id) order reproduces open-row seeding + interval closing.
ORACLES["scd2_user_value"] = """
SELECT user_id, value,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
       strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                '%Y-%m-%d %H:%M:%S.%f') AS valid_to
FROM events
WHERE user_id < 100
ORDER BY user_id, valid_from
"""

# Triangle counting: identical canonical-edge wedge-close join algebra.
ORACLES["triangle_counts"] = """
WITH co AS (
  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_partkey < 300 AND b.l_partkey < 300),
tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM co e1
  JOIN co e2 ON e1.b = e2.a
  JOIN co e3 ON e3.a = e1.a AND e3.b = e2.b),
participation AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri)
SELECT node, COUNT(*) AS n_triangles
FROM participation
GROUP BY node
ORDER BY n_triangles DESC, node
LIMIT 20
"""

# UDTF lateral n-grams == zipped-unnest twin (pos is 0-based).
ORACLES["udtf_ngram_stats"] = """
WITH g AS (
  SELECT lang, ws[i] || ' ' || ws[i+1] AS gram, i - 1 AS pos
  FROM (SELECT lang, ws, unnest(range(1, len(ws))) AS i
        FROM (SELECT lang, string_split(text, ' ') AS ws FROM documents)))
SELECT lang,
       COUNT(*) AS n_grams,
       COUNT(DISTINCT gram) AS n_distinct,
       CAST(SUM(pos) AS BIGINT) AS pos_checksum
FROM g
GROUP BY lang
ORDER BY lang
"""


# ------------------------------------------------- XXH64-in-SQL oracles
# With xxhash64 itself expressed in SQL (functions/xxh_sql.py), the
# "hash-dependent" production pipelines stop being rows-only: the twin
# replays hashing, Mersenne-61 permutations, banding, candidate
# generation and exact verification end-to-end.

def _minhash_chain_sql(shl_ctes: str, threshold: float, num_perm: int,
                       bands: int, seed: int) -> str:
    """Shared tail of every MinHash twin: given WITH-clause CTEs ending
    in `shl(id, s array<varchar>)` (the per-doc distinct shingle
    strings), replay XXH64(shingle) → h mod M61 → min over (a·h+b) mod
    M61 per permutation (constants from the same seeded generator) →
    band signature lists → bucket-collision candidates → exact Jaccard
    ≥ threshold. One implementation so a banding/permutation fix can
    never diverge between the text and token gates."""
    from p2pddsketch_spark.functions.xxh_sql import xxhash64_sql_ctes
    from p2pddsketch_spark.operators.dedup import _perm_params
    pa, pb = _perm_params(num_perm, seed)
    rows = num_perm // bands
    m61 = (1 << 61) - 1
    perm_vals = ", ".join(f"({i}, {int(pa[i])}::HUGEINT, {int(pb[i])}::HUGEINT)"
                          for i in range(num_perm))
    jac = ("ROUND(len(list_intersect(x.s, y.s))::DOUBLE / "
           "(len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))), 6)")
    return f"""
WITH {shl_ctes},
shx AS (SELECT id, unnest(s) AS s FROM shl),
strs AS (SELECT DISTINCT s FROM shx),{xxhash64_sql_ctes("strs", "s", "hx")},
perms(p, pa, pb) AS (VALUES {perm_vals}),
sigs AS (
  SELECT shx.id, pr.p, MIN((pr.pa * (hx.h % {m61}) + pr.pb) % {m61}) AS mn
  FROM shx JOIN hx USING (s) CROSS JOIN perms pr
  GROUP BY shx.id, pr.p),
bnd AS (
  SELECT id, p // {rows} AS band, list(mn ORDER BY p) AS bsig
  FROM sigs GROUP BY id, p // {rows}),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bnd a JOIN bnd b ON a.band = b.band AND a.bsig = b.bsig AND a.id < b.id)
SELECT c.id_a, c.id_b, {jac} AS jaccard
FROM cand c JOIN shl x ON x.id = c.id_a JOIN shl y ON y.id = c.id_b
WHERE {jac} >= {threshold!r}
ORDER BY id_a, id_b
"""


def _minhash_prod_sql(threshold: float = 0.5, num_perm: int = 128,
                      bands: int = 32, seed: int = 7) -> str:
    """Twin of `dedup.minhash_lsh_pairs(threshold, num_perm, bands, n=2)`.
    Docs with no bigram shingle are absent on both sides at fixture
    scales (min doc length ≥ 10 words)."""
    return _minhash_chain_sql(
        f"""w0 AS (SELECT doc_id, {_WORDS} AS w FROM documents),
shl AS (SELECT doc_id AS id, {_SHINGLES_2} AS s FROM w0)""",
        threshold, num_perm, bands, seed)


ORACLES["minhash_lsh_pairs_prod"] = _minhash_prod_sql()


def _simhash_wide_sql(max_hamming: int = 8, n_shingle: int = 2) -> str:
    """Twin of `dedup.simhash_neardup_pairs_wide(max_hamming, n=2)`:
    one XXH64 chain (seed 42) for h1, then h2 = Spark's multi-column
    continuation hashInt(0x5EED, seed=h1) (a closed-form 4-byte XXH64
    tail — verified bit-exact against `F.xxhash64(s, lit(0x5EED))`) →
    128 vote bits per doc →
    block values per the same layout → C(B,2) combo keys → key-collision
    candidates → exact two-word popcount ≤ radius."""
    from p2pddsketch_spark.functions.xxh_sql import (M64, P1, P2, P3, P5,
                                                     _scmul, _sm64, _srotl,
                                                     _sxor, xxhash64_sql_ctes)
    from p2pddsketch_spark.operators.dedup import simhash128_block_layout
    c1 = (P5 + 4) % M64                    # seed offset: P5 + byte length
    k = (0x5EED * P1) % M64                # the int lane premultiplied
    t1 = _sxor(_sm64(f"h + {c1}::HUGEINT"), f"{k}::HUGEINT")
    t2 = _sm64(_scmul(_srotl(t1, 23), P2) + f" + {P3}")
    blocks, combos = simhash128_block_layout(max_hamming)
    max_w = max(w for _, w in blocks)
    blk_vals = ", ".join(f"({bi}, {st}, {wd})"
                         for bi, (st, wd) in enumerate(blocks))
    combo_vals = ", ".join(f"({ci}, {i}, {j})"
                           for ci, (i, j) in enumerate(combos))
    pc = ("(bit_count(((({x}) >> 32))::BIGINT) + "
          "bit_count((({x}) & 4294967295)::BIGINT))")
    ham = (pc.format(x="xor(a.hb, b.hb)") + " + " +
           pc.format(x="xor(a.lb, b.lb)"))
    return f"""
WITH w0 AS (SELECT doc_id, {_WORDS} AS w FROM documents),
shl AS (SELECT doc_id AS id, {_SHINGLES_2} AS s FROM w0),
shx AS (SELECT id, unnest(s) AS s FROM shl),
strs AS (SELECT DISTINCT s FROM shx),{xxhash64_sql_ctes("strs", "s", "hx1", seed=42)},
h2a AS (SELECT s, h AS h1, {t2} AS t2 FROM hx1),
h2b AS (SELECT *, {_scmul(_sxor("t2", "t2 >> 33"), P2)} AS u1 FROM h2a),
h2c AS (SELECT *, {_scmul(_sxor("u1", "u1 >> 29"), P3)} AS u2 FROM h2b),
hh AS (SELECT s, h1, {_sxor("u2", "u2 >> 32")} AS h2 FROM h2c),
bits AS (
  SELECT shx.id, b.bit,
         CASE WHEN b.bit < 64 THEN (hh.h1 >> b.bit) & 1
              ELSE (hh.h2 >> (b.bit - 64)) & 1 END AS bv
  FROM shx JOIN hh USING (s)
  CROSS JOIN (SELECT unnest(range(0, 128)) AS bit) b),
fp AS (
  SELECT id, bit, CASE WHEN SUM(2 * bv - 1) > 0 THEN 1::HUGEINT
                       ELSE 0::HUGEINT END AS f
  FROM bits GROUP BY id, bit),
words AS (
  SELECT id,
         SUM(CASE WHEN bit < 64 THEN f << bit ELSE 0::HUGEINT END) AS hb,
         SUM(CASE WHEN bit >= 64 THEN f << (bit - 64) ELSE 0::HUGEINT END) AS lb
  FROM fp GROUP BY id),
blkdef(bi, st, wd) AS (VALUES {blk_vals}),
bvals AS (
  SELECT fp.id, d.bi, SUM(fp.f << (fp.bit - d.st))::BIGINT AS bv
  FROM fp JOIN blkdef d ON fp.bit >= d.st AND fp.bit < d.st + d.wd
  GROUP BY fp.id, d.bi),
combodef(ci, i, j) AS (VALUES {combo_vals}),
keyed AS (
  SELECT x.id, (c.ci::BIGINT << 52) | (x.bv << {max_w}) | y.bv AS k
  FROM combodef c
  JOIN bvals x ON x.bi = c.i
  JOIN bvals y ON y.bi = c.j AND y.id = x.id),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM keyed a JOIN keyed b ON a.k = b.k AND a.id < b.id)
SELECT c.id_a, c.id_b, CAST({ham} AS INTEGER) AS hamming
FROM cand c
JOIN words a ON a.id = c.id_a
JOIN words b ON b.id = c.id_b
WHERE {ham} <= {max_hamming}
ORDER BY id_a, id_b
"""


ORACLES["simhash_neardup_pairs"] = _simhash_wide_sql()


ORACLES["tpch_q12"] = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate < TIMESTAMP '1996-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

ORACLES["tpch_q14"] = """
SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                  THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))
                  ELSE CAST(0 AS DECIMAL(20,6)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE), 6)
         AS promo_share,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE)
         AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
"""

ORACLES["table_stats"] = "SELECT " + ", ".join(
    f"ROUND(MIN({c}), 6) AS {c}_min, ROUND(MAX({c}), 6) AS {c}_max, "
    f"COUNT(DISTINCT {c}) AS {c}_ndv, "
    f"COUNT(CASE WHEN {c} IS NULL THEN 1 END) AS {c}_nulls"
    for c in ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
) + " FROM lineitem"

# Theta UDAF in the under-k exact regime: both the direct build and the
# day-partial union-merge must equal plain COUNT(DISTINCT).
ORACLES["theta_distinct_by_type"] = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users_direct,
       COUNT(DISTINCT user_id) AS n_users_rolled
FROM events
GROUP BY event_type
ORDER BY event_type
"""

# JPEG decode gate: quality-100 constant tiles round-trip exactly, so
# the twin regenerates the tile values (splitmix64) and aggregates.
ORACLES["jpeg_decode_features"] = f"""
WITH ex AS (
  SELECT doc_id, unnest(range(0, 16)) AS i FROM documents
), s0 AS (
  SELECT doc_id, i,
         ((doc_id * 16 + i)::HUGEINT + {_SM_K}::HUGEINT)
           % 18446744073709551616::HUGEINT AS z
  FROM ex
), s1 AS (
  SELECT doc_id, i,
         {_mulc_u64("xor(z, z // 1073741824::HUGEINT)", 0xBF58476D1CE4E5B9)} AS z
  FROM s0
), s2 AS (
  SELECT doc_id, i,
         {_mulc_u64("xor(z, z // 134217728::HUGEINT)", 0x94D049BB133111EB)} AS z
  FROM s1
), px AS (
  SELECT doc_id, (xor(z, z // 2147483648::HUGEINT) % 256::HUGEINT)::BIGINT AS v
  FROM s2
)
SELECT doc_id,
       32::BIGINT AS width, 32::BIGINT AS height,
       AVG(v) AS mean_px,
       MIN(v)::BIGINT AS min_px, MAX(v)::BIGINT AS max_px
FROM px GROUP BY doc_id ORDER BY doc_id
"""

# WAV audio gate: PCM is lossless; every feature is exact arithmetic on
# the regenerated splitmix samples (float32-cast at the end like the
# Spark schema). signbit(v) == v < 0 for integer samples.
ORACLES["audio_decode_features"] = f"""
WITH ex AS (
  SELECT doc_id, unnest(range(0, 256)) AS i FROM documents
), s0 AS (
  SELECT doc_id, i,
         ((doc_id * 256 + i)::HUGEINT + {_SM_K}::HUGEINT)
           % 18446744073709551616::HUGEINT AS z
  FROM ex
), s1 AS (
  SELECT doc_id, i,
         {_mulc_u64("xor(z, z // 1073741824::HUGEINT)", 0xBF58476D1CE4E5B9)} AS z
  FROM s0
), s2 AS (
  SELECT doc_id, i,
         {_mulc_u64("xor(z, z // 134217728::HUGEINT)", 0x94D049BB133111EB)} AS z
  FROM s1
), smp AS (
  SELECT doc_id, i,
         (xor(z, z // 2147483648::HUGEINT) % 65536::HUGEINT)::BIGINT - 32768 AS v
  FROM s2
), zc AS (
  SELECT doc_id,
         COUNT(CASE WHEN (v < 0) <> (pv < 0) THEN 1 END) AS zx
  FROM (SELECT doc_id, v,
               lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv FROM smp)
  GROUP BY doc_id
)
SELECT s.doc_id,
       CAST(CAST(16.0 AS REAL) AS DOUBLE) AS duration_ms,
       16000 AS sample_rate, 1 AS channels,
       CAST(CAST(sqrt(CAST(SUM(v * v) AS DOUBLE) / 256.0) / 32768.0 AS REAL) AS DOUBLE) AS rms,
       CAST(CAST(CAST(MAX(abs(v)) AS DOUBLE) / 32768.0 AS REAL) AS DOUBLE) AS peak,
       MIN(zc.zx)::BIGINT AS zero_crossings
FROM smp s JOIN zc ON zc.doc_id = s.doc_id
GROUP BY s.doc_id
ORDER BY s.doc_id
"""

# PNG is lossless: the compressed-codec gate shares the PPM oracle.
ORACLES["png_decode_features"] = ORACLES["image_decode_features"]

# Video gate: sampled frames {0, 3} of 6 at step round(300*10/1000)=3;
# per-frame mean = exact integer sum / 48 (one double division).
ORACLES["video_sample_features"] = f"""
WITH ex AS (
  SELECT doc_id, f, unnest(range(0, 48)) AS i
  FROM documents CROSS JOIN (SELECT unnest([0, 3]) AS f)
), s0 AS (
  SELECT doc_id, f, i,
         ((doc_id * 288 + f * 48 + i)::HUGEINT + {_SM_K}::HUGEINT)
           % 18446744073709551616::HUGEINT AS z
  FROM ex
), s1 AS (
  SELECT doc_id, f, i,
         {_mulc_u64("xor(z, z // 1073741824::HUGEINT)", 0xBF58476D1CE4E5B9)} AS z
  FROM s0
), s2 AS (
  SELECT doc_id, f, i,
         {_mulc_u64("xor(z, z // 134217728::HUGEINT)", 0x94D049BB133111EB)} AS z
  FROM s1
), px AS (
  SELECT doc_id, f,
         (xor(z, z // 2147483648::HUGEINT) % 256::HUGEINT)::BIGINT AS v
  FROM s2
), fm AS (
  SELECT doc_id, f, ROUND(CAST(SUM(v) AS DOUBLE) / 48.0, 6) AS m
  FROM px GROUP BY doc_id, f
)
SELECT doc_id, 2 AS n_sampled,
       MIN(CASE WHEN f = 0 THEN m END) AS mean_f0,
       MIN(CASE WHEN f = 3 THEN m END) AS mean_f1
FROM fm GROUP BY doc_id ORDER BY doc_id
"""

# Streamed inner interval join with no-eviction watermark == batch join.
ORACLES["streaming_interval_join"] = """
SELECT l.event_id AS l_id, r.event_id AS r_id
FROM (SELECT user_id, ts, event_id FROM events
      WHERE event_id < 3000 AND event_type = 'purchase') l
JOIN (SELECT user_id, ts, event_id FROM events
      WHERE event_id < 3000 AND event_type = 'view') r
  ON l.user_id = r.user_id
 AND r.ts <= l.ts
 AND r.ts > l.ts - INTERVAL 1 HOUR
ORDER BY l_id, r_id
"""

# One-pass DQ report: each rule's violation count in plain SQL.
ORACLES["dq_report"] = """
WITH m AS (
  SELECT COUNT(CASE WHEN l_orderkey IS NULL THEN 1 END) AS nn,
         COUNT(l_orderkey || '#' || l_linenumber)
           - COUNT(DISTINCT l_orderkey || '#' || l_linenumber) AS uq,
         COUNT(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END) AS r50,
         COUNT(CASE WHEN l_quantity < 1 OR l_quantity > 40 THEN 1 END) AS r40,
         COUNT(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
                      OR l_returnflag IS NULL THEN 1 END) AS av,
         1000 - COUNT(*) AS mr
  FROM lineitem)
SELECT rule, kind, violations, passed FROM (
  SELECT 'orderkey_not_null' AS rule, 'not_null' AS kind,
         GREATEST(nn, 0)::BIGINT AS violations, nn <= 0 AS passed FROM m
  UNION ALL
  SELECT 'line_unique', 'unique', GREATEST(uq, 0)::BIGINT, uq <= 0 FROM m
  UNION ALL
  SELECT 'qty_in_1_50', 'in_range', GREATEST(r50, 0)::BIGINT, r50 <= 0 FROM m
  UNION ALL
  SELECT 'qty_under_40', 'in_range', GREATEST(r40, 0)::BIGINT, r40 <= 0 FROM m
  UNION ALL
  SELECT 'flag_accepted', 'accepted_values', GREATEST(av, 0)::BIGINT, av <= 0 FROM m
  UNION ALL
  SELECT 'min_rows', 'non_negative_count', GREATEST(mr, 0)::BIGINT, mr <= 0 FROM m)
ORDER BY rule
"""

# Zipf fit: identical ln/round/decimal-sum pipeline; slope arithmetic
# written with the same association as the Spark expression.
ORACLES["zipf_slope"] = """
WITH top AS (
  SELECT tok, COUNT(*) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY tok ORDER BY cnt DESC, tok LIMIT 100
), ranked AS (
  SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rank FROM top
), vals AS (
  SELECT ROUND(ln(CAST(rank AS DOUBLE)), 6) AS x,
         ROUND(ln(CAST(cnt AS DOUBLE)), 6) AS y
  FROM ranked
), sums AS (
  SELECT CAST(SUM(CAST(x AS DECIMAL(20,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(20,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(ROUND(x * y, 6) AS DECIMAL(20,6))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(ROUND(x * x, 6) AS DECIMAL(20,6))) AS DOUBLE) AS sxx,
         CAST(COUNT(*) AS DOUBLE) AS n
  FROM vals)
SELECT ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
       ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
         AS zipf_intercept,
       CAST(n AS BIGINT) AS n_terms
FROM sums
"""

# Int8 quantization: identical floor(x*scale+0.5) quantizer over
# double-cast float32 elements; residual squares rounded to 12 and
# decimal-summed so list order cannot move the error.
ORACLES["embedding_quantize"] = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), s AS (
  SELECT vec_id, v,
         CASE WHEN list_max(list_transform(v, x -> abs(x))) > 0
              THEN 127.0 / list_max(list_transform(v, x -> abs(x)))
              ELSE 0.0 END AS scale
  FROM e
), c AS (
  SELECT vec_id, v, scale,
         list_transform(range(1, len(v) + 1),
            i -> GREATEST(-127, LEAST(127,
                 CAST(floor(v[i] * scale + 0.5) AS INTEGER)))) AS codes
  FROM s
)
SELECT vec_id,
       len(v) AS n_dims,
       ROUND(scale, 6) AS scale,
       CAST(list_sum(list_transform(codes, x -> CAST(x AS BIGINT))) AS BIGINT)
         AS code_sum,
       CAST(list_sum(list_transform(range(1, len(v) + 1),
            i -> CAST(codes[i] AS BIGINT) * i)) AS BIGINT) AS code_checksum,
       ROUND(sqrt(CAST(list_sum(list_transform(range(1, len(v) + 1),
            i -> CAST(ROUND((v[i] - CAST(codes[i] AS DOUBLE) / scale)
                            * (v[i] - CAST(codes[i] AS DOUBLE) / scale), 12)
                      AS DECIMAL(24,12)))) AS DOUBLE)), 6) AS l2_err
FROM c
ORDER BY vec_id
"""

# Int8 ANN: identical quantizer + exact integer dot ranking.
ORACLES["ann_topk_int8"] = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), s AS (
  SELECT vec_id, v,
         CASE WHEN list_max(list_transform(v, x -> abs(x))) > 0
              THEN 127.0 / list_max(list_transform(v, x -> abs(x)))
              ELSE 0.0 END AS scale
  FROM e
), c AS (
  SELECT vec_id,
         list_transform(range(1, len(v) + 1),
            i -> CAST(GREATEST(-127, LEAST(127,
                 CAST(floor(v[i] * scale + 0.5) AS INTEGER))) AS BIGINT)) AS codes
  FROM s
), scored AS (
  SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, len(x.codes) + 1),
              i -> x.codes[i] * q.codes[i])) AS BIGINT) AS dot_i64
  FROM c x, (SELECT * FROM c WHERE vec_id < 10) q
  WHERE x.vec_id != q.vec_id
)
SELECT query_id, CAST(rnk AS INT) AS rank, neighbor_id, dot_i64
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY dot_i64 DESC, neighbor_id) AS rnk
      FROM scored)
WHERE rnk <= 5
ORDER BY query_id, rnk
"""

# Ordered funnel: identical chained earliest-after-previous semantics.
ORACLES["funnel_conversion"] = """
WITH t1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), t2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND e.ts > t1.t1
  GROUP BY e.user_id
), t3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t2.t2
  GROUP BY e.user_id
)
SELECT stage, n_users FROM (
  SELECT '1_view' AS stage, COUNT(*) AS n_users FROM t1
  UNION ALL
  SELECT '2_click_after_view', COUNT(*) FROM t2
  UNION ALL
  SELECT '3_purchase_after_click', COUNT(*) FROM t3)
ORDER BY stage
"""

# Session durations (30-min gap sessionization) fed into the DDSketch
# quantile twin — epoch() keeps microseconds like the Spark double cast.
ORACLES["session_duration_p95"] = duckdb_quantile_sql(
    """(
  WITH marked AS (
    SELECT user_id, ts, event_id,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
  ), sess AS (
    SELECT user_id, ts,
           SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sess_id
    FROM marked
  )
  SELECT MAX(epoch(ts)) - MIN(epoch(ts)) AS dur_secs
  FROM sess GROUP BY user_id, sess_id
  HAVING MAX(epoch(ts)) - MIN(epoch(ts)) > 0
) t""", "dur_secs", [0.5, 0.95], alpha=0.01)

# Weekly cohort retention: identical Monday-based week bucketing.
ORACLES["cohort_retention"] = """
WITH wkly AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
), first AS (
  SELECT user_id, MIN(wk) AS cohort_wk FROM wkly GROUP BY user_id
)
SELECT strftime(cohort_wk, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', cohort_wk, wk) / 7 AS INTEGER) AS week_offset,
       COUNT(*) AS n_users
FROM wkly JOIN first USING (user_id)
GROUP BY 1, 2
ORDER BY cohort_week, week_offset
"""

# Stateful streaming: the final per-key state equals the batch sketch
# (order-invariant bucket counting), so the twin pivots the grouped
# quantile SQL.
ORACLES["streaming_stateful_quantiles"] = f"""
WITH qe AS ({duckdb_quantile_sql("events", "value", [0.5, 0.95],
                                 alpha=0.01, group_cols=("event_type",))})
SELECT event_type,
       CAST(MIN(n) AS BIGINT) AS n,
       MIN(CASE WHEN q = 0.5 THEN estimate END) AS p5,
       MIN(CASE WHEN q = 0.95 THEN estimate END) AS p95
FROM qe GROUP BY event_type ORDER BY event_type
"""

# BPE step: identical weighted char-pair counting over distinct words.
ORACLES["bpe_top_pairs"] = """
WITH words AS (
  SELECT w, COUNT(*) AS wc
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE length(w) >= 2 GROUP BY w
), pairs AS (
  SELECT wc, substr(w, i, 2) AS pair
  FROM (SELECT w, wc, unnest(range(1, length(w))) AS i FROM words)
)
SELECT pair, CAST(SUM(wc) AS BIGINT) AS pair_count
FROM pairs GROUP BY pair
ORDER BY pair_count DESC, pair
LIMIT 20
"""

def duckdb_bpe_sql(k: int, mode: str = "merges") -> str:
    """Unrolled-iteration twin of `operators.bpe.bpe_train_merges` /
    `bpe_encode`: one (pair-count, argmax, replace) CTE trio per merge
    round over the same padded double-space symbol encoding — plain
    literal `replace` scans left-to-right non-overlapping in both
    engines, so every round's vocabulary state is string-identical.
    mode='merges' emits the merge table; mode='encode' joins the final
    word→symbols mapping back onto the posexploded corpus and emits the
    per-doc (n_words, n_sym, positional md5) fingerprint; mode='tokenize'
    additionally ranks the symbol inventory into token ids (frequency
    DESC, symbol ASC — `bpe_symbol_ids`) and emits each doc's
    (n_tok, Σ position·token_id) array fingerprint."""
    parts = ["""
WITH syms0 AS (
  SELECT w, COUNT(*)::BIGINT AS wc,
         ' ' || array_to_string(
                  list_transform(range(1, length(w) + 1), i -> w[i]),
                  '  ') || ' ' AS s
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE length(w) >= 1 GROUP BY w
)"""]
    for i in range(1, k + 1):
        p = i - 1
        parts.append(f""",
pc{i} AS (
  SELECT l, r, SUM(wc) AS c FROM (
    SELECT wc, unnest(arr[1:len(arr)-1]) AS l, unnest(arr[2:len(arr)]) AS r
    FROM (SELECT wc, string_split(trim(s), '  ') AS arr FROM syms{p})
  ) GROUP BY l, r
),
b{i} AS (SELECT l, r, c FROM pc{i} ORDER BY c DESC, l, r LIMIT 1),
syms{i} AS (
  -- LEFT JOIN ON TRUE (b{i} has <= 1 row): when merges exhaust before
  -- round {i}, the vocabulary passes through unchanged instead of being
  -- annihilated by a cross join against an empty argmax
  SELECT w, wc,
         CASE WHEN b.l IS NULL THEN s
              ELSE replace(s, ' ' || b.l || '  ' || b.r || ' ',
                              ' ' || b.l || b.r || ' ') END AS s
  FROM syms{p} LEFT JOIN b{i} b ON TRUE)""")
    if mode == "pack":
        # end-to-end composition twin: the encode-mode mapping gives each
        # doc's BPE symbol count, then the pack_sequences recursive-CTE
        # fold replays next-fit packing per source stream at cap 512
        parts.append(f""",
mapping AS (
  SELECT w, len(string_split(trim(s), '  '))::BIGINT AS ns FROM syms{k}
),
docn AS (
  SELECT doc.doc_id, doc.source, COALESCE(SUM(m.ns), 0)::BIGINT AS w,
         ROW_NUMBER() OVER (PARTITION BY doc.source
                            ORDER BY doc.doc_id) AS rn
  FROM documents doc
  LEFT JOIN (SELECT doc_id, unnest(string_split(text, ' ')) AS w
             FROM documents) dw
    ON dw.doc_id = doc.doc_id AND length(dw.w) >= 1
  LEFT JOIN mapping m ON m.w = dw.w
  GROUP BY doc.doc_id, doc.source
),
walk(source, rn, doc_id, w, pack_id, fill) AS (
  SELECT source, rn, doc_id, w, 0::BIGINT, w FROM docn WHERE rn = 1
  UNION ALL
  SELECT d.source, d.rn, d.doc_id, d.w,
         CASE WHEN walk.fill > 0 AND walk.fill + d.w > 512
              THEN walk.pack_id + 1 ELSE walk.pack_id END,
         CASE WHEN walk.fill > 0 AND walk.fill + d.w > 512
              THEN d.w ELSE walk.fill + d.w END
  FROM walk JOIN docn d ON d.source = walk.source AND d.rn = walk.rn + 1
)
SELECT doc_id, source, pack_id, (fill - w) AS pack_offset
FROM walk ORDER BY doc_id""")
        return "".join(parts).replace("WITH syms0", "WITH RECURSIVE syms0", 1)
    if mode == "tokenize":
        parts.append(f""",
symc AS (
  SELECT sym, SUM(wc) AS cnt FROM (
    SELECT wc, unnest(string_split(trim(s), '  ')) AS sym FROM syms{k})
  GROUP BY sym
),
symid AS (
  SELECT sym, ROW_NUMBER() OVER (ORDER BY cnt DESC, sym ASC) - 1 AS tid
  FROM symc
),
wsyms AS (
  SELECT w, unnest(string_split(trim(s), '  ')) AS sym,
         unnest(range(1, len(string_split(trim(s), '  ')) + 1)) AS sp
  FROM syms{k}
),
docwords AS (
  SELECT doc_id, unnest(ws) AS w, unnest(range(1, len(ws) + 1)) AS pos
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
),
toks AS (
  SELECT d.doc_id,
         ROW_NUMBER() OVER (PARTITION BY d.doc_id
                            ORDER BY d.pos, ws.sp) AS gpos,
         si.tid
  FROM docwords d JOIN wsyms ws USING (w) JOIN symid si USING (sym)
  WHERE length(d.w) >= 1
),
agg AS (
  SELECT doc_id, COUNT(*) AS n_tok, SUM(gpos * tid) AS tok_sum
  FROM toks GROUP BY doc_id
)
SELECT doc.doc_id, COALESCE(a.n_tok, 0)::INT AS n_tok,
       COALESCE(a.tok_sum, 0)::BIGINT AS tok_sum
FROM documents doc LEFT JOIN agg a USING (doc_id)
ORDER BY doc_id""")
        return "".join(parts)
    if mode == "encode":
        parts.append(f""",
mapping AS (
  SELECT w, trim(s) AS sym_str,
         len(string_split(trim(s), '  '))::BIGINT AS ns
  FROM syms{k}
),
docwords AS (
  SELECT doc_id, unnest(ws) AS w, unnest(range(1, len(ws) + 1)) AS pos
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
)
SELECT d.doc_id,
       COUNT(*)::BIGINT AS n_words,
       CAST(SUM(m.ns) AS BIGINT) AS n_sym,
       md5(string_agg(m.sym_str, ' / ' ORDER BY d.pos)) AS enc_hash
FROM docwords d JOIN mapping m USING (w)
WHERE length(d.w) >= 1
GROUP BY d.doc_id ORDER BY d.doc_id""")
        return "".join(parts)
    union = "\nUNION ALL ".join(
        f"SELECT {i} AS iteration, l, r, c FROM b{i}" for i in range(1, k + 1))
    parts.append(f"""
SELECT CAST(iteration AS INT) AS iteration, l AS "left", r AS "right",
       l || r AS merged, CAST(c AS BIGINT) AS pair_count
FROM ({union})
ORDER BY iteration""")
    return "".join(parts)


ORACLES["bpe_train_merges"] = duckdb_bpe_sql(5)
# the bpe_encode gate row was merged into bpe_tokenize (round 5): the
# id-level positional pin (tok_sum) implies the symbol-level pin given
# the ranked symbol→id bijection the tokenize twin itself replays; the
# bpe_encode OPERATOR stays, pytest-covered (tests/test_pipeline.py)
ORACLES["bpe_tokenize"] = duckdb_bpe_sql(5, mode="tokenize")
ORACLES["bpe_pack"] = duckdb_bpe_sql(5, mode="pack")

# merged gate row (round 5, second rotation wave): both next-fit packing
# pipelines — whitespace words at cap 1024 and the trained-BPE encode
# chain at cap 512 — in one tagged frame; the twins compose by UNION
ORACLES["packing"] = (
    f"SELECT 'words_1024' AS src, * FROM ({ORACLES.pop('pack_sequences')}) "
    f"UNION ALL "
    f"SELECT 'bpe_512' AS src, * FROM ({ORACLES.pop('bpe_pack')}) "
    f"ORDER BY src, doc_id")

# Moment sketch deterministic state: z = ln(x + sqrt(x²+1)) (asinh in
# engine-identical libm ops), per-row (z/8)^j floor-quantized at 2^40
# then integer-summed — associative, so the harness merge tree and this
# single GROUP BY agree exactly. 2^40 = 1099511627776.
_MQ = "1099511627776"
ORACLES["moments_by_flag"] = f"""
WITH z AS (
  SELECT l_returnflag,
         ln(l_quantity + sqrt(l_quantity * l_quantity + 1)) AS z
  FROM lineitem
)
SELECT l_returnflag,
       COUNT(*)::BIGINT AS n,
       CAST(floor(MIN(z) * {_MQ} + 0.5) AS BIGINT) AS zq_min,
       CAST(floor(MAX(z) * {_MQ} + 0.5) AS BIGINT) AS zq_max,
       {", ".join(
           f"CAST(SUM(CAST(floor(power(z / 8, CAST({j} AS DOUBLE)) * {_MQ}"
           f" + 0.5) AS BIGINT)) AS BIGINT) AS s{j}" for j in range(1, 7))}
FROM z GROUP BY l_returnflag ORDER BY l_returnflag
"""

# Compaction identity proof: the twin computes the INPUT table's
# (n_rows, order-independent content hash) once and emits it under both
# phase labels — the 'after' row matching is the rewrite-preserves-
# content contract. Same 60-bit md5 hex parse, same mod-1e9+7 sum, same
# tz-free timestamp format and ×1e6 double quantization, and the same
# unambiguous `len:value`/`N` column encoding as
# operators/maintenance.py::content_checksum (`||` propagates NULL in
# DuckDB the way Spark's concat does — concat() there would skip it).
_ENC = ("coalesce(CAST(length(CAST({c} AS VARCHAR)) AS VARCHAR) || ':' || "
        "CAST({c} AS VARCHAR), 'N')")
_OPT_COLS = ["event_id", "user_id", "event_type", "props",
             "strftime(ts, '%Y-%m-%d %H:%M:%S.%f')",
             "CAST(floor(value * 1e6 + 0.5) AS BIGINT)"]
ORACLES["optimize_compact"] = f"""
WITH base AS (
  SELECT COUNT(*)::BIGINT AS n_rows,
         CAST(SUM(('0x' || substr(md5(concat_ws('|',
                {", ".join(_ENC.format(c=c) for c in _OPT_COLS)})),
                1, 15))::BIGINT
              % 1000000007) AS BIGINT) AS content_hash
  FROM events
)
SELECT 'after' AS phase, n_rows, content_hash FROM base
UNION ALL
SELECT 'before' AS phase, n_rows, content_hash FROM base
ORDER BY phase
"""

# Rolling WAU from per-day theta unions (under-k exact) == the direct
# 7-day COUNT(DISTINCT) window.
ORACLES["theta_rolling_wau"] = """
WITH days AS (
  SELECT DISTINCT date_trunc('day', ts) AS dd FROM events
)
SELECT strftime(ds.dd, '%Y-%m-%d') AS window_start,
       COUNT(DISTINCT e.user_id) AS wau
FROM days ds
JOIN events e ON date_trunc('day', e.ts) >= ds.dd
             AND date_trunc('day', e.ts) < ds.dd + INTERVAL 7 DAY
GROUP BY ds.dd
ORDER BY window_start
"""


# ---------------------------------------------- AMS F2 / join-size twin
# sketches/ams.py counter j = 64*lane + bit: sign = bit b of
# splitmix64(key, seed*1000003 + lane). The twin replays the full
# splitmix64 chain per (key, lane) in HUGEINT-mod-2^64 SQL (the same
# chain split_assign uses), extracts all 64 sign bits via a divisor
# table, and reproduces every counter exactly; the estimates replay the
# median-of-means arithmetic (SUM::DOUBLE / k then MEDIAN — the same
# round-once-then-divide AmsSketch._median_of_means performs).

def _ams_joinsize_sql(r: int = 256, groups: int = 8, seed: int = 7) -> str:
    phi = 0x9E3779B97F4A7C15
    mask = (1 << 64) - 1
    lanes = ", ".join(
        f"({lane}, {((seed * 1000003 + lane) * phi + phi) & mask}::HUGEINT)"
        for lane in range(r // 64))
    bits = ", ".join(f"({b}, {1 << b}::HUGEINT)" for b in range(64))
    k = r // groups

    def chain(key_tbl: str, out: str) -> str:
        # ((key % 2^64) + 2^64 + addc) % 2^64: DuckDB's % keeps the
        # dividend's sign, so a negative key must be wrapped into
        # [0, 2^64) first to match numpy's uint64 cast — without this,
        # 61/256 counters diverge for key = -2^63 (review-verified)
        return f"""
{out}0 AS (SELECT key, cnt, l,
                  (key::HUGEINT % 18446744073709551616::HUGEINT
                   + 18446744073709551616::HUGEINT + addc)
                  % 18446744073709551616::HUGEINT AS z
           FROM {key_tbl} CROSS JOIN lanes),
{out}1 AS (SELECT key, cnt, l, {_mulc_u64("xor(z, z // 1073741824::HUGEINT)", 0xBF58476D1CE4E5B9)} AS z FROM {out}0),
{out}2 AS (SELECT key, cnt, l, {_mulc_u64("xor(z, z // 134217728::HUGEINT)", 0x94D049BB133111EB)} AS z FROM {out}1),
{out}h AS (SELECT key, cnt, l, xor(z, z // 2147483648::HUGEINT) AS h FROM {out}2),
{out} AS (SELECT l * 64 + b AS j,
                 SUM(cnt * (2 * ((h // dv) % 2::HUGEINT) - 1))::BIGINT AS z
          FROM {out}h CROSS JOIN bits GROUP BY 1)"""

    return f"""
WITH lanes(l, addc) AS (VALUES {lanes}),
bits(b, dv) AS (VALUES {bits}),
ka AS (SELECT user_id AS key, COUNT(*)::BIGINT AS cnt FROM events
       WHERE user_id IS NOT NULL GROUP BY user_id),
kb AS (SELECT o_custkey AS key, COUNT(*)::BIGINT AS cnt FROM orders
       WHERE o_custkey IS NOT NULL GROUP BY o_custkey),
{chain("ka", "za")},
{chain("kb", "zb")},
grpa AS (SELECT j // {k} AS g, SUM(z::HUGEINT * z::HUGEINT)::DOUBLE / {k} AS m
         FROM za GROUP BY 1),
grpj AS (SELECT za.j // {k} AS g, SUM(za.z::HUGEINT * zb.z::HUGEINT)::DOUBLE / {k} AS m
         FROM za JOIN zb USING (j) GROUP BY 1)
SELECT 'za_' || lpad(j::VARCHAR, 3, '0') AS metric, z::DOUBLE AS value FROM za
UNION ALL
SELECT 'zb_' || lpad(j::VARCHAR, 3, '0'), z::DOUBLE FROM zb
UNION ALL SELECT 'est_f2_events_users', (SELECT MEDIAN(m) FROM grpa)
UNION ALL SELECT 'est_join_size', (SELECT MEDIAN(m) FROM grpj)
UNION ALL SELECT 'exact_f2_events_users', (SELECT SUM(cnt * cnt) FROM ka)::DOUBLE
UNION ALL SELECT 'exact_join_size',
  COALESCE((SELECT SUM(a.cnt * b.cnt) FROM ka a JOIN kb b USING (key)), 0)::DOUBLE
UNION ALL SELECT 'n_events', (SELECT SUM(cnt) FROM ka)::DOUBLE
UNION ALL SELECT 'n_orders', (SELECT SUM(cnt) FROM kb)::DOUBLE
ORDER BY metric
"""


ORACLES["ams_joinsize"] = _ams_joinsize_sql()


# -------------------------------------- token-array MinHash dedup twin
# dedup.minhash_lsh_pairs_tokens over tokenize(documents, vocab 512):
# the twin replays tokenization (same (count DESC, term ASC) total
# order as the tokenize_vocab twin — no OOV at fixture vocab 31 << 512),
# builds the identical '_'-joined token-id 3-gram shingle strings, and
# re-runs the XXH64 → Mersenne-61 permutation → banding → exact-Jaccard
# chain of the minhash_lsh_pairs_prod twin on those strings.

def _minhash_tokens_sql(threshold: float = 0.5, num_perm: int = 128,
                        bands: int = 32, seed: int = 7,
                        vocab_size: int = 512) -> str:
    return _minhash_chain_sql(f"""counts AS (
  SELECT term, COUNT(*) AS cnt
  FROM (SELECT unnest({_WORDS}) AS term FROM documents) GROUP BY term
), vocab AS (
  SELECT term, ROW_NUMBER() OVER (ORDER BY cnt DESC, term ASC) - 1 AS token_id
  FROM counts QUALIFY token_id < {vocab_size}
), w AS (
  SELECT doc_id, unnest(ws) AS term, unnest(range(1, len(ws) + 1)) AS pos
  FROM (SELECT doc_id, {_WORDS} AS ws FROM documents)
), tl AS (
  SELECT w.doc_id, list(COALESCE(v.token_id, -1)::BIGINT ORDER BY w.pos) AS t
  FROM w LEFT JOIN vocab v USING (term) GROUP BY w.doc_id
), shl AS (
  SELECT doc_id AS id,
         CASE WHEN len(t) >= 3 THEN list_distinct(list_transform(
                range(1, len(t) - 1),
                i -> t[i]::VARCHAR || '_' || t[i+1]::VARCHAR || '_' || t[i+2]::VARCHAR))
              ELSE [] END AS s
  FROM tl)""", threshold, num_perm, bands, seed)


ORACLES["minhash_tokens_pairs"] = _minhash_tokens_sql()

# Exact substring dedup (strip_duplicate_spans, min_len=8): semantic
# replay — duplicated windows by STRING equality (Spark: xxhash64 of the
# token slice; identical absent a 64-bit collision on the deterministic
# fixture), canonical = lexicographically-first (doc_id, pos) via the
# two-step (min doc_id, then min pos at that doc) window pair, deletion
# islands merged with the pos - row_number() trick, and the surviving
# corpus fingerprinted with md5 over the kept word sequence.
ORACLES["strip_spans"] = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
toks AS (
  SELECT doc_id, generate_subscripts(w, 1) - 1 AS pos, unnest(w) AS word
  FROM d
),
wins AS (
  SELECT doc_id, i AS pos, array_to_string(w[i + 1 : i + 8], ' ') AS win
  FROM d, UNNEST(range(0, greatest(len(w) - 7, 0))) AS t(i)
),
m1 AS (
  SELECT doc_id, pos, win,
         count(*) OVER (PARTITION BY win) AS n_occ,
         min(doc_id) OVER (PARTITION BY win) AS d0
  FROM wins
),
m2 AS (
  SELECT doc_id, pos, n_occ, d0,
         min(CASE WHEN doc_id = d0 THEN pos END)
             OVER (PARTITION BY win) AS p0
  FROM m1
),
dels AS (
  SELECT doc_id, pos FROM m2
  WHERE n_occ >= 2 AND NOT (doc_id = d0 AND pos = p0)
),
prots AS (  -- canonical duplicated window starts: their coverage is
            -- protected, so one intact copy of every duplicated
            -- substring survives even under self-overlapping repeats
  SELECT doc_id, pos FROM m2
  WHERE n_occ >= 2 AND doc_id = d0 AND pos = p0
),
ranges AS (
  SELECT doc_id, min(pos) AS s, max(pos) + 8 AS e
  FROM (SELECT doc_id, pos,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                   AS grp
        FROM dels)
  GROUP BY doc_id, grp
),
pranges AS (
  SELECT doc_id, min(pos) AS s, max(pos) + 8 AS e
  FROM (SELECT doc_id, pos,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                   AS grp
        FROM prots)
  GROUP BY doc_id, grp
),
delpos AS (  -- expanded deletion positions minus protected coverage:
             -- keeps `kept` a plain ANTI JOIN (an OR EXISTS disjunct
             -- there would force per-token correlated evaluation)
  SELECT DISTINCT doc_id, p
  FROM (SELECT doc_id, unnest(range(s, e)) AS p FROM ranges) dp
  WHERE NOT EXISTS (SELECT 1 FROM pranges pr
                    WHERE pr.doc_id = dp.doc_id
                      AND dp.p >= pr.s AND dp.p < pr.e)
),
kept AS (
  SELECT t.doc_id, t.pos, t.word
  FROM toks t
  ANTI JOIN delpos d ON t.doc_id = d.doc_id AND t.pos = d.p
),
agg AS (
  SELECT doc_id, count(*) AS n_tok,
         md5(string_agg(word, ' ' ORDER BY pos)) AS kept_md5
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(agg.n_tok, 0) AS BIGINT) AS n_tok,
       CAST(len(d.w) - COALESCE(agg.n_tok, 0) AS BIGINT) AS n_deleted,
       COALESCE(agg.kept_md5, md5('')) AS kept_md5
FROM d LEFT JOIN agg USING (doc_id)
ORDER BY doc_id
"""


# ------------------------------------------------- round-5 gate merges

# text_profile = doc_stats ⋈ quality_score ⋈ language_id ⋈
# repetition_stats (one per-doc profile row; the four SQL twins compose
# by join, so nothing is re-derived)
_STATS_SQL = ORACLES.pop("doc_stats")
_QUAL_SQL = ORACLES.pop("quality_score")
_LANG_SQL = ORACLES.pop("language_id")
_REP_SQL = ORACLES.pop("repetition_stats")
ORACLES["text_profile"] = f"""
SELECT s.*, q.quality, l.lang_pred, r.n_grams, r.max_gram_count,
       r.rep_score
FROM ({_STATS_SQL}) s
JOIN (SELECT doc_id, quality FROM ({_QUAL_SQL})) q USING (doc_id)
JOIN ({_LANG_SQL}) l USING (doc_id)
JOIN ({_REP_SQL}) r USING (doc_id)
ORDER BY doc_id
"""

# Sliding-HLL window registers (p=14, seed=0): splitmix64 per distinct
# in-window user in HUGEINT-mod-2^64 SQL (same chain as the
# stratified_sample twin), register = z >> 50, rho = 50 - hb(z mod 2^50)
# with hb computed EXACTLY via length(bin(r)) (float log2 of 2^50-1
# rounds up at 1 ulp); window = ts >= tmax - days (the to_hll cutoff
# convention). Checksum Σ (idx+1)·max_rho pins every register byte.
_SHLL_P2 = 1 << 50          # 2^(64 - p)
ORACLES["shll_window_users"] = f"""
WITH mx AS (SELECT max(epoch_us(ts)) AS tmax FROM events),
win AS (SELECT 7 AS wd UNION ALL SELECT 30 AS wd),
f AS (
  SELECT DISTINCT e.event_type, w.wd, e.user_id
  FROM events e, win w, mx
  WHERE epoch_us(e.ts) >= mx.tmax - w.wd * 86400000000::HUGEINT
),
s0 AS (SELECT event_type, wd,
              (user_id::HUGEINT + 11400714819323198485::HUGEINT)
                % 18446744073709551616::HUGEINT AS z
       FROM f),
s1 AS (SELECT event_type, wd,
              {_mulc_u64("xor(z, z // 1073741824::HUGEINT)", 0xBF58476D1CE4E5B9)} AS z
       FROM s0),
s2 AS (SELECT event_type, wd,
              {_mulc_u64("xor(z, z // 134217728::HUGEINT)", 0x94D049BB133111EB)} AS z
       FROM s1),
h AS (SELECT event_type, wd, xor(z, z // 2147483648::HUGEINT) AS z FROM s2),
reg AS (
  SELECT event_type, wd, z // {_SHLL_P2}::HUGEINT AS idx,
         max(CASE WHEN z % {_SHLL_P2}::HUGEINT = 0 THEN 51
                  ELSE 50 - (length(bin(z % {_SHLL_P2}::HUGEINT)) - 1)
             END) AS rho
  FROM h GROUP BY event_type, wd, idx
),
agg AS (
  SELECT event_type, wd, count(*) AS n_nonzero,
         sum((idx + 1) * rho) AS reg_checksum
  FROM reg GROUP BY event_type, wd
)
SELECT e.event_type, CAST(w.wd AS INT) AS window_days,
       CAST(COALESCE(a.n_nonzero, 0) AS BIGINT) AS n_nonzero,
       CAST(COALESCE(a.reg_checksum, 0) AS BIGINT) AS reg_checksum
FROM (SELECT DISTINCT event_type FROM events) e
CROSS JOIN win w
LEFT JOIN agg a ON a.event_type = e.event_type AND a.wd = w.wd
ORDER BY e.event_type, window_days
"""

# Windowed DDSketch (wdds) gate row: with hour buckets, `now` at the end
# of the newest global hour, and bucket-aligned windows, window_sketch
# merges exactly the hour buckets in [maxb − wh + 1, maxb] and (below
# bin_limit) its bins equal the plain DDSketch bins over those rows — so
# the twin is the standard quantile SQL over the hour-filtered subquery.
ORACLES["wdds_window_quantiles"] = duckdb_quantile_sql(
    "(WITH mxb AS (SELECT MAX(epoch_us(ts) // 3600000000) AS maxb "
    "              FROM events) "
    " SELECT event_type, CAST(w.wh AS INT) AS window_hours, value "
    " FROM events, (SELECT 168 AS wh UNION ALL SELECT 360) w, mxb "
    " WHERE epoch_us(ts) // 3600000000 >= mxb.maxb - w.wh + 1) t",
    "value", [0.5, 0.95, 0.99], alpha=0.01,
    group_cols=("event_type", "window_hours"))


# Exponential-histogram trailing-window counts, exact regime: the Spark
# side pre-aggregates to per-(event_type, hour) counts before the
# harness, so each (group, hour) occurs exactly once and the bucket
# table is the binary decomposition of the hourly counts (k=4096 >> 720
# hour-buckets per size class — compaction never fires). est = exact
# windowed count (no straddlers: every bucket has t_old == t_new), err
# is literally 0, n_buckets = Σ bit_count(hourly count), total = rows.
ORACLES["eh_window_counts"] = """
WITH h AS (
  SELECT event_type, epoch_us(date_trunc('hour', ts)) AS th, count(*) AS c
  FROM events GROUP BY event_type, th
),
mx AS (SELECT max(th) AS tmax FROM h),
win AS (SELECT 7 AS wd UNION ALL SELECT 30 AS wd)
SELECT h.event_type, CAST(w.wd AS INT) AS window_days,
       CAST(sum(CASE WHEN h.th > mx.tmax - w.wd * 86400000000
                THEN h.c ELSE 0 END) AS BIGINT) AS est,
       CAST(0 AS BIGINT) AS err,
       CAST(sum(bit_count(h.c)) AS BIGINT) AS n_buckets,
       CAST(sum(h.c) AS BIGINT) AS total
FROM h, win w, mx
GROUP BY h.event_type, w.wd
ORDER BY h.event_type, window_days
"""

# ECM-sketch trailing-window per-user frequencies, exact-EH regime
# (depth=4, width=2048, seed=0): splitmix64(user, seed=r+1) per row r in
# HUGEINT-mod-2^64 SQL (seed chain: z0 = x + GOLDEN·(seed+1), so row r
# adds GOLDEN·(r+2) mod 2^64), cell = z % width; per-(row, cell)
# windowed mass INCLUDES hash collisions, estimate = min over the 4
# rows — identical arithmetic to EcmSketch._cells/estimate. err is
# literally 0 (no bucket ever straddles: distinct timestamps keep
# every size class below k=4096, so t_old == t_new throughout).
_ECM_G = 0x9E3779B97F4A7C15
_ECM_ROWS = ", ".join(
    f"({r}, {(_ECM_G * (r + 2)) & 0xFFFFFFFFFFFFFFFF}::HUGEINT)"
    for r in range(4))
ORACLES["ecm_window_freq"] = f"""
WITH rws AS (SELECT * FROM (VALUES {_ECM_ROWS}) t(r, addc)),
mx AS (SELECT max(epoch_us(ts)) AS tmax FROM events),
win AS (SELECT 7 AS wd UNION ALL SELECT 30 AS wd),
ks AS (SELECT DISTINCT user_id FROM events),
s0 AS (SELECT k.user_id, r.r,
              (k.user_id::HUGEINT + r.addc)
                % 18446744073709551616::HUGEINT AS z
       FROM ks k CROSS JOIN rws r),
s1 AS (SELECT user_id, r,
              {_mulc_u64("xor(z, z // 1073741824::HUGEINT)", 0xBF58476D1CE4E5B9)} AS z
       FROM s0),
s2 AS (SELECT user_id, r,
              {_mulc_u64("xor(z, z // 134217728::HUGEINT)", 0x94D049BB133111EB)} AS z
       FROM s1),
cells AS (SELECT user_id, r,
                 xor(z, z // 2147483648::HUGEINT) % 2048::HUGEINT AS cell
          FROM s2),
mass AS (
  SELECT c.r, c.cell, w.wd, count(*) AS m
  FROM events e
  JOIN cells c ON c.user_id = e.user_id
  CROSS JOIN win w
  CROSS JOIN mx
  WHERE epoch_us(e.ts) > mx.tmax - w.wd * 86400000000::HUGEINT
  GROUP BY c.r, c.cell, w.wd
)
SELECT c.user_id, CAST(w.wd AS INT) AS window_days,
       CAST(min(COALESCE(m.m, 0)) AS BIGINT) AS est,
       CAST(0 AS BIGINT) AS err
FROM cells c
CROSS JOIN win w
LEFT JOIN mass m ON m.r = c.r AND m.cell = c.cell AND m.wd = w.wd
GROUP BY c.user_id, w.wd
ORDER BY c.user_id, window_days
"""

# merged gate row (round 5, final sitting): both trailing-window
# counting families — DGIM exponential histogram and ECM windowed
# count-min — in one tagged frame; the EH-only (n_buckets, total)
# columns carry the −1 sentinel on ECM rows
ORACLES["count_windows"] = (
    f"SELECT 'eh' AS form, event_type AS key, window_days, est, err, "
    f"n_buckets, total FROM ({ORACLES.pop('eh_window_counts')}) "
    f"UNION ALL "
    f"SELECT 'ecm' AS form, CAST(user_id AS VARCHAR) AS key, window_days, "
    f"est, err, CAST(-1 AS BIGINT) AS n_buckets, CAST(-1 AS BIGINT) AS total "
    f"FROM ({ORACLES.pop('ecm_window_freq')}) "
    f"ORDER BY form, key, window_days")

# Per-source token-distribution KL divergence from the corpus blend —
# the identical libm expression to text.source_kl_divergence: each term
# rounded to 6 decimals and summed as DECIMAL(20,6) (exact,
# shuffle-order-free), final value cast to DOUBLE and rounded.
ORACLES["source_kl"] = f"""
WITH w AS (SELECT source, unnest({_WORDS}) AS t FROM documents),
per AS (SELECT source, t, count(*) AS c_s FROM w GROUP BY source, t),
ns AS (SELECT source, sum(c_s) AS n_s, count(*) AS n_types
       FROM per GROUP BY source),
corpus AS (SELECT t, sum(c_s) AS c FROM per GROUP BY t),
tot AS (SELECT sum(c) AS n FROM corpus),
terms AS (
  SELECT p.source,
         CAST(ROUND((CAST(p.c_s AS DOUBLE) / CAST(s.n_s AS DOUBLE))
              * ln((CAST(p.c_s AS DOUBLE) * CAST(tot.n AS DOUBLE))
                   / (CAST(s.n_s AS DOUBLE) * CAST(c0.c AS DOUBLE)))
              / ln(CAST(2.0 AS DOUBLE)), 6) AS DECIMAL(20,6)) AS term
  FROM per p JOIN corpus c0 USING (t) JOIN ns s USING (source)
  CROSS JOIN tot),
kl AS (SELECT source, sum(term) AS klsum FROM terms GROUP BY source)
SELECT s.source, CAST(s.n_s AS BIGINT) AS n_tok,
       CAST(s.n_types AS BIGINT) AS n_types,
       ROUND(CAST(k.klsum AS DOUBLE), 6) AS kl_bits
FROM ns s JOIN kl k USING (source)
ORDER BY s.source
"""


# Windowed-SpaceSaving heavy hitters, exact regime (k=4096 >> user
# universe): counts exact, err literally 0, rank = (count DESC, user
# ASC). Coverage re-derived independently: whole days [bid_min,
# bid_max] from the global max ts with wss.window_sketch's straddle
# rule (bid_min advances one day only when the window edge is the last
# microsecond of its day).
_W_DAY = 86_400_000_000
ORACLES["wss_window_top_users"] = f"""
WITH mx AS (SELECT max(epoch_us(ts)) AS tmax FROM events),
win AS (SELECT 7 AS wd UNION ALL SELECT 30 AS wd),
bounds AS (
  SELECT w.wd,
         mx.tmax // {_W_DAY} AS bid_max,
         CASE WHEN ((mx.tmax - w.wd * {_W_DAY}) // {_W_DAY}) * {_W_DAY}
                   + {_W_DAY} - 1 <= mx.tmax - w.wd * {_W_DAY}
              THEN (mx.tmax - w.wd * {_W_DAY}) // {_W_DAY} + 1
              ELSE (mx.tmax - w.wd * {_W_DAY}) // {_W_DAY} END AS bid_min
  FROM win w, mx
),
f AS (
  SELECT b.wd, e.event_type, e.user_id
  FROM events e, bounds b
  WHERE epoch_us(e.ts) // {_W_DAY} BETWEEN b.bid_min AND b.bid_max
),
cnt AS (SELECT wd, event_type, user_id, count(*) AS cnt
        FROM f GROUP BY wd, event_type, user_id),
tot AS (SELECT wd, event_type, sum(cnt) AS n_covered
        FROM cnt GROUP BY wd, event_type),
rk AS (SELECT wd, event_type, user_id, cnt,
              ROW_NUMBER() OVER (PARTITION BY wd, event_type
                                 ORDER BY cnt DESC, user_id ASC) AS rnk
       FROM cnt)
SELECT r.event_type, CAST(r.wd AS INT) AS window_days,
       CAST(r.rnk AS INT) AS rank, CAST(r.user_id AS BIGINT) AS user_id,
       CAST(r.cnt AS BIGINT) AS cnt, CAST(0 AS BIGINT) AS err,
       CAST(t.n_covered AS BIGINT) AS n_covered
FROM rk r JOIN tot t ON r.wd = t.wd AND r.event_type = t.event_type
WHERE r.rnk <= 10
ORDER BY r.event_type, window_days, rank
"""
