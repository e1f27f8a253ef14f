"""Oracle-parity tests for the query surface: run a representative set of
`__spark_entry__.queries()` at sf0.001 and compare exactly against their
DuckDB `oracle_sql()` twins — the driver's correctness gate, inside
pytest (SURVEY.md §5.2 item 5)."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

# fast representative subset (full set runs in tools/check_correctness.py)
SUBSET = [
    "dds_quantiles_lineitem",   # harness pipeline path
    "dds_catalyst",             # both pure-Catalyst forms (r5 merge)
    "dds_events_hourly",        # windowed
    "tpch_q1",                  # relational
    "token_stats",              # exact token heavy hitters + per-source distincts (r5 merge)
    "text_profile",            # quality + language merged profile (r5)
    "shll_window_users",       # sliding-HLL window registers, hard twin
    "exact_dedup_stats",        # dedup
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",        # LSH == exact pair set at this banding
    "ann_cosine_topk",          # similarity
    "ann_topk_lsh",             # full-probe LSH == brute force
    "ann_topk_ivf",             # full-probe IVF == brute force
    "rolling_fingerprint",      # HUGEINT Horner twin
    "stratified_sample",        # splitmix64-in-SQL bottom-k twin
    "dds_turnstile_lineitem",   # turnstile insert+delete pipeline
    "neardup_clusters",         # connected components vs recursive CTE
    "bm25_topk",                # BM25 ranked retrieval
    "dds_rank",                 # global + cohort percentile ranks (r5 merge)
    "count_windows",            # DGIM EH + ECM windowed count-min (r5 merge)
    "source_kl",                # per-source KL divergence, decimal log sums
    "fd_gram_exact",            # Frequent Directions lossless gram
    "heavy_users_spacesaving",  # SpaceSaving exact-k == GROUP BY count
    "theta_token_overlap",      # theta under-k == exact set ops
    "dds_decayed_quantiles",    # exponentially time-decayed quantiles
    "event_joins",              # as-of + interval joins in one row (r5 merge)
    "importance_select",        # DSIR scores, raw + hashed feature spaces
    "dds_windows",              # 6h-sliding + daily hourly-state rollup (r5 merge)
    "weighted_sample",          # A-ES weighted reservoir vs SQL tags
    "sketch_counts_events",     # deterministic counters of the multi-sketch build
    "streaming_dds_hourly",     # foreachBatch streaming == batch quantile SQL
    "tokenize_vocab",           # vocab build + tokenization vs positional checksum
    "packing",                  # both next-fit packing pipelines, words + BPE (r5 merge)
    "decontaminate_8gram",      # train/eval n-gram overlap
    "split_assign",             # deterministic 90/5/5 split vs HUGEINT splitmix
    "vocab_coverage",           # coverage curve vs windowed cumsum
    "dds_udaf_by_flag",         # GROUPED_AGG binary UDAF vs quantile SQL
    "revenue_cube",             # grouping sets vs GROUP BY CUBE
    "value_pivot",              # explicit-list pivot vs conditional agg
    "wss_window_top_users",     # windowed SpaceSaving exact-regime top-k
    "chunk_text",               # overlapping chunks vs closed-form re-slice
    "image_decode_features",    # distributed PPM decode vs splitmix pixel twin
    "theta_daily_retention",    # DAU retention from per-day theta state
    "bloom_filtered_join",      # Bloom runtime filter == plain join
    "winsorized_stats",         # DDSketch p01/p99 trim bounds
    "pagerank_topk",            # 3-round PageRank vs unrolled CTE twin
    "bigram_surprisal",         # corpus bigram-LM scores, decimal log sums
    "zorder_index",             # Morton interleave vs identical SQL bit expr
    "redact_pii",               # regex scrub, RE2/Java-compatible patterns
    "json_props_stats",         # JSON path extraction + aggregation
    "salted_join_revenue",      # skew-salted join == plain join
    "scd2_user_value",          # SCD-2 merge vs LEAD replay
    "triangle_counts",          # wedge-close triangle join algebra
    "udtf_ngram_stats",         # Python UDTF in LATERAL vs unnest twin
    "minhash_lsh_pairs_prod",   # FULL prod pipeline via XXH64-in-SQL
    "simhash_neardup_pairs",    # 128-bit SimHash via XXH64-in-SQL
    "tpch_q12",                 # conditional agg over a filtered join
    "tpch_q14",                 # promo share, decimal num/denom
    "table_stats",              # ANALYZE-style one-pass column profile
    "theta_distinct_by_type",   # theta UDAF under-k exact + merge parity
    "jpeg_decode_features",     # quality-100 exact JPEG round-trip gate
    "audio_decode_features",    # lossless PCM decode, bit-exact features
    "png_decode_features",      # zlib-PNG decode == lossless PPM oracle
    "video_sample_features",    # P2PV cadence sampling, exact frame means
    "streaming_interval_join",  # stream-stream join drained == batch join
    "dq_report",                # one-pass multi-rule data-quality report
    "zipf_slope",               # rank-frequency least squares, decimal sums
    "embedding_quantize",       # int8 quantizer, positional code checksum
    "ann_topk_int8",            # quantized ANN, exact integer dot ranking
    "funnel_conversion",        # ordered-funnel chained earliest-after
    "session_duration_p95",     # sessionization composed with DDSketch
    "cohort_retention",         # weekly cohort matrix, ISO week parity
    "streaming_stateful_quantiles",  # applyInPandasWithState == batch SQL
    "bpe_top_pairs",            # weighted char-pair BPE step over vocab
    "theta_rolling_wau",        # 7-day WAU from per-day theta unions
    "moments_by_flag",          # moment-sketch integer state, hard oracle
    "bpe_tokenize",             # trained-BPE token-id arrays, Σ pos·id twin
    "dds_signed",               # both signed-codec forms in one row (r5 merge)
    "strip_spans",              # exact substring dedup, kept-corpus md5 pin
    "wdds_window_quantiles",    # windowed DDSketch, bucket-aligned hard twin
    "semdedup_pairs",           # SemDeDup k=1 exactness regime == all-pairs filter
    "kmeans_centroid",          # distributed k-means k=1 == normalized mean
    "mix_sources",              # token-budget mixture, HUGEINT splitmix twin
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    sdf = canon(E.queries()[name](spark, SF_DIR).toPandas())
    odf = canon(duck.sql(E.oracle_sql()[name]).df())
    assert list(sdf.columns) == list(odf.columns)
    assert len(sdf) == len(odf)
    pd.testing.assert_frame_equal(sdf, odf)


def test_all_queries_have_stable_schema(spark):
    """Every queries() entry at least plans and returns named columns."""
    for name, fn in E.queries().items():
        df = fn(spark, SF_DIR)
        assert df.columns, name


def test_entry_smoke(spark):
    df = __import__("__spark_entry__").entry(spark)
    rows = df.collect()
    assert len(rows) > 0


@pytest.mark.parametrize("name", [
    "minhash_lsh_pairs_prod",     # production LSH banding
    "simhash_neardup_pairs",      # simhash fingerprint codes
])
def test_hash_dependent_queries_are_deterministic(spark, name):
    """The hash-dependent pipelines (now ALSO hard-oracled via
    XXH64-in-SQL) must stay run-to-run identical — the determinism
    contract that makes near-dup results debuggable at scale."""
    fn = E.queries()[name]
    a = canon(fn(spark, SF_DIR).toPandas())
    b = canon(fn(spark, SF_DIR).toPandas())
    pd.testing.assert_frame_equal(a, b)


def test_sketch_estimates_deterministic(spark):
    """The 8-sketch estimates build (deregistered from the driver gate in
    round 3 — deterministic counters moved to the hard-oracled
    `sketch_counts_events`) still runs as `entry()` and must stay
    run-to-run identical; value bounds live in
    tests/test_estimates_bounds.py."""
    from p2pddsketch_spark.plans import queries as Q
    a = canon(Q.q_sketch_estimates_events(spark, SF_DIR).toPandas())
    b = canon(Q.q_sketch_estimates_events(spark, SF_DIR).toPandas())
    pd.testing.assert_frame_equal(a, b)


def test_theta_token_overlap_vs_exact(spark, duck):
    """Theta set-op estimates within bound of exact per-pair overlaps."""
    got = E.queries()["theta_token_overlap"](spark, SF_DIR).toPandas()
    exact = duck.sql("""
        WITH toks AS (SELECT DISTINCT source, unnest(string_split(text,' ')) tok
                      FROM documents)
        SELECT a.source sa, b.source sb,
               count(*) FILTER (WHERE a.tok = b.tok) inter
        FROM toks a JOIN toks b ON a.tok = b.tok AND a.source < b.source
        GROUP BY 1, 2""").df()
    ex = {(r["sa"], r["sb"]): r["inter"] for _, r in exact.iterrows()}
    assert len(got) > 0
    for _, r in got.iterrows():
        e = ex.get((r["source_a"], r["source_b"]), 0)
        if e > 100:
            assert abs(r["inter_est"] - e) / e < 0.15, (r["source_a"], r["source_b"])


def test_stratified_sample_exact_and_partition_invariant(spark):
    """The stratified sample equals the exact per-source bottom-k by tag
    and is identical across partition layouts."""
    import numpy as np
    from p2pddsketch_spark.functions.hashing import splitmix64
    got = E.queries()["stratified_sample"](spark, SF_DIR).toPandas()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("source", "doc_id").toPandas()
    for source, grp in docs.groupby("source"):
        ids = grp["doc_id"].to_numpy(dtype=np.int64)
        tags = splitmix64(ids, seed=33)
        expect = set(ids[np.argsort(tags)[:20]].tolist())
        have = set(got[got["source"] == source]["doc_id"].tolist())
        assert have == expect, source
    # layout invariance
    again = E.queries()["stratified_sample"](spark, SF_DIR).toPandas()
    pd.testing.assert_frame_equal(canon(got), canon(again))


def test_source_kl_semantics(spark):
    """Information-theory pins for `source_kl_divergence` beyond the SQL
    twin: KL(P_source ‖ P_corpus) is non-negative up to the per-term
    6-decimal rounding (≥ −n_types·5e-7), a single-source corpus has
    KL exactly 0 (P_source == P_corpus term-by-term: ln 1 = 0 rounds to
    +0.0), and the per-source token totals sum to the corpus total."""
    from p2pddsketch_spark.operators.text import source_kl_divergence
    got = E.queries()["source_kl"](spark, SF_DIR).toPandas()
    assert len(got) > 1
    assert (got["kl_bits"] >= -got["n_types"] * 5e-7).all()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_corpus = docs.selectExpr(
        "sum(size(split(text, ' '))) AS n").collect()[0]["n"]
    assert int(got["n_tok"].sum()) == int(n_corpus)
    one = source_kl_divergence(
        docs.withColumn("source", F.lit("only"))).toPandas()
    assert len(one) == 1 and one["kl_bits"].iloc[0] == 0.0


def test_registry_window_policy():
    """Registration-order invariants the driver gate depends on: names
    unique, every entry has an oracle, and driver-verification staleness
    is mechanically bounded at TWO rounds — every query beyond the
    first-50 gate window must have a GREEN row in the latest
    CORRECTNESS_r*.json (it was driver-verified last round and the gate
    skips it this round; anything older must be rotated back into the
    window, not stranded)."""
    import glob
    import json
    import re
    import __spark_entry__ as E
    names = list(E.queries().keys())
    oracles = E.oracle_sql()
    assert len(names) == len(set(names))
    assert [n for n in names if n not in oracles] == []
    rounds = {}
    for path in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        try:
            rounds[int(m.group(1))] = json.load(open(path))
        except Exception:
            pass
    if not rounds:
        pytest.skip("no driver CORRECTNESS files yet (round 1)")
    # the TWO most recent rounds embody the staleness bound: a slot-51+
    # query is legitimate iff the driver verified it last round (the
    # gate skips it this round) — and once THIS round's file lands
    # (covering only the in-window 50), last round's rows must still
    # count, or every correctly-rotated slot-51+ entry would flunk the
    # moment the driver writes the new file
    recent = sorted(rounds)[-2:]
    green = {n for r in recent for n, row in rounds[r].items()
             if row.get("rows_match") and row.get("schema_match")
             and row.get("hash_match")}
    stale = [n for n in names[50:] if n not in green]
    assert stale == [], (
        "queries beyond the gate window without a green row in the "
        f"latest driver round (staleness would exceed 2 rounds): {stale}")
    # the 2-round bound implies the surface cannot exceed 2 windows
    assert len(names) <= 100, (
        "registry exceeds 2x the gate window; the 2-round staleness "
        "bound is unsatisfiable — merge or retire queries")
