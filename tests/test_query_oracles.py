"""Oracle-parity tests for the query surface: run a representative set of
`__spark_entry__.queries()` at sf0.001 and compare exactly against their
DuckDB `oracle_sql()` twins — the driver's correctness gate, inside
pytest (SURVEY.md §5.2 item 5)."""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

# fast representative subset (full set runs in tools/check_correctness.py)
SUBSET = [
    "dds_quantiles_lineitem",   # harness pipeline path
    "dds_events_catalyst",      # pure Catalyst path
    "dds_doclen_by_lang",       # grouped Catalyst
    "dds_events_hourly",        # windowed
    "tpch_q1",                  # relational
    "top_tokens_exact",         # text
    "doc_stats",
    "language_id",
    "exact_dedup_stats",        # dedup
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",        # LSH == exact pair set at this banding
    "ann_cosine_topk",          # similarity
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
