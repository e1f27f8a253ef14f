"""XXH64-in-SQL: the DuckDB expression chain must be bit-identical to
Spark's `xxhash64` (via the byte-exact Python reference, itself pinned
against Spark here) on every length class the algorithm branches on."""

import random
import struct

import duckdb
import pytest
from pyspark.sql import functions as F

from p2pddsketch_spark.functions.xxh_sql import (xxh64_py, xxh64_signed,
                                                 xxhash64_sql_ctes)

# every branch: empty, <4, 4..7, 8..31 (8-lane + 4-lane + bytes),
# 32 (one stripe exactly), 33..63, 64, >64, and the fixture shape
CASES = ["", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
         "abcdefghijk", "0123456789abcde", "x" * 31, "y" * 32, "z" * 33,
         "m" * 39, "n" * 40, "q" * 64, "w" * 100, "tok1 tok2",
         "the quick brown fox jumps over the lazy dog"]
random.seed(3)
CASES += ["".join(random.choice("abcdefghij ") for _ in range(random.randint(0, 90)))
          for _ in range(60)]


def test_python_reference_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s in CASES], "s string")
    rows = df.select("s", F.xxhash64("s").alias("h"),
                     F.xxhash64("s", F.lit(0x5EED)).alias("h2")).collect()
    for r in rows:
        assert r["h"] == xxh64_signed(r["s"].encode())
        # multi-column form: hashInt(0x5EED, seed = h1) — 4-byte stream
        h1 = r["h"] % (1 << 64)
        assert r["h2"] % (1 << 64) == xxh64_py(struct.pack("<i", 0x5EED),
                                               seed=h1)


def test_sql_chain_matches_reference():
    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in CASES])
    sql = ("WITH inp AS (SELECT s FROM t),"
           + xxhash64_sql_ctes("inp", "s", "hx") + " SELECT s, h FROM hx")
    for s, h in con.execute(sql).fetchall():
        assert int(h) == xxh64_py(s.encode()), s


@pytest.mark.parametrize("seed", [0, 1, 42, 24301, (1 << 63) - 1])
def test_sql_chain_other_seeds(seed):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR)")
    sub = CASES[:12]
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in sub])
    sql = ("WITH inp AS (SELECT s FROM t),"
           + xxhash64_sql_ctes("inp", "s", "hx", seed=seed)
           + " SELECT s, h FROM hx")
    for s, h in con.execute(sql).fetchall():
        assert int(h) == xxh64_py(s.encode(), seed=seed), (seed, s)
