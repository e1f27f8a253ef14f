"""Unit tests for the round-3 operators beyond oracle parity:
Bloom runtime filter (no-false-negative + real pruning), fixed-iteration
PageRank (mass conservation, star-graph ordering, layout invariance),
and bigram surprisal on a hand-computed fixture."""

import math

import pytest
from pyspark.sql import functions as F

from p2pddsketch_spark.operators.pagerank import pagerank
from p2pddsketch_spark.operators.runtime_filter import (bloom_filter_of,
                                                        bloom_semi_filter)


def test_bloom_semi_filter_no_false_negatives_and_prunes(spark):
    fact = spark.range(0, 20000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("payload"))
    dim = spark.range(0, 20000, 100).select(F.col("id").alias("dk"))  # 200 keys
    kept = bloom_semi_filter(fact, "k", dim, "dk", m_bits=1 << 16, k=5)
    kept_keys = {r["k"] for r in kept.collect()}
    true_keys = set(range(0, 20000, 100))
    # no false negatives: every true match survives
    assert true_keys <= kept_keys
    # real pruning: the pass-through rate is far below 1 (FPP ~ small)
    assert len(kept_keys) < 20000 * 0.2
    # schema passes through unchanged
    assert kept.columns == ["k", "payload"]


def test_bloom_filter_of_matches_local_build(spark):
    import numpy as np
    from p2pddsketch_spark.sketches.bloom import BloomFilter
    vals = np.arange(0, 5000, 3, dtype=np.int64)
    dim = spark.createDataFrame([(int(v),) for v in vals], "dk long").repartition(5)
    distributed = bloom_filter_of(dim, "dk", m_bits=1 << 14, k=4)
    local = BloomFilter(m_bits=1 << 14, k=4).update_batch(vals)
    assert distributed.to_bytes() == local.to_bytes()


def test_pagerank_star_graph(spark):
    # star: every leaf points at the hub, hub points at leaf 1
    edges = [(i, 0) for i in range(1, 6)] + [(0, 1)]
    e = spark.createDataFrame(edges, "src long, dst long")
    ranks = {r["node"]: r["rank_nano"] for r in pagerank(e, iterations=10).collect()}
    assert len(ranks) == 6
    # the hub↔leaf-1 cycle holds all circulating mass (their order
    # oscillates with iteration parity); leaves 2-5 sit at the base rate
    top2 = sorted(ranks, key=ranks.get)[-2:]
    assert set(top2) == {0, 1}
    assert min(ranks[0], ranks[1]) > 4 * max(ranks[v] for v in (2, 3, 4, 5))
    # mass conservation to within quantization (6 nodes * 0.5 nano each)
    total = sum(ranks.values())
    assert abs(total - 1_000_000_000) <= 10


def test_pagerank_layout_invariance(spark):
    import random
    rng = random.Random(7)
    edges = [(rng.randrange(50), rng.randrange(50)) for _ in range(400)]
    e1 = spark.createDataFrame(edges, "src long, dst long").repartition(1)
    e2 = spark.createDataFrame(sorted(edges), "src long, dst long").repartition(13)
    r1 = sorted(map(tuple, pagerank(e1, iterations=4).collect()))
    r2 = sorted(map(tuple, pagerank(e2, iterations=4).collect()))
    assert r1 == r2  # bit-identical regardless of partitioning/order


def test_bigram_surprisal_hand_fixture(spark):
    from p2pddsketch_spark.operators.text import bigram_surprisal
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "x")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in bigram_surprisal(docs, rare_threshold=2).collect()}
    # doc 3 has no bigrams -> absent
    assert set(out) == {1, 2}
    # corpus bigrams: "a b" x3, "b a" x1 -> total 4
    # doc 1: bigrams [a b, b a, a b]; "b a" is rare (<2)
    assert out[1]["n_bigrams"] == 3 and out[1]["n_rare"] == 1
    assert out[2]["n_bigrams"] == 1 and out[2]["n_rare"] == 0
    surp_ab = round(-math.log(3 / 4) / math.log(2.0), 6)
    surp_ba = round(-math.log(1 / 4) / math.log(2.0), 6)
    assert out[2]["surprisal"] == pytest.approx(surp_ab, abs=1e-9)
    assert out[1]["surprisal"] == pytest.approx(2 * surp_ab + surp_ba, abs=1e-9)


def test_triangle_participation_hand_graph(spark):
    from p2pddsketch_spark.operators.triangles import triangle_participation
    # K4 on {1,2,3,4} (4 triangles, each node in 3) plus a pendant 5
    edges = [(a, b) for a in range(1, 5) for b in range(1, 5) if a != b]
    edges.append((4, 5))
    e = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r["n_triangles"] for r in triangle_participation(e).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}  # pendant node 5 in none


def test_accepted_values_requires_nonempty_list(spark):
    from p2pddsketch_spark.operators.quality import Rule, validate
    df = spark.range(3).select(F.col("id").alias("c"))
    with pytest.raises(ValueError):
        validate(df, [Rule("r", "accepted_values", col="c")])


def test_quality_unknown_rule_kind_rejected(spark):
    from p2pddsketch_spark.operators.quality import Rule, validate
    df = spark.range(3).select(F.col("id").alias("c"))
    with pytest.raises(ValueError):
        validate(df, [Rule("r", "no_such_kind", col="c")])


def test_zorder_bits_bounds():
    from p2pddsketch_spark.operators.layout import zorder_col
    with pytest.raises(ValueError):
        zorder_col("x", "y", bits=0)
    with pytest.raises(ValueError):
        zorder_col("x", "y", bits=32)
