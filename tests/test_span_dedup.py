"""Exact substring (duplicate-span) dedup — Lee et al. 2022's
suffix-array dedup re-expressed as distributed window-hash grouping.

Hard oracle: a DuckDB replay computes the same spans from EXACT string
window keys (collision-free ground truth), so the Spark side's 8-byte
xxhash64 keys are verified span-for-span; the strip half is verified
token-array-for-token-array, plus the semantic invariants (exactly one
copy of a duplicated substring survives; untouched docs pass through
byte-identical; sub-min_len docs are never cut).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from p2pddsketch_spark.operators.dedup import (duplicate_spans,
                                               strip_duplicate_spans)

L = 8


def _corpus() -> pd.DataFrame:
    """40 docs of random tokens over a 10^6 alphabet (accidental L-window
    collisions impossible at this size), with planted duplication:
    a 20-token span shared by docs 3 and 7; a 12-token span repeated
    TWICE INSIDE doc 11; doc 20 = doc 21 exactly (whole-doc dup, len L);
    doc 30 shorter than L; doc 35 a PERIODIC repeat (6-token phrase,
    period < L, repeated 4x back-to-back) — the self-overlap case where
    canonical-coverage protection is what keeps one intact copy."""
    rng = np.random.default_rng(42)
    docs = {}
    for d in range(40):
        docs[d] = rng.integers(100, 1_000_000, size=rng.integers(30, 60))
    shared = rng.integers(100, 1_000_000, size=20)
    docs[3] = np.concatenate([docs[3][:10], shared, docs[3][10:]])
    docs[7] = np.concatenate([shared, docs[7][:25]])
    rep = rng.integers(100, 1_000_000, size=12)
    docs[11] = np.concatenate([docs[11][:5], rep, docs[11][5:15], rep])
    whole = rng.integers(100, 1_000_000, size=L)
    docs[20] = whole.copy()
    docs[21] = whole.copy()
    docs[30] = rng.integers(100, 1_000_000, size=L - 1)
    phrase = rng.integers(100, 1_000_000, size=6)
    docs[35] = np.tile(phrase, 4)
    return pd.DataFrame({"doc_id": list(docs),
                         "tokens": [[int(t) for t in v]
                                    for v in docs.values()]})


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = _corpus()
    sdf = spark.createDataFrame(pdf, "doc_id long, tokens array<int>")
    con = duckdb.connect()
    con.register("docs", pdf)
    return sdf, con


def _oracle_spans(con, cross_doc_only: bool) -> pd.DataFrame:
    cond = "n_docs >= 2" if cross_doc_only else "n_occ >= 2"
    return con.execute(f"""
        WITH posn AS (
          SELECT doc_id, tokens,
                 unnest(range(0, len(tokens) - {L} + 1)) AS pos
          FROM docs WHERE len(tokens) >= {L}),
        wins AS (
          SELECT doc_id, pos,
                 array_to_string(tokens[pos + 1 : pos + {L}], ' ') AS key
          FROM posn),
        marked AS (
          SELECT doc_id, pos,
                 count(*) OVER (PARTITION BY key) AS n_occ,
                 count(DISTINCT doc_id) OVER (PARTITION BY key) AS n_docs
          FROM wins),
        isl AS (
          SELECT doc_id, pos,
                 pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                   AS grp
          FROM marked WHERE {cond})
        SELECT doc_id, min(pos) AS span_start,
               max(pos) - min(pos) + {L} AS span_len,
               count(*) AS n_windows
        FROM isl GROUP BY doc_id, grp
        ORDER BY doc_id, span_start""").df()


def test_duplicate_spans_vs_oracle(spark, corpus):
    sdf, con = corpus
    for cross in (False, True):
        got = duplicate_spans(sdf, min_len=L,
                              cross_doc_only=cross).toPandas()
        exp = _oracle_spans(con, cross)
        pd.testing.assert_frame_equal(
            got.astype("int64"), exp.astype("int64"))
    # the planted structure is actually found
    got = duplicate_spans(sdf, min_len=L).toPandas()
    by_doc = {d: g for d, g in got.groupby("doc_id")}
    assert set(by_doc) == {3, 7, 11, 20, 21, 35}
    assert by_doc[3]["span_len"].tolist() == [20]
    assert by_doc[3]["span_start"].tolist() == [10]
    assert by_doc[7]["span_len"].tolist() == [20]
    assert by_doc[11]["span_len"].tolist() == [12, 12]
    assert by_doc[20]["span_len"].tolist() == [L]
    assert by_doc[35]["span_len"].tolist() == [24]   # whole periodic doc
    # the within-doc repeat disappears under cross_doc_only
    cross = duplicate_spans(sdf, min_len=L, cross_doc_only=True).toPandas()
    assert set(cross["doc_id"]) == {3, 7, 20, 21}


def test_strip_duplicate_spans_vs_oracle(spark, corpus):
    sdf, con = corpus
    got = strip_duplicate_spans(sdf, min_len=L).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    exp = con.execute(f"""
        WITH posn AS (
          SELECT doc_id, tokens,
                 unnest(range(0, len(tokens) - {L} + 1)) AS pos
          FROM docs WHERE len(tokens) >= {L}),
        wins AS (
          SELECT doc_id, pos,
                 array_to_string(tokens[pos + 1 : pos + {L}], ' ') AS key
          FROM posn),
        marked AS (
          SELECT doc_id, pos,
                 count(*) OVER (PARTITION BY key) AS n_occ,
                 min((doc_id, pos)) OVER (PARTITION BY key) AS canon
          FROM wins),
        dele AS (
          SELECT doc_id, pos FROM marked
          WHERE n_occ >= 2 AND (doc_id, pos) != canon),
        prot AS (
          SELECT doc_id, pos FROM marked
          WHERE n_occ >= 2 AND (doc_id, pos) = canon),
        isl AS (
          SELECT doc_id, pos,
                 pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                   AS grp
          FROM dele),
        rng AS (
          SELECT doc_id, min(pos) AS s, max(pos) + {L} AS e
          FROM isl GROUP BY doc_id, grp),
        pisl AS (
          SELECT doc_id, pos,
                 pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                   AS grp
          FROM prot),
        prng AS (
          SELECT doc_id, min(pos) AS s, max(pos) + {L} AS e
          FROM pisl GROUP BY doc_id, grp),
        delpos AS (
          SELECT DISTINCT doc_id, p
          FROM (SELECT doc_id, unnest(range(s, e)) AS p FROM rng) dp
          WHERE NOT EXISTS (SELECT 1 FROM prng
                            WHERE prng.doc_id = dp.doc_id
                              AND dp.p >= prng.s AND dp.p < prng.e)),
        toks AS (
          SELECT doc_id, p, tokens[p + 1] AS tok FROM (
            SELECT doc_id, tokens,
                   unnest(range(0, len(tokens))) AS p FROM docs)),
        kept AS (
          SELECT t.doc_id, t.p, t.tok FROM toks t
          ANTI JOIN delpos d ON t.doc_id = d.doc_id AND t.p = d.p)
        SELECT d.doc_id,
               coalesce(list(k.tok ORDER BY k.p)
                        FILTER (k.tok IS NOT NULL), []) AS tokens
        FROM docs d LEFT JOIN kept k USING (doc_id)
        GROUP BY d.doc_id ORDER BY d.doc_id""").df()
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    for g, e in zip(got["tokens"], exp["tokens"]):
        assert list(g) == list(e)
    # invariants: one copy of every duplicated substring survives
    orig = _corpus().set_index("doc_id")["tokens"]
    stripped = got.set_index("doc_id")["tokens"]
    shared = orig[3][10:30]                      # canonical copy in doc 3
    assert list(stripped[3]) == list(orig[3])    # doc 3 untouched (canon)
    assert int(got.set_index("doc_id")["n_deleted"][7]) == 20
    assert list(stripped[7]) == list(orig[7][20:])   # span cut from doc 7
    assert list(stripped[20]) == list(orig[20])  # canonical whole-doc dup
    assert list(stripped[21]) == []              # duplicate fully removed
    assert list(stripped[30]) == list(orig[30])  # sub-L doc passes through
    # within-doc repeat: second copy of `rep` removed from doc 11
    assert int(got.set_index("doc_id")["n_deleted"][11]) == 12
    # periodic self-overlap: canonical coverage [0, 5+L) survives, the
    # rest is cut — an INTACT copy of every duplicated window remains
    assert list(stripped[35]) == list(orig[35][:5 + L])
    assert int(got.set_index("doc_id")["n_deleted"][35]) == 24 - (5 + L)
    # untouched docs pass through byte-identical
    for d in (0, 1, 2, 4, 5):
        assert list(stripped[d]) == list(orig[d])
    del shared


def _strip_reference(docs: dict[int, list[int]], L: int) -> dict:
    """Independent plain-Python replay of the strip rule: duplicated
    window starts -> canonical = lexicographically-first (doc, pos) ->
    non-canonical coverage minus canonical coverage is cut."""
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for d in sorted(docs):
        toks = docs[d]
        for p in range(len(toks) - L + 1):
            occ.setdefault(tuple(toks[p:p + L]), []).append((d, p))
    dele: dict[int, set[int]] = {d: set() for d in docs}
    prot: dict[int, set[int]] = {d: set() for d in docs}
    for places in occ.values():
        if len(places) < 2:
            continue
        canon = min(places)
        for d, p in places:
            tgt = prot if (d, p) == canon else dele
            tgt[d].update(range(p, p + L))
    return {d: [t for i, t in enumerate(docs[d])
                if i not in (dele[d] - prot[d])]
            for d in docs}


def test_strip_small_alphabet_stress(spark):
    """Alphabet-6 random corpora are saturated with accidental repeats
    and self-overlaps — the regime where canonical-coverage protection
    decides almost every position. Pins the distributed result
    token-for-token against the independent plain-Python replay, plus
    the semantic invariant: every duplicated window SURVIVES somewhere
    intact (the canonical copy), and layout doesn't matter."""
    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        docs = {d: [int(t) for t in
                    rng.integers(0, 6, size=rng.integers(0, 40))]
                for d in range(30)}
        pdf = pd.DataFrame({"doc_id": list(docs),
                            "tokens": list(docs.values())})
        sdf = spark.createDataFrame(pdf, "doc_id long, tokens array<int>")
        got = {int(r["doc_id"]): list(r["tokens"])
               for r in strip_duplicate_spans(sdf, min_len=4).collect()}
        exp = _strip_reference(docs, 4)
        assert got == exp, f"seed {seed}"
        # invariant: every duplicated input window survives intact
        def windows(token_lists):
            out = {}
            for toks in token_lists:
                for p in range(len(toks) - 4 + 1):
                    w = tuple(toks[p:p + 4])
                    out[w] = out.get(w, 0) + 1
            return out
        win_in = windows(docs.values())
        win_out = windows(got.values())
        for w, c in win_in.items():
            if c >= 2:
                assert win_out.get(w, 0) >= 1, (seed, w)
        # layout invariance: 13 partitions == default
        got2 = {int(r["doc_id"]): list(r["tokens"])
                for r in strip_duplicate_spans(
                    sdf.repartition(13), min_len=4).collect()}
        assert got2 == exp, f"seed {seed} (repartitioned)"
