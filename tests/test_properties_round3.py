"""Property tests (hypothesis) for the late-round-3 operators: SCD-2
merge vs a pandas replay model, salted join vs the plain join, and the
Morton interleave as a bijection. Spark-backed properties run few
examples (each is a full job); the numpy property runs many."""

from datetime import datetime, timedelta

import numpy as np
from hypothesis import given, settings, strategies as st

from p2pddsketch_spark.operators.scd import scd2_merge
from p2pddsketch_spark.operators.skew import salted_join

EPOCH = datetime(2024, 1, 1)


def _t(h):
    return EPOCH + timedelta(hours=int(h))


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 4),            # key
                          st.integers(1, 50),           # ts hours (>= open row)
                          st.integers(0, 9)),           # payload
                min_size=1, max_size=40),
       st.lists(st.integers(0, 4), min_size=1, max_size=5))
def test_scd2_merge_matches_replay(spark, changes, open_keys):
    open_keys = sorted(set(open_keys))
    current = spark.createDataFrame(
        [(k, -1, _t(0), None) for k in open_keys],
        "k long, v long, valid_from timestamp, valid_to timestamp")
    updates = spark.createDataFrame(
        [(k, v, _t(h), i) for i, (k, h, v) in enumerate(changes)],
        "k long, v long, ts timestamp, event_id long")
    out = scd2_merge(current, updates, key="k", ts_col="ts",
                     payload_cols=["v"], tiebreak="event_id")
    # None valid_to (open rows) is not orderable against datetimes —
    # sort via a key that sends open rows last
    sort_key = lambda r: (r[0], r[1], r[2],  # noqa: E731
                          r[3] is None, r[3] or _t(0))
    got = sorted(map(tuple, out.select("k", "v", "valid_from", "valid_to")
                     .collect()), key=sort_key)
    # replay: per key, versions = open row (ts 0, first) + changes in
    # (ts, event_id) order; valid_to = next version's valid_from
    expect = []
    keys = set(open_keys) | {k for k, _, _ in changes}
    for k in sorted(keys):
        vers = ([(_t(0), -1, -1)] if k in open_keys else []) + sorted(
            (_t(h), i, v) for i, (kk, h, v) in enumerate(changes) if kk == k)
        for j, (ts, _, v) in enumerate(vers):
            nxt = vers[j + 1][0] if j + 1 < len(vers) else None
            expect.append((k, v, ts, nxt))
    assert got == sorted(expect, key=sort_key)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(0, 15), min_size=1, max_size=60),
       st.lists(st.integers(0, 15), min_size=1, max_size=20),
       st.integers(1, 6))
def test_salted_join_property(spark, probe_keys, build_keys, salts):
    probe = spark.createDataFrame(
        [(k, i) for i, k in enumerate(probe_keys)], "k long, pid long")
    build = spark.createDataFrame(
        [(k, i) for i, k in enumerate(build_keys)], "k long, bid long")
    got = sorted(map(tuple, salted_join(probe, build, key="k", salts=salts)
                     .select("pid", "bid").collect()))
    expect = sorted((pi, bi) for pi, pk in enumerate(probe_keys)
                    for bi, bk in enumerate(build_keys) if pk == bk)
    assert got == expect


@settings(max_examples=100, deadline=None)
@given(st.integers(0, (1 << 16) - 1), st.integers(0, (1 << 16) - 1))
def test_morton_expr_bijection(x, y):
    """The generated SQL interleave (whose Spark twin is pinned equal in
    test_layout) is the reference Morton code — and it's a bijection."""
    import duckdb
    from p2pddsketch_spark.operators.layout import duckdb_zorder_expr
    (z,) = duckdb.sql(
        f"SELECT {duckdb_zorder_expr(str(x), str(y), 16)}").fetchone()
    ref = 0
    for i in range(16):
        ref |= ((x >> i) & 1) << (2 * i)
        ref |= ((y >> i) & 1) << (2 * i + 1)
    assert z == ref and 0 <= z < (1 << 32)
    rx = ry = 0
    for i in range(16):
        rx |= ((z >> (2 * i)) & 1) << i
        ry |= ((z >> (2 * i + 1)) & 1) << i
    assert (rx, ry) == (x, y)
