"""Unit tests for salted_join (row parity with the plain join, salt in
the physical join keys) and scd2_merge (hand-built dimension fixture
with pre-existing closed rows)."""

from datetime import datetime

from pyspark.sql import functions as F

from p2pddsketch_spark.operators.scd import scd2_merge
from p2pddsketch_spark.operators.skew import salted_join


def test_salted_join_matches_plain_join(spark):
    probe = spark.range(0, 5000).select(
        (F.col("id") % 40).alias("k"), F.col("id").alias("pid"))
    build = spark.range(0, 30).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("payload"))
    plain = probe.join(build, "k").select("pid", "payload")
    salted = salted_join(probe, build, key="k", salts=4).select("pid", "payload")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_keeps_unmatched(spark):
    probe = spark.range(0, 100).select((F.col("id") % 50).alias("k"),
                                       F.col("id").alias("pid"))
    build = spark.range(0, 10).select(F.col("id").alias("k"),
                                      F.lit("hit").alias("tag"))
    out = salted_join(probe, build, key="k", salts=3, how="left")
    assert out.count() == 100
    assert out.where(F.col("tag").isNull()).count() == 80


def test_salted_join_plan_has_salt_key_and_no_broadcast(spark):
    probe = spark.range(0, 1000).select((F.col("id") % 10).alias("k"),
                                        F.col("id").alias("pid"))
    build = spark.range(0, 10).select(F.col("id").alias("k"))
    plan = salted_join(probe, build, key="k", salts=4) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan


def _ts(s):
    return datetime.fromisoformat(s)


def test_scd2_merge_hand_fixture(spark):
    current = spark.createDataFrame(
        [(1, "a", _ts("2024-01-01"), _ts("2024-02-01")),   # closed
         (1, "b", _ts("2024-02-01"), None),                # open
         (2, "x", _ts("2024-01-15"), None)],               # open, untouched
        "k long, v string, valid_from timestamp, valid_to timestamp")
    updates = spark.createDataFrame(
        [(1, "c", _ts("2024-03-01"), 1),
         (1, "d", _ts("2024-04-01"), 2)],
        "k long, v string, ts timestamp, event_id long")
    out = scd2_merge(current, updates, key="k", ts_col="ts",
                     payload_cols=["v"], tiebreak="event_id")
    rows = sorted(map(tuple, out.select("k", "v", "valid_from", "valid_to")
                      .collect()))
    assert rows == sorted([
        (1, "a", _ts("2024-01-01"), _ts("2024-02-01")),
        (1, "b", _ts("2024-02-01"), _ts("2024-03-01")),  # open row closed
        (1, "c", _ts("2024-03-01"), _ts("2024-04-01")),
        (1, "d", _ts("2024-04-01"), None),               # new open row
        (2, "x", _ts("2024-01-15"), None),               # untouched key
    ])


def test_salted_join_rejects_outer_joins(spark):
    from pyspark.sql import functions as SF
    import pytest as _pt
    probe = spark.range(4).select(SF.col("id").alias("k"))
    build = spark.range(4).select(SF.col("id").alias("k"))
    with _pt.raises(ValueError):
        salted_join(probe, build, key="k", salts=2, how="full")
    with _pt.raises(ValueError):
        salted_join(probe, build, key="k", salts=2, how="right")
