"""AS-OF join operator (operators/asof.py) — union+window idiom."""

import pandas as pd
from pyspark.sql import functions as F

from p2pddsketch_spark.operators.asof import asof_join


def test_asof_edges(spark):
    """No-prior-row -> null; equal timestamp matches (>= semantics);
    intervening rows pick the LATEST <= ts; keys are independent."""
    left = spark.createDataFrame(pd.DataFrame({
        "k": [1, 1, 1, 2, 3],
        "ts": pd.to_datetime(["2024-01-01", "2024-01-05", "2024-01-10",
                              "2024-01-05", "2024-01-05"]),
        "lid": [10, 11, 12, 20, 30],
    }))
    right = spark.createDataFrame(pd.DataFrame({
        "k": [1, 1, 1, 2],
        "rts": pd.to_datetime(["2024-01-02", "2024-01-05", "2024-01-07",
                               "2024-01-06"]),
        "pay": ["a", "b", "c", "z"],
    }))
    got = (asof_join(left, right, key="k", left_ts="ts", right_ts="rts",
                     payload=("pay",))
           .orderBy("lid").toPandas())
    assert list(got["lid"]) == [10, 11, 12, 20, 30]
    # lid 10: no right row <= Jan 1 -> null; lid 11: equal ts Jan 5 -> 'b';
    # lid 12: latest <= Jan 10 is Jan 7 -> 'c'; k=2 Jan 5 < first right
    # row Jan 6 -> null; k=3 has no right rows at all -> null
    assert [None if pd.isna(x) else x for x in got["pay"]] == \
        [None, "b", "c", None, None]
    # left columns all preserved
    assert set(got.columns) == {"k", "ts", "lid", "pay"}


def test_interval_join_edges(spark):
    """Containment boundaries inclusive on both ends; bucket-spanning
    intervals; no duplicates; disjoint keys never pair."""
    import pandas as pd
    from p2pddsketch_spark.operators.asof import interval_join
    left = spark.createDataFrame(pd.DataFrame({
        "k": [1, 1, 1, 1, 2],
        "ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 01:30:00",
                              "2024-01-01 03:00:00", "2024-01-01 03:00:01",
                              "2024-01-01 01:00:00"]),
        "lid": [0, 1, 2, 3, 4],
    }))
    right = spark.createDataFrame(pd.DataFrame({
        "k": [1],
        "s": pd.to_datetime(["2024-01-01 00:00:00"]),
        "e": pd.to_datetime(["2024-01-01 03:00:00"]),  # spans 4 hour-buckets
        "wid": [100],
    }))
    got = interval_join(left, right, key="k", left_ts="ts",
                        start_col="s", end_col="e").toPandas()
    # start boundary (lid 0) and end boundary (lid 2) INCLUDED; one
    # second past the end (lid 3) excluded; other key (lid 4) excluded
    assert sorted(got["lid"]) == [0, 1, 2]
    assert len(got) == len(got.drop_duplicates(["lid", "wid"]))  # no dups
