"""Persisted-sketch-table query flow: build grouped sketches once, write
them as parquet, query later from SQL via the registered UDFs — no
rebuild."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from p2pddsketch_spark.functions.sketch_udfs import (dds_quantile_udf,
                                                     register_sketch_udfs)
from p2pddsketch_spark.operators.harness import (SketchSpec, build_sketches,
                                                 scalar_extractor)
from p2pddsketch_spark.sketches.ddsketch import DDSketch


def test_persisted_sketch_table_query(spark, tmp_path):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = build_sketches(
        ev, [SketchSpec("dds_value", lambda: DDSketch(alpha=0.01, bin_limit=1 << 20),
                        scalar_extractor("value"))],
        group_cols=("event_type",), salt_buckets=4)
    table = str(tmp_path / "sketches.parquet")
    out.write.parquet(table)

    # later session: query without rebuilding
    register_sketch_udfs(spark)
    spark.read.parquet(table).createOrReplaceTempView("sketches")
    got = {r["event_type"]: (r["p95"], r["n"]) for r in spark.sql(
        "SELECT event_type, dds_quantile(sketch, 0.95) AS p95, "
        "sketch_count(sketch) AS n FROM sketches").collect()}

    pdf = ev.select("event_type", "value").toPandas()
    for etype, grp in pdf.groupby("event_type"):
        sk = DDSketch(alpha=0.01, bin_limit=1 << 20).update_batch(grp["value"].to_numpy())
        assert got[etype][1] == sk.n
        assert abs(got[etype][0] - sk.quantile(0.95)) < 1e-12


def test_udaf_build_and_merge_reaggregation(spark):
    """The GROUPED_AGG UDAF pair: dds_build aggregates raw values to
    sketch bytes inside GROUP BY; sketch_merge re-aggregates a persisted
    partial table to a coarser grouping — and the re-aggregated sketch
    is BYTE-IDENTICAL to building from all raw values at once (merge
    associativity, the north-rule UDAF contract)."""
    from p2pddsketch_spark.functions.sketch_udfs import (dds_build_udaf,
                                                         sketch_merge_udaf)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    fine = (ev.groupBy("event_type", (F.col("user_id") % 4).alias("b"))
            .agg(dds_build_udaf(0.01, 1 << 20)("value").alias("sketch")))
    coarse = (fine.groupBy("event_type")
              .agg(sketch_merge_udaf()("sketch").alias("sketch")))
    got = {r["event_type"]: bytes(r["sketch"]) for r in coarse.collect()}
    pdf = ev.select("event_type", "value").toPandas()
    for etype, grp in pdf.groupby("event_type"):
        direct = DDSketch(alpha=0.01, bin_limit=1 << 20) \
            .update_batch(grp["value"].to_numpy())
        assert got[etype] == direct.to_bytes(), etype
    # same thing from plain SQL (UDAFs registered)
    register_sketch_udfs(spark)
    ev.createOrReplaceTempView("ev_udaf")
    row = spark.sql(
        "SELECT dds_quantile(dds_build(value), 0.5) AS p50 FROM ev_udaf"
    ).collect()[0]
    allsk = DDSketch(alpha=0.01, bin_limit=1 << 22) \
        .update_batch(pdf["value"].to_numpy())
    assert abs(row["p50"] - allsk.quantile(0.5)) < 1e-12


def test_delete_batch_turnstile():
    rng = np.random.default_rng(55)
    keep = rng.lognormal(0, 1, 5000)
    churn = rng.lognormal(0, 1, 2000)
    s = DDSketch(alpha=0.005, bin_limit=1 << 22)
    s.update_batch(np.concatenate([keep, churn]))
    s.delete_batch(churn)
    ref = DDSketch(alpha=0.005, bin_limit=1 << 22).update_batch(keep)
    assert s.n == ref.n
    # per-bucket counts equal the never-inserted reference
    assert np.array_equal(s.keys, ref.keys)
    assert np.array_equal(s.counts, ref.counts)
    srt = np.sort(keep)
    for q in [0.1, 0.5, 0.9, 0.99]:
        exact = srt[int(np.floor(1 + q * (len(srt) - 1))) - 1]
        assert abs((s.quantile(q) - exact) / exact) <= 0.005 * (1 + 1e-9)


def test_theta_cardinality_udf_null_total(spark):
    """NULL sketch blobs (outer joins, empty groups) yield NULL
    estimates, not a TypeError inside the pandas UDF."""
    from p2pddsketch_spark.functions.sketch_udfs import (
        theta_build_udaf, theta_cardinality_udf)
    df = spark.createDataFrame([(1, 10), (1, 20), (2, 30)], "g int, v int")
    built = df.groupBy("g").agg(theta_build_udaf()(F.col("v")).alias("blob"))
    allg = spark.createDataFrame([(1,), (2,), (3,)], "g int")
    joined = allg.join(built, "g", "left")
    got = {r["g"]: r["est"] for r in joined.select(
        "g", theta_cardinality_udf()(F.col("blob")).alias("est")).collect()}
    assert got[3] is None
    assert got[1] == 2.0 and got[2] == 1.0


def test_udaf_gate_row_aggregates_blobs_not_raw_rows(spark):
    """The registered dds_udaf_by_flag composition must feed the
    GROUPED_AGG UDAF with harness-partial sketch BLOBS — never raw
    l_quantity (a raw-column grouped-agg UDAF full-shuffles the table,
    the one plan shape that dies at 10^12 rows)."""
    from p2pddsketch_spark.functions.sketch_udfs import sketch_merge_udaf
    from p2pddsketch_spark.operators.harness import (EMPTY_MARKER,
                                                     build_partials)
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    spec = [SketchSpec("dds", lambda: DDSketch(alpha=0.01, bin_limit=1 << 20),
                       scalar_extractor("l_quantity"))]
    partials = build_partials(li, spec, group_cols=("l_returnflag",))
    merged = (partials.where(F.col("sketch_name") != EMPTY_MARKER)
              .groupBy("l_returnflag")
              .agg(sketch_merge_udaf()(F.col("sketch")).alias("sketch")))
    plan = merged._jdf.queryExecution().executedPlan().toString()
    agg_lines = [ln for ln in plan.splitlines()
                 if "AggregateInPandas" in ln or "ArrowAggregatePython" in ln]
    assert agg_lines, plan
    for ln in agg_lines:
        assert "sketch_merge" in ln and "l_quantity" not in ln, ln
    # the one Exchange before the UDAF ships (group, blob) columns only
    ex_lines = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert ex_lines and all("l_quantity" not in ln for ln in ex_lines), plan


def test_ams_blobs_through_generic_sql_surface(spark, tmp_path):
    """AMS blobs ride the generic SQL surface: per-partition AMS states
    persisted to a sketch table re-aggregate with `sketch_merge` (magic
    dispatch) and `ams_f2`/`ams_inner` answer F2 and join-size straight
    from blobs in SQL — estimates identical to the direct object path."""
    import numpy as np
    from p2pddsketch_spark.functions.sketch_udfs import register_sketch_udfs
    from p2pddsketch_spark.sketches.ams import AmsSketch

    register_sketch_udfs(spark)
    rng = np.random.default_rng(9)
    ka, kb = rng.integers(0, 200, 8000), rng.integers(0, 400, 6000)
    parts_a = np.array_split(ka, 4)
    parts_b = np.array_split(kb, 3)
    rows = [("a", i, AmsSketch(128).update_batch(p).to_bytes())
            for i, p in enumerate(parts_a)]
    rows += [("b", i, AmsSketch(128).update_batch(p).to_bytes())
             for i, p in enumerate(parts_b)]
    spark.createDataFrame(rows, "side string, pid int, blob binary") \
        .createOrReplaceTempView("ams_partials")
    got = spark.sql("""
        WITH merged AS (
          SELECT side, sketch_merge(blob) AS blob
          FROM ams_partials GROUP BY side)
        SELECT a.side, ams_f2(a.blob) AS f2,
               ams_inner(a.blob, b.blob) AS joinsize
        FROM merged a JOIN merged b ON b.side = 'b' AND a.side = 'a'
    """).collect()[0]
    sa = AmsSketch(128).update_batch(ka)
    sb = AmsSketch(128).update_batch(kb)
    assert got["f2"] == sa.estimate_f2()
    assert got["joinsize"] == sa.inner_product(sb)


def test_hll_build_udaf_and_merge(spark):
    """hll_build: GROUPED_AGG HLL from SQL GROUP BY. The per-group blob
    byte-matches a direct single-threaded build (registers are a pure
    max over item hashes); sketch_merge re-aggregation to a coarser
    grouping byte-matches the one-shot build; estimates from
    hll_cardinality stay within the p=14 error bound of exact."""
    from p2pddsketch_spark.functions.sketch_udfs import (hll_build_udaf,
                                                         sketch_merge_udaf)
    from p2pddsketch_spark.sketches.hll import HyperLogLog
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    fine = (ev.groupBy("event_type", (F.col("user_id") % 4).alias("b"))
            .agg(hll_build_udaf(14, 0)("user_id").alias("sketch")))
    coarse = (fine.groupBy("event_type")
              .agg(sketch_merge_udaf()("sketch").alias("sketch")))
    got = {r["event_type"]: bytes(r["sketch"]) for r in coarse.collect()}
    pdf = ev.select("event_type", "user_id").toPandas()
    for etype, grp in pdf.groupby("event_type"):
        direct = HyperLogLog(p=14, seed=0).update_batch(
            grp["user_id"].to_numpy())
        assert got[etype] == direct.to_bytes(), etype
    # SQL surface: estimate within the HLL bound of the exact distinct
    register_sketch_udfs(spark)
    ev.createOrReplaceTempView("ev_hll_udaf")
    # (a GROUPED_AGG pandas UDF can't share a query with non-pandas
    # aggregates like COUNT DISTINCT — compare via two queries)
    rows = spark.sql(
        "SELECT event_type, hll_cardinality(hll_build(user_id)) AS est "
        "FROM ev_hll_udaf GROUP BY event_type").collect()
    exact = {r["event_type"]: r["exact"] for r in spark.sql(
        "SELECT event_type, COUNT(DISTINCT user_id) AS exact "
        "FROM ev_hll_udaf GROUP BY event_type").collect()}
    assert rows
    for r in rows:
        e = exact[r["event_type"]]
        assert abs(r["est"] - e) / e < 0.05, r


def test_bloom_build_udaf_and_contains(spark):
    """bloom_build: GROUPED_AGG Bloom filter from SQL GROUP BY — the
    membership member of the north rule's five named UDAF families.
    Per-group blob byte-matches a direct build (bitset OR is
    order-invariant); sketch_merge re-aggregation byte-matches the
    one-shot build; bloom_contains has NO false negatives on every
    inserted key and NULL-propagates on outer-join rows."""
    from p2pddsketch_spark.functions.sketch_udfs import (bloom_build_udaf,
                                                         sketch_merge_udaf)
    from p2pddsketch_spark.sketches.bloom import BloomFilter
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    fine = (ev.groupBy("event_type", (F.col("user_id") % 4).alias("b"))
            .agg(bloom_build_udaf(1 << 16, 5, 0)("user_id").alias("sketch")))
    coarse = (fine.groupBy("event_type")
              .agg(sketch_merge_udaf()("sketch").alias("sketch")))
    got = {r["event_type"]: bytes(r["sketch"]) for r in coarse.collect()}
    pdf = ev.select("event_type", "user_id").toPandas()
    for etype, grp in pdf.groupby("event_type"):
        direct = BloomFilter(m_bits=1 << 16, k=5, seed=0).update_batch(
            grp["user_id"].to_numpy())
        assert got[etype] == direct.to_bytes(), etype
    # SQL probe: no false negatives across every (event_type, user) pair
    register_sketch_udfs(spark)
    ev.createOrReplaceTempView("ev_blm_udaf")
    spark.sql(
        "SELECT event_type, bloom_build(user_id) AS sketch "
        "FROM ev_blm_udaf GROUP BY event_type"
    ).createOrReplaceTempView("blm_blobs")
    rows = spark.sql(
        "SELECT e.event_type, e.user_id, bloom_contains(b.sketch, e.user_id) AS hit "
        "FROM (SELECT DISTINCT event_type, user_id FROM ev_blm_udaf) e "
        "JOIN blm_blobs b USING (event_type)").collect()
    assert rows and all(r["hit"] is True for r in rows)
    # NULL blob / NULL item → NULL, not a worker TypeError
    nulls = spark.sql(
        "SELECT bloom_contains(CAST(NULL AS BINARY), 1L) AS a, "
        "       bloom_contains(sketch, CAST(NULL AS BIGINT)) AS b "
        "FROM blm_blobs LIMIT 1").collect()[0]
    assert nulls["a"] is None and nulls["b"] is None


def test_kll_build_udaf_order_invariant_below_capacity(spark):
    """kll_build in the no-compaction regime (group size ≤ k): level 0
    holds every value and the canonical sorted wire form makes the blob
    row-order-INVARIANT — the same group shuffled through two different
    partitionings produces byte-identical sketches that byte-match a
    direct build."""
    from p2pddsketch_spark.functions.sketch_udfs import kll_build_udaf
    from p2pddsketch_spark.sketches.kll import KLLSketch
    rng = np.random.default_rng(7)
    vals = rng.normal(100.0, 15.0, size=200)
    rows = [(int(i % 3), float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g int, v double")
    blobs = {}
    for nparts in (1, 7):
        out = (df.repartition(nparts, "v").groupBy("g")
               .agg(kll_build_udaf(256)("v").alias("sk")).collect())
        blobs[nparts] = {r["g"]: bytes(r["sk"]) for r in out}
    assert blobs[1] == blobs[7]
    for g in range(3):
        direct = KLLSketch(k=256).update_batch(vals[np.arange(200) % 3 == g])
        assert blobs[1][g] == direct.to_bytes(), g


def test_kll_tdigest_udafs_conservation_and_rank_bounds(spark):
    """kll_build / tdigest_build on a compaction-sized group: n (and
    KLL's total item weight) are exactly conserved, and the p50/p95
    estimates read back through the generic `sketch_quantile` dispatch
    stay within 5% fractional rank of exact — the two order-sensitive
    quantile families' UDAF contract."""
    from p2pddsketch_spark.sketches.kll import KLLSketch
    from p2pddsketch_spark.sketches.tdigest import TDigest
    register_sketch_udfs(spark)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.createOrReplaceTempView("ev_kll_udaf")
    rows = spark.sql(
        "SELECT event_type, "
        "       kll_build(value) AS kll, tdigest_build(value) AS tdg, "
        "       sketch_quantile(kll_build(value), 0.5) AS kll_p50, "
        "       sketch_quantile(tdigest_build(value), 0.95) AS tdg_p95 "
        "FROM ev_kll_udaf GROUP BY event_type").collect()
    assert rows
    pdf = ev.select("event_type", "value").toPandas()
    for r in rows:
        grp = np.sort(pdf[pdf["event_type"] == r["event_type"]]["value"]
                      .to_numpy(dtype=np.float64))
        n = grp.size
        kll = KLLSketch.from_bytes(bytes(r["kll"]))
        tdg = TDigest.from_bytes(bytes(r["tdg"]))
        assert kll.n == n and tdg.n == n
        _, w = kll._items_weights()
        assert int(w.sum()) == n          # weight conservation through compaction
        for est, q in ((r["kll_p50"], 0.5), (r["tdg_p95"], 0.95)):
            frac_rank = np.searchsorted(grp, est, side="right") / n
            assert abs(frac_rank - q) < 0.05, (r["event_type"], q, est)


def test_cms_build_udaf_point_counts(spark):
    """cms_build: GROUPED_AGG count-min from SQL GROUP BY; point
    queries via cms_count. Per-group blob byte-matches a direct build;
    sketch_merge re-aggregation byte-matches one-shot; point estimates
    upper-bound exact counts and are exact in the sparse regime (5
    event types × ≤ 500 users per group << width 16384)."""
    from p2pddsketch_spark.functions.sketch_udfs import (cms_build_udaf,
                                                         sketch_merge_udaf)
    from p2pddsketch_spark.sketches.cms import CountMinSketch
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    fine = (ev.groupBy("event_type", (F.col("user_id") % 4).alias("b"))
            .agg(cms_build_udaf(5, 16384, 0)("user_id").alias("sketch")))
    coarse = (fine.groupBy("event_type")
              .agg(sketch_merge_udaf()("sketch").alias("sketch")))
    got = {r["event_type"]: bytes(r["sketch"]) for r in coarse.collect()}
    pdf = ev.select("event_type", "user_id").toPandas()
    for etype, grp in pdf.groupby("event_type"):
        direct = CountMinSketch(depth=5, width=16384, seed=0).update_batch(
            grp["user_id"].to_numpy())
        assert got[etype] == direct.to_bytes(), etype
    # SQL point query: estimate >= exact, == exact while sparse
    register_sketch_udfs(spark)
    ev.createOrReplaceTempView("ev_cms_udaf")
    spark.sql(
        "SELECT event_type, cms_build(user_id) AS sketch "
        "FROM ev_cms_udaf GROUP BY event_type"
    ).createOrReplaceTempView("cms_blobs")
    rows = spark.sql(
        "SELECT b.event_type, e.user_id, cms_count(b.sketch, e.user_id) AS est "
        "FROM (SELECT DISTINCT event_type, user_id FROM ev_cms_udaf "
        "      WHERE user_id < 10) e "
        "JOIN cms_blobs b USING (event_type)").collect()
    assert rows
    exact = pdf.groupby(["event_type", "user_id"]).size().to_dict()
    for r in rows:
        e = exact[(r["event_type"], r["user_id"])]
        assert r["est"] >= e, r
        assert r["est"] == e, r   # sparse regime: no collisions expected
