"""Z-order layout: correctness of the Morton expression and the
measured row-group pruning receipt (the reason the operator exists)."""

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from p2pddsketch_spark.operators.layout import (duckdb_zorder_expr,
                                                zorder_col, zorder_layout)


def _morton_ref(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_col_matches_reference_and_sql(spark):
    import duckdb
    rng = np.random.default_rng(0)
    pts = [(int(a), int(b)) for a, b in rng.integers(0, 1 << 12, (200, 2))]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {(r["x"], r["y"]): r["z"] for r in
           df.select("x", "y", zorder_col("x", "y", 12).alias("z")).collect()}
    sql = duckdb.sql(
        "SELECT x, y, " + duckdb_zorder_expr("x", "y", 12) + " AS z FROM "
        "(SELECT UNNEST($xs) AS x, UNNEST($ys) AS y)",
        params={"xs": [p[0] for p in pts], "ys": [p[1] for p in pts]}).fetchall()
    for x, y, z in sql:
        assert got[(x, y)] == z == _morton_ref(x, y, 12)


def _groups_hit(path: str, xcol: str, ycol: str, box) -> tuple[int, int]:
    """(row groups whose min/max intersect the box, total row groups)."""
    x0, x1, y0, y1 = box
    hit = total = 0
    for piece in __import__("glob").glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(piece).metadata
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            stats = {rg.column(c).path_in_schema: rg.column(c).statistics
                     for c in range(rg.num_columns)}
            total += 1
            sx, sy = stats[xcol], stats[ycol]
            if sx.max >= x0 and sx.min <= x1 and sy.max >= y0 and sy.min <= y1:
                hit += 1
    return hit, total


def test_zorder_layout_prunes_box_queries(spark, tmp_path):
    """The measured receipt: under z-layout a box predicate on (x, y)
    intersects far fewer row groups than under a single-column sort —
    parquet min/max pruning works on BOTH axes."""
    li = (spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
          .select("l_partkey", "l_suppkey", "l_quantity"))
    zpath, xpath = str(tmp_path / "z"), str(tmp_path / "x")
    small_groups = {"parquet.block.size": 64 * 1024}
    (zorder_layout(li, "l_partkey", "l_suppkey", bits=11, partitions=4)
     .write.options(**small_groups).parquet(zpath))
    (li.repartitionByRange(4, "l_partkey").sortWithinPartitions("l_partkey")
     .write.options(**small_groups).parquet(xpath))

    big = 1 << 20
    xbox = (100, 300, 0, big)    # selective on partkey only
    ybox = (0, big, 10, 14)      # selective on suppkey only
    zx, ztot = _groups_hit(zpath, "l_partkey", "l_suppkey", xbox)
    zy, _ = _groups_hit(zpath, "l_partkey", "l_suppkey", ybox)
    xx, xtot = _groups_hit(xpath, "l_partkey", "l_suppkey", xbox)
    xy, _ = _groups_hit(xpath, "l_partkey", "l_suppkey", ybox)
    # sanity: same data, comparable group counts
    assert ztot > 8 and xtot > 8
    # the x-sorted layout prunes x... but not y AT ALL:
    assert xx / xtot < 0.5
    assert xy == xtot
    # z-order prunes meaningfully on BOTH axes — that's the operator:
    assert zx / ztot < 0.5, (zx, ztot)
    assert zy / ztot < 0.5, (zy, ztot)
    # and the layouts hold identical data
    a = spark.read.parquet(zpath).groupBy().sum("l_quantity").collect()
    b = spark.read.parquet(xpath).groupBy().sum("l_quantity").collect()
    assert a == b


def test_zorder_layout_wide_domain_no_overflow(spark):
    """Min-max scaling must go through double before the multiply:
    (col - lo) * top in int64 wraps for spans wider than ~2^47 at
    bits=16, scrambling the z-order. With the double path, extreme-corner
    rows keep their relative order."""
    big = 1 << 55
    rows = [(0, 0), (big, big), (big // 2, big // 2), (0, big), (big, 0)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = zorder_layout(df, "x", "y", bits=16, partitions=1)
    got = [(r["x"], r["y"]) for r in out.collect()]
    # z(0,0) < z(mid,mid) < z(big,big) under a correct Morton order
    order = {v: i for i, v in enumerate(got)}
    assert order[(0, 0)] < order[(big // 2, big // 2)] < order[(big, big)]


def test_zorder_nd_matches_reference_and_sql(spark):
    """3-column Morton: Spark expression == DuckDB twin == a bit-loop
    reference, and parameter guards reject >63 z-bits / <2 columns."""
    import duckdb
    from p2pddsketch_spark.operators.layout import (duckdb_zorder_expr_nd,
                                                    zorder_col_nd)

    def ref(vals, bits):
        z = 0
        for i in range(bits):
            for j, v in enumerate(vals):
                z |= ((v >> i) & 1) << (len(vals) * i + j)
        return z

    rng = np.random.default_rng(2)
    pts = [tuple(int(v) for v in row)
           for row in rng.integers(0, 1 << 10, (100, 3))]
    df = spark.createDataFrame(pts, "x long, y long, w long")
    got = {(r["x"], r["y"], r["w"]): r["z"] for r in
           df.select("x", "y", "w",
                     zorder_col_nd(["x", "y", "w"], 10).alias("z")).collect()}
    sql = duckdb.sql(
        "SELECT x, y, w, " + duckdb_zorder_expr_nd(["x", "y", "w"], 10) +
        " AS z FROM (SELECT UNNEST($xs) AS x, UNNEST($ys) AS y, "
        "UNNEST($ws) AS w)",
        params={"xs": [p[0] for p in pts], "ys": [p[1] for p in pts],
                "ws": [p[2] for p in pts]}).fetchall()
    for x, y, w, z in sql:
        assert got[(x, y, w)] == z == ref((x, y, w), 10)
    with pytest.raises(ValueError):
        zorder_col_nd(["x", "y", "w"], 22)        # 66 z-bits
    with pytest.raises(ValueError):
        zorder_col_nd(["x"], 8)


def test_zorder_nd_layout_prunes_all_three_axes(spark, tmp_path):
    """The d-column receipt: under the 3-col z-layout a box selective on
    ANY one axis prunes row groups; under a 1-col sort only that column
    prunes."""
    from p2pddsketch_spark.operators.layout import zorder_layout_nd
    li = (spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
          .select("l_partkey", "l_suppkey", "l_orderkey"))
    zpath = str(tmp_path / "z3")
    small_groups = {"parquet.block.size": 64 * 1024}
    (zorder_layout_nd(li, ["l_partkey", "l_suppkey", "l_orderkey"],
                      bits=10, partitions=4)
     .write.options(**small_groups).parquet(zpath))
    big = 1 << 30
    hits = {}
    for axis, box in {"x": (100, 300, 0, big),
                      "y": (0, big, 10, 14)}.items():
        hits[axis] = _groups_hit(zpath, "l_partkey", "l_suppkey", box)
    zx, ztot = hits["x"]
    zy, _ = hits["y"]
    zo, _ = _groups_hit(zpath, "l_orderkey", "l_suppkey", (100, 3000, 0, big))
    assert ztot >= 6
    assert zx < ztot and zy < ztot and zo < ztot
