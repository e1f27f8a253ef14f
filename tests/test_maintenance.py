"""Compaction/OPTIMIZE job: verified rewrite, manifest lineage, and the
re-measured pruning receipt on the rewritten layout."""

import glob
import json
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from p2pddsketch_spark.operators.maintenance import (compact_zorder,
                                                     content_checksum)

SRC = "/root/testdata/sf0.01/lineitem.parquet"


def _groups_hit(path, xcol, ycol, box):
    x0, x1, y0, y1 = box
    hit = total = 0
    for piece in glob.glob(f"{path}/*.parquet"):
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


def test_compact_zorder_verified_rewrite(spark, tmp_path):
    out = str(tmp_path / "li_opt")
    manifest = compact_zorder(
        spark, SRC, out, "l_partkey", "l_suppkey", bits=11,
        target_file_bytes=256 * 1024,
        hash_cols=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                   "l_returnflag", "l_linestatus"])
    # size-targeted multi-file output, all rows preserved
    assert manifest["files_out"] >= 4
    assert manifest["rows"] == spark.read.parquet(SRC).count()
    # the on-disk manifest matches the returned one
    disk = json.load(open(os.path.join(out, "_manifest.json")))
    assert disk == manifest
    # independent identity check on stable columns
    cols = ["l_orderkey", "l_partkey", "l_linenumber"]
    def h(p):
        d = spark.read.parquet(p).select(*cols)
        return tuple(d.agg(F.count(F.lit(1)), content_checksum(d, cols)).first())
    assert h(SRC) == h(out)

    # pruning receipt ON THE REWRITTEN LAYOUT: a box selective on either
    # axis hits a minority of row groups (the payoff the job exists for)
    big = 1 << 30
    zx, ztot = _groups_hit(out, "l_partkey", "l_suppkey", (100, 300, 0, big))
    zy, _ = _groups_hit(out, "l_partkey", "l_suppkey", (0, big, 10, 14))
    assert ztot >= 4
    assert zx < ztot and zy < ztot  # both axes prune after the rewrite


def test_compact_zorder_detects_content_change(spark, tmp_path, monkeypatch):
    """If the rewrite were lossy the job must fail loudly: simulate by
    hashing a column the rewrite (legitimately) preserves, then corrupt
    the comparison path by pointing verification at a filtered view."""
    out = str(tmp_path / "bad_opt")
    real_parquet = type(spark.read).parquet

    def tampered(self, path):
        df = real_parquet(self, path)
        # drop a row on every read of the output path: the verification
        # re-read then sees altered content and must raise
        if path == out:
            return df.where(F.col("l_orderkey") != 1)
        return df

    monkeypatch.setattr(type(spark.read), "parquet", tampered)
    with pytest.raises(ValueError, match="compaction changed"):
        compact_zorder(spark, SRC, out, "l_partkey", "l_suppkey",
                       bits=8, target_file_bytes=1 << 20,
                       hash_cols=["l_orderkey", "l_partkey"])


def test_optimize_table_cli(spark, tmp_path):
    from jobs.optimize_table import main
    out = str(tmp_path / "cli_opt")
    rc = main(["--input", SRC, "--output", out,
               "--zorder", "l_partkey,l_suppkey",
               "--target-file-mb", "1",
               "--hash-cols", "l_orderkey,l_partkey,l_linenumber"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "_manifest.json"))


def test_content_checksum_unambiguous_encoding(spark):
    """Distinct row contents must hash differently: separator injection
    ('a|b','c') vs ('a','b|c') and NULL-position swaps ('a',NULL) vs
    (NULL,'a') are the ambiguity classes of naive concat_ws."""
    def h(rows):
        df = spark.createDataFrame(rows, "c1 string, c2 string")
        return df.agg(content_checksum(df, ["c1", "c2"])).first()[0]
    assert h([("a|b", "c")]) != h([("a", "b|c")])
    assert h([("a", None)]) != h([(None, "a")])
    assert h([("N", "x")]) != h([(None, "x")])   # literal 'N' vs NULL
    assert h([("1:N", "x")]) != h([("N", "x")])


def test_compact_unsupported_scheme_fails_before_rewrite(spark):
    """A URI whose scheme has no FileSystem connector in this runtime
    (s3:// here — no hadoop-aws jar) must fail cleanly BEFORE any data
    is rewritten, via the same Hadoop-FS resolution the executors use."""
    with pytest.raises(ValueError, match="no Hadoop FileSystem"):
        compact_zorder(spark, "s3://bucket/events", "/tmp/out",
                       "a", "b")


def test_compact_zorder_file_uri_through_fs_api(spark, tmp_path):
    """file:// URIs exercise the Hadoop FileSystem sizing + manifest
    path end-to-end (the object-store code path, minus the store)."""
    out = f"file://{tmp_path}/li_fs"
    manifest = compact_zorder(
        spark, f"file://{SRC}", out, "l_partkey", "l_suppkey",
        target_file_bytes=1 << 20,
        hash_cols=["l_orderkey", "l_partkey", "l_linenumber"])
    assert manifest["rows"] == spark.read.parquet(SRC).count()
    assert manifest["files_out"] >= 1 and manifest["bytes_out"] > 0
    disk = json.load(open(os.path.join(str(tmp_path), "li_fs",
                                       "_manifest.json")))
    assert disk == manifest


def test_manifest_invisible_to_readers(spark, tmp_path):
    """`_manifest.json` lives INSIDE the output directory — safe because
    Spark's file index hides `_`-prefixed names (the _SUCCESS
    convention) under every listing mode. If this ever regressed, a
    recursive-listing read would try to parse it as parquet."""
    out = str(tmp_path / "li_vis")
    compact_zorder(spark, SRC, out, "l_partkey", "l_suppkey",
                   target_file_bytes=1 << 20,
                   hash_cols=["l_orderkey", "l_partkey"])
    assert os.path.exists(os.path.join(out, "_manifest.json"))
    n = spark.read.parquet(SRC).count()
    assert spark.read.parquet(out).count() == n
    assert (spark.read.option("recursiveFileLookup", "true")
            .parquet(out).count() == n)


def test_compact_zorder_extra_cols_clamps_bits(spark, tmp_path):
    """3+-column clustering must work at the default bits (auto-clamped
    to 63 // d) and record the effective resolution in the manifest."""
    out = str(tmp_path / "li_opt3")
    manifest = compact_zorder(
        spark, SRC, out, "l_partkey", "l_suppkey",
        extra_zorder_cols=["l_orderkey", "l_linenumber"],
        target_file_bytes=1 << 20,
        hash_cols=["l_orderkey", "l_partkey", "l_linenumber"])
    assert manifest["zorder"] == ["l_partkey", "l_suppkey", "l_orderkey",
                                  "l_linenumber"]
    assert manifest["bits"] == 15                 # 63 // 4 (16 would raise)
    assert manifest["rows"] == spark.read.parquet(SRC).count()


def test_optimize_table_cli_missing_input_one_line_json(tmp_path, capsys):
    """The CLI's error contract covers a missing input too: the local
    pre-check raises FileNotFoundError and a missing parquet raises
    AnalysisException, both of which must come back as ONE JSON error
    line + rc 1, never a raw traceback (round-5 verdict defect #2)."""
    from jobs.optimize_table import main
    rc = main(["--input", str(tmp_path / "does_not_exist"),
               "--output", str(tmp_path / "out"),
               "--zorder", "a,b"])
    captured = capsys.readouterr().out.strip().splitlines()[-1]
    assert rc == 1
    import json as _json
    assert "error" in _json.loads(captured)
