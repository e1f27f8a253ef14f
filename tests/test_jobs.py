"""Job entrypoints under pytest: build_and_query's testQuantile contract
and curate's funnel, invoked via main(argv) against the fixture session
(getOrCreate reuses it). spark-submit invocation is exercised separately
(see README / jobs docstrings)."""

import json
import sys

import pytest


def test_build_and_query_verify(spark, tmp_path, capsys):
    sys.path.insert(0, "/root/repo/jobs")
    import build_and_query
    rc = build_and_query.main([
        "--input", "/root/testdata/sf0.001/lineitem.parquet",
        "--value-col", "l_quantity", "--tokens-col", "",
        "--alpha", "0.005", "--verify",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    manifest = json.loads(out[out.index("{"):])
    assert manifest["verify_pass"] is True
    assert manifest["results"]["dds"]["n"] > 0


def test_curate_funnel(spark, tmp_path, capsys):
    sys.path.insert(0, "/root/repo/jobs")
    import curate
    rc = curate.main([
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", str(tmp_path / "curated"),
        "--min-quality", "0.4", "--jaccard", "0.5",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    m = json.loads(out[out.index("{"):])
    assert m["rows_in"] >= m["after_exact_dedup"] >= m["after_near_dedup"] \
        >= m["after_quality"] >= m["after_lang"] > 0
    curated = spark.read.parquet(str(tmp_path / "curated"))
    assert curated.count() == m["after_lang"]
