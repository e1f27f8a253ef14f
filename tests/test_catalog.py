"""Catalog fallback behavior (no Iceberg jar in the sandbox)."""

import pytest

from p2pddsketch_spark.sources.catalog import Catalog


def test_parquet_fallback(spark):
    cat = Catalog(spark, base_dir="/root/testdata/sf0.001")
    df = cat.table("events")
    assert df.count() > 0
    files = cat.data_files("events")
    assert files and all(f.endswith(".parquet") for f in files)


def test_missing_table_raises(spark):
    cat = Catalog(spark, base_dir="/root/testdata/sf0.001")
    with pytest.raises(FileNotFoundError):
        cat.table("nonexistent_table")


def test_no_base_dir_raises(spark):
    cat = Catalog(spark)
    with pytest.raises(ValueError):
        cat.table("events")
