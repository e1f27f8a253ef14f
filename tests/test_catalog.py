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


def test_catalog_table_branch(spark):
    """When the name resolves in the session catalog, `table()` goes
    through spark.read.table — exercised with a temp view (the same code
    path an Iceberg catalog table takes)."""
    spark.range(5).createOrReplaceTempView("cat_seq_tbl")
    try:
        cat = Catalog(spark)  # no base_dir: catalog resolution is the only path
        assert cat.is_catalog_table("cat_seq_tbl")
        assert cat.table("cat_seq_tbl").count() == 5
    finally:
        spark.catalog.dropTempView("cat_seq_tbl")


def test_iceberg_files_branch(spark, monkeypatch):
    """The `<table>.files` manifest-listing branch, executed against an
    injected metadata table (no Iceberg jar in this sandbox): the reader
    must be asked for exactly `<name>.files`, project `file_path`, and
    return a SORTED list (round-2 verdict item #5)."""
    asked = []

    def fake_meta(self, name):
        asked.append(name)
        return spark.createDataFrame(
            [("s3://wh/db/t/data/f2.parquet", 100),
             ("s3://wh/db/t/data/f1.parquet", 200),
             ("s3://wh/db/t/data/f3.parquet", 50)],
            "file_path string, record_count long")

    monkeypatch.setattr(Catalog, "_read_metadata_table", fake_meta)
    monkeypatch.setattr(Catalog, "is_catalog_table", lambda self, n: True)
    cat = Catalog(spark)
    files = cat.data_files("db.t")
    assert asked == ["db.t.files"]
    assert files == [f"s3://wh/db/t/data/f{i}.parquet" for i in (1, 2, 3)]
