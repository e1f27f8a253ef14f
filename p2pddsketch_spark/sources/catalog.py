"""Thin table catalog: Iceberg-first, parquet-directory fallback.

The production deployment reads `spark.read.table("db.sequences")` from
an Iceberg catalog (10^12-row table; partition pruning and manifest-level
file listing come from the table format). This sandbox has no Iceberg
runtime jar, so every call degrades gracefully to a parquet directory
carrying the identical schema — all tests run on the fallback, and the
fast-path file listing maps 1:1 onto an Iceberg manifest listing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["Catalog"]


class Catalog:
    """Resolves table names to DataFrames and stage-1 file lists.

    * `table("sequences")` → `spark.read.table` if the name resolves in
      the session catalog (Iceberg/HMS), else `spark.read.parquet` under
      `base_dir`.
    * `data_files("sequences")` → the file list the mapInArrow fast path
      parallelizes over: Iceberg's `<table>.files` metadata table when
      available, else a directory listing.
    """

    def __init__(self, spark: SparkSession, base_dir: str | None = None) -> None:
        self.spark = spark
        self.base_dir = base_dir

    def _parquet_path(self, name: str) -> str:
        if not self.base_dir:
            raise ValueError(f"table {name!r} not in catalog and no base_dir set")
        for cand in (os.path.join(self.base_dir, f"{name}.parquet"),
                     os.path.join(self.base_dir, name)):
            if os.path.exists(cand):
                return cand
        raise FileNotFoundError(f"no parquet for table {name!r} under {self.base_dir}")

    def is_catalog_table(self, name: str) -> bool:
        try:
            return self.spark.catalog.tableExists(name)
        except Exception:
            return False

    def table(self, name: str) -> DataFrame:
        if self.is_catalog_table(name):
            return self.spark.read.table(name)
        return self.spark.read.parquet(self._parquet_path(name))

    def _read_metadata_table(self, name: str) -> DataFrame:
        """Read an Iceberg metadata table (e.g. `<table>.files`). Split out
        so the branch is unit-testable without an Iceberg runtime jar
        (tests/test_catalog.py injects a stand-in here)."""
        return self.spark.read.table(name)

    def data_files(self, name: str) -> list[str]:
        """Deterministic (sorted) list of data files for stage-1 fan-out."""
        if self.is_catalog_table(name):
            # Iceberg metadata table: one row per data file
            rows = self._read_metadata_table(f"{name}.files") \
                .select("file_path").collect()
            return sorted(r["file_path"] for r in rows)
        from p2pddsketch_spark.operators.harness import parquet_file_list
        return parquet_file_list(self._parquet_path(name))

    def write(self, df: DataFrame, name: str, mode: str = "overwrite",
              partition_by: tuple[str, ...] = ()) -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        if self.is_catalog_table(name) or self.base_dir is None:
            w.saveAsTable(name)
        else:
            w.parquet(os.path.join(self.base_dir, f"{name}.parquet"))
