"""Shared Spark fixtures. local[4] with Arrow enabled; a deterministic
sequences parquet (20k rows) generated once per session."""

import os
import shutil

import pytest

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession
    s = (SparkSession.builder
         .master("local[4]")
         .appName("p2pddsketch-tests")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.driver.memory", "4g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sequences_path(spark, tmp_path_factory):
    from p2pddsketch_spark.sources.sequences import generate_sequences
    path = str(tmp_path_factory.mktemp("seq") / "sequences.parquet")
    generate_sequences(spark, 20_000, seed=42).write.mode("overwrite").parquet(path)
    yield path
    shutil.rmtree(path, ignore_errors=True)


@pytest.fixture(scope="session")
def sequences_pdf(spark, sequences_path):
    """Pandas copy for exact oracles (small by construction)."""
    return spark.read.parquet(sequences_path).toPandas()
