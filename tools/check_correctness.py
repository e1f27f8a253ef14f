"""Local replica of the driver's correctness gate: run each
__spark_entry__ query at sf0.01 and compare with its DuckDB oracle
(column names sorted, rows sorted, values compared exactly)."""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2:] if len(sys.argv) > 2 else None

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    failed = []
    times: dict[str, float] = {}
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.monotonic()
        try:
            sdf = canon(fn(spark, SF_DIR).toPandas())
        except Exception as ex:
            print(f"{name:32s} SPARK-ERROR {type(ex).__name__}: {ex}")
            failed.append(name)
            continue
        secs = time.monotonic() - t0
        times[name] = round(secs, 2)
        if name not in oracles:
            print(f"{name:32s} rows-only   {len(sdf):6d} rows  {secs:5.1f}s")
            continue
        try:
            odf = canon(con.sql(oracles[name]).df())
        except Exception as ex:
            print(f"{name:32s} ORACLE-ERROR {type(ex).__name__}: {ex}")
            failed.append(name)
            continue
        ok_schema = list(sdf.columns) == list(odf.columns)
        ok_rows = len(sdf) == len(odf)
        ok_vals = ok_schema and ok_rows and sdf.equals(odf)
        status = "MATCH" if ok_vals else "MISMATCH"
        print(f"{name:32s} {status:11s} {len(sdf):6d} rows  {secs:5.1f}s")
        if not ok_vals:
            failed.append(name)
            if not ok_schema:
                print(f"   schema: spark={list(sdf.columns)} oracle={list(odf.columns)}")
            elif not ok_rows:
                print(f"   rows: spark={len(sdf)} oracle={len(odf)}")
            else:
                neq = ~(sdf == odf).all(axis=1)
                if hasattr(neq, "to_numpy"):
                    bad = np.flatnonzero(neq.to_numpy())[:3]
                    for i in bad:
                        print(f"   spark : {sdf.iloc[i].to_dict()}")
                        print(f"   oracle: {odf.iloc[i].to_dict()}")
    spark.stop()
    if not ONLY:
        # committed per-query gate wall times (Spark side, local[8] at
        # SF_DIR): lets the window rotation balance driver-gate runtime,
        # not just staleness
        import json
        import os
        rec = {"sf_dir": SF_DIR, "spark_secs": times,
               "total_secs": round(sum(times.values()), 1),
               # failures recorded explicitly: errored queries have no
               # time entry, mismatched ones do — a partial record must
               # never masquerade as a green run
               "failed": sorted(failed),
               "generated_by": "tools/check_correctness.py"}
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH", "gate_times.json")
        with open(path, "w") as f:
            json.dump(rec, f, indent=1, sort_keys=True)
        print(f"\nper-query gate times -> {path}")
    print("\nFAILED:" if failed else "\nALL MATCH", failed if failed else "")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
