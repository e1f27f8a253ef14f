"""Table maintenance: compaction / OPTIMIZE-style rewrite.

The write-path counterpart of `operators/layout.py`: rewrite a parquet
table into z-ordered, size-targeted files plus a lineage manifest —
the weekly job a 100 TB corpus runs to keep scan pruning effective as
small append files accumulate. Reference analog: the persist path of
`DDS_PrintCSV` (/root/reference/ddsketch.cc:913-954) writes state for
later runs; here the state is the table layout itself.

Scale shape: one pass computes the min/max scaling bounds (cheap
aggregate — at 100 TB substitute known domain bounds), one
`repartitionByRange` shuffle clusters rows by Morton value into
`n_files` ranges sized to `target_file_bytes`, and the write is
embarrassingly parallel (one file per range partition). Verification
re-scans both layouts with the same order-independent content hash —
two more scans, no shuffle (partial aggregation only).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def content_checksum(df: DataFrame, cols: list[str] | None = None) -> Column:
    """Order-independent content hash: per row, 60 bits of md5 over an
    UNAMBIGUOUS row encoding, reduced mod 1e9+7 and summed. Each column
    is length-prefixed (`len:value`) so separator characters inside
    values cannot shift content across column boundaries, and NULL
    encodes as the bare token `N` (distinct from every `len:value`).
    Engine-stable: the DuckDB twin is
    SUM(('0x' || substr(md5(...), 1, 15))::BIGINT % p) over the same
    encoding with NULL-propagating `||` concatenation; the mod keeps
    the BIGINT sum exact to ~9·10⁹ rows. Timestamps must be
    pre-formatted and doubles pre-quantized by the caller (cross-engine
    string rendering of both is not stable)."""
    cols = cols or df.columns

    def enc(c: str) -> Column:
        s = F.col(c).cast("string")
        # F.concat propagates NULL, so a NULL value yields 'N', while a
        # literal string 'N' yields '1:N'
        return F.coalesce(F.concat(F.length(s).cast("string"),
                                   F.lit(":"), s), F.lit("N"))

    row = F.concat_ws("|", *[enc(c) for c in cols])
    h = F.conv(F.substring(F.md5(row), 1, 15), 16, 10).cast("long")
    return F.sum(h % F.lit(1000000007)).alias("content_hash")


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for any URI Spark itself can reach — the same
    Hadoop-FS resolution the executors use, so sizing and the manifest
    work on object stores, not just the driver's local disk. Raises
    ValueError for schemes the runtime has no connector for (clean
    failure BEFORE the rewrite, not after)."""
    jvm = spark._jvm
    try:
        # Path() itself rejects malformed URIs — keep it inside the try
        # so both failure shapes surface as the documented ValueError
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    except Exception as e:          # Py4JJavaError: bad URI / no scheme
        # keep the root-cause line, not the embedded Java stacktrace
        lines = [ln.strip().lstrip(": ") for ln in str(e).splitlines()]
        detail = next((ln for ln in lines if "Exception" in ln),
                      lines[0] if lines else str(e))
        raise ValueError(
            f"no Hadoop FileSystem for {path!r}: {detail}") from None
    return fs, hpath


def _dir_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_files, total_bytes) of the parquet data files under path.
    Plain local paths take the os.walk fast path; any URI goes through
    the Hadoop FileSystem API (one recursive listing — a bounded
    metadata call, not a data read, even on a 100 TB table)."""
    if "://" not in path:
        if os.path.isfile(path):
            return 1, os.path.getsize(path)
        n = b = 0
        for root, _, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    n += 1
                    b += os.path.getsize(os.path.join(root, f))
        return n, b
    fs, hpath = _hadoop_fs(spark, path)
    st = fs.getFileStatus(hpath)
    if st.isFile():
        return 1, int(st.getLen())
    n = b = 0
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(".parquet"):
            n += 1
            b += int(f.getLen())
    return n, b


def _read_text(spark: SparkSession, path: str) -> str:
    """Read a small text file at `path` — local fast path or Hadoop
    FileSystem for URIs (the inverse of `_write_text`)."""
    if "://" not in path:
        with open(path) as f:
            return f.read()
    fs, hpath = _hadoop_fs(spark, path)
    # pre-check existence: fs.open on a missing URI raises a Py4J-wrapped
    # Java FileNotFoundException, which callers' `except FileNotFoundError`
    # contract (ann_index info, pq_index load) would never catch
    if not fs.exists(hpath):
        raise FileNotFoundError(path)
    stream = fs.open(hpath)
    try:
        # py4j passes buffers by value, so a read-into-bytearray loop
        # can't work; commons-io ships with Hadoop and drains the stream
        # JVM-side in one call (these are small manifest files)
        data = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        return bytes(data).decode("utf-8")
    finally:
        stream.close()


def _write_text(spark: SparkSession, path: str, text: str) -> None:
    """Write a small text file at `path` via the local filesystem or,
    for URIs, the Hadoop FileSystem API (overwrite)."""
    if "://" not in path:
        with open(path, "w") as f:
            f.write(text)
        return
    fs, hpath = _hadoop_fs(spark, path)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def compact_zorder(spark: SparkSession, input_path: str, output_path: str,
                   x: str, y: str, bits: int = 16,
                   target_file_bytes: int = 128 * 1024 * 1024,
                   hash_cols: list[str] | None = None,
                   extra_zorder_cols: list[str] | None = None) -> dict:
    """OPTIMIZE: rewrite `input_path` into z-ordered parquet at
    `output_path` — clustered on (x, y) plus any `extra_zorder_cols`
    (d-column Morton; d·bits ≤ 63) — one file per Morton range sized to
    `target_file_bytes`, verify row-identity (count + order-independent
    content hash) and write a `_manifest.json` lineage record. Raises
    ValueError if the rewrite lost or altered rows."""
    from p2pddsketch_spark.operators.layout import zorder_layout_nd
    for p in (input_path, output_path):
        if "://" in p:
            # resolve the FileSystem NOW: an unsupported scheme (no
            # connector jar) must fail before the rewrite starts, not
            # after it has written a full copy of the table
            _hadoop_fs(spark, p)
    t0 = time.monotonic()
    zcols = [x, y] + list(extra_zorder_cols or [])
    # d·bits must fit a positive BIGINT: clamp and record the effective
    # resolution rather than failing after the input scan (the default
    # bits=16 with 2 extra columns would otherwise always raise)
    bits_eff = min(bits, 63 // len(zcols))
    df = spark.read.parquet(input_path)
    in_files, in_bytes = _dir_stats(spark, input_path)
    n_files = max(1, -(-in_bytes // target_file_bytes))
    zorder_layout_nd(df, zcols, bits=bits_eff, partitions=int(n_files)) \
        .write.mode("overwrite").parquet(output_path)

    cols = hash_cols or df.columns
    def identity(p: str):
        d = spark.read.parquet(p).select(*cols)
        return d.agg(F.count(F.lit(1)).alias("n_rows"),
                     content_checksum(d, cols)).first()
    before, after = identity(input_path), identity(output_path)
    if (before["n_rows"], before["content_hash"]) != \
            (after["n_rows"], after["content_hash"]):
        raise ValueError(
            f"compaction changed table content: {tuple(before)} -> {tuple(after)}")
    out_files, out_bytes = _dir_stats(spark, output_path)
    manifest = {
        "input_path": input_path, "output_path": output_path,
        "zorder": zcols, "bits": bits_eff,
        "target_file_bytes": int(target_file_bytes),
        "rows": int(before["n_rows"]),
        "content_hash": int(before["content_hash"]),
        "files_in": in_files, "bytes_in": in_bytes,
        "files_out": out_files, "bytes_out": out_bytes,
        "secs": round(time.monotonic() - t0, 3),
    }
    # inside the output directory ON PURPOSE: Spark's file index hides
    # `_`-prefixed names (the `_SUCCESS` convention), so every reader —
    # plain, recursiveFileLookup, or a downstream compaction — skips it
    # while it still travels WITH the data on copy/move. Pinned by
    # tests/test_maintenance.py::test_manifest_invisible_to_readers.
    _write_text(spark, output_path.rstrip("/") + "/_manifest.json",
                json.dumps(manifest, indent=1))
    return manifest
