"""Source-format ingest: JSONL / CSV / parquet drops all normalize to
the canonical sequences shape with token-array equality (the per-row
invariant), explicit schemas (never inference), and a loud audit."""

import pytest
from pyspark.sql import functions as F

from p2pddsketch_spark.errors import ParamError
from p2pddsketch_spark.sources.ingest import (SEQUENCES_SCHEMA,
                                              read_sequences,
                                              validate_sequences)


@pytest.fixture(scope="module")
def seqs(spark):
    rows = [
        ("d1", [1, 2, 3], 3, "web"),
        ("d2", [], 0, "web"),                       # zero-token doc
        ("d3", [7, 7, 2147480000], 3, "books"),     # near-int32-max id
        ("d4", [5], 1, None),                       # NULL source
    ]
    return spark.createDataFrame(rows, SEQUENCES_SCHEMA)


def _collect(df):
    return sorted(
        (r["doc_id"], tuple(r["tokens"]) if r["tokens"] is not None else None,
         r["n_tok"], r["source"])
        for r in df.collect())


def test_roundtrip_all_formats(spark, seqs, tmp_path):
    expect = _collect(seqs)
    pq = str(tmp_path / "pq")
    seqs.write.parquet(pq)
    assert _collect(read_sequences(spark, pq, "parquet")) == expect

    oc = str(tmp_path / "oc")
    seqs.write.orc(oc)
    assert _collect(read_sequences(spark, oc, "orc")) == expect

    jl = str(tmp_path / "jl")
    seqs.write.json(jl)
    assert _collect(read_sequences(spark, jl, "jsonl")) == expect

    cs = str(tmp_path / "cs")
    (seqs.select("doc_id", F.array_join("tokens", " ").alias("tokens"),
                 "n_tok", "source")
     .write.option("header", "true").csv(cs))
    assert _collect(read_sequences(spark, cs, "csv")) == expect


def test_missing_n_tok_recomputed(spark, tmp_path):
    jl = str(tmp_path / "nolen")
    spark.createDataFrame(
        [("a", [4, 5], None, "s")], SEQUENCES_SCHEMA).write.json(jl)
    got = read_sequences(spark, jl, "jsonl").first()
    assert got["n_tok"] == 2


def test_unknown_format_raises(spark):
    with pytest.raises(ParamError, match="unknown sequences format"):
        read_sequences(spark, "/tmp/x", "avro")


def test_validate_sequences_counts(spark):
    rows = [
        ("a", [1, 2], 2, "s"),       # clean
        ("b", [1], 5, "s"),          # n_tok mismatch
        ("c", [-3, 1], 2, "s"),      # invalid token id (< -1)
        ("d", [-1, 4], 2, "s"),      # OOV sentinel: informational only
        (None, [1], 1, "s"),         # NULL doc_id
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string")
    rep = validate_sequences(df)
    assert rep == {"rows": 5, "null_doc_id": 1, "n_tok_mismatch": 1,
                   "invalid_token_rows": 1, "oov_rows": 1}


def test_ingested_sequences_feed_the_harness(spark, seqs, tmp_path):
    """An ingested JSONL drop drives the sketch harness exactly like the
    parquet path: DDSketch over n_tok, byte-identical to the local
    single-shot build over the same rows."""
    import numpy as np
    from p2pddsketch_spark.operators.harness import (SketchSpec,
                                                     build_sketches,
                                                     collect_sketches,
                                                     scalar_extractor)
    from p2pddsketch_spark.sketches.ddsketch import DDSketch
    jl = str(tmp_path / "feed")
    seqs.write.json(jl)
    df = read_sequences(spark, jl, "jsonl")
    out = build_sketches(
        df, [SketchSpec("dds", lambda: DDSketch(alpha=0.01),
                        scalar_extractor("n_tok"))])
    sk = collect_sketches(out)["dds"]
    ref = DDSketch(alpha=0.01).update_batch(
        np.array([r["n_tok"] for r in seqs.collect()], dtype=np.float64))
    assert sk.to_bytes() == ref.to_bytes()


def test_read_documents_roundtrip_tricky_text(spark, tmp_path):
    """Raw-text document drops in JSONL and CSV: commas, quotes,
    unicode, and NULL text survive byte-for-byte (CSV via quoted
    single-line cells; JSONL natively)."""
    from p2pddsketch_spark.sources.ingest import (DOCUMENTS_SCHEMA,
                                                  read_documents)
    rows = [
        (1, 'plain words here', "web"),
        (2, 'commas, "quotes", and more, commas', "web"),
        (3, 'unicode: éè 中文 \U0001f600', "books"),
        (4, None, None),
    ]
    df = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    expect = sorted((r["doc_id"], r["text"], r["source"])
                    for r in df.collect())
    jl = str(tmp_path / "docs_jl")
    df.write.json(jl)
    got_jl = sorted((r["doc_id"], r["text"], r["source"])
                    for r in read_documents(spark, jl, "jsonl").collect())
    assert got_jl == expect
    cs = str(tmp_path / "docs_cs")
    df.write.option("header", "true").option("escape", '"').csv(cs)
    got_cs = sorted((r["doc_id"], r["text"], r["source"])
                    for r in read_documents(spark, cs, "csv").collect())
    assert got_cs == expect


def test_prepare_sequences_from_jsonl(spark, tmp_path, capsys):
    """A JSONL documents drop runs straight through prepare_sequences
    (--format jsonl) and produces the same sequences as the parquet
    path."""
    import json as _json
    import sys as _sys
    _sys.path.insert(0, "/root/repo/jobs")
    import prepare_sequences
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text", "source").limit(100)
    jl = str(tmp_path / "drop_jl")
    docs.write.json(jl)
    pq = str(tmp_path / "drop_pq")
    docs.write.parquet(pq)
    out_a, out_b = str(tmp_path / "seq_a"), str(tmp_path / "seq_b")
    assert prepare_sequences.main(
        ["--input", jl, "--format", "jsonl", "--output", out_a,
         "--vocab-size", "16"]) == 0
    assert prepare_sequences.main(
        ["--input", pq, "--output", out_b, "--vocab-size", "16"]) == 0
    capsys.readouterr()
    a = {r["doc_id"]: list(r["tokens"])
         for r in spark.read.parquet(out_a).collect()}
    b = {r["doc_id"]: list(r["tokens"])
         for r in spark.read.parquet(out_b).collect()}
    assert a == b and len(a) == 100


from hypothesis import given, settings, strategies as st


@settings(max_examples=6, deadline=None)
@given(st.lists(st.lists(st.integers(0, 2**31 - 1),
                         min_size=0, max_size=8),
                min_size=1, max_size=6))
def test_property_csv_sequences_roundtrip(spark, token_lists):
    """Arbitrary int32 token arrays survive the CSV space-join encoding
    byte-for-byte (the lossy-format contract: arrays roundtrip, only
    NULL-vs-empty collapses)."""
    from p2pddsketch_spark.sources.ingest import read_sequences
    import tempfile
    rows = [(f"d{i}", toks, len(toks), "s")
            for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string")
    with tempfile.TemporaryDirectory() as td:
        cs = f"{td}/cs"
        (df.select("doc_id", F.array_join("tokens", " ").alias("tokens"),
                   "n_tok", "source")
         .write.option("header", "true").csv(cs))
        got = {r["doc_id"]: list(r["tokens"])
               for r in read_sequences(spark, cs, "csv").collect()}
    assert got == {f"d{i}": toks for i, toks in enumerate(token_lists)}


def test_streaming_ingest_jsonl_sequences(spark, tmp_path):
    """A JSONL sequences drop is a STREAMING source too: readStream with
    the explicit ingest schema over the drop directory, foreachBatch
    sketch writer, availableNow drain — the final DDSketch over n_tok is
    byte-identical to the batch build over the same rows (micro-batch
    layout is irrelevant to an order-invariant merge)."""
    import os
    import numpy as np
    from p2pddsketch_spark.operators.harness import (SketchSpec,
                                                     build_sketches,
                                                     collect_sketches,
                                                     scalar_extractor)
    from p2pddsketch_spark.sketches.ddsketch import DDSketch
    from p2pddsketch_spark.sources.ingest import (SEQUENCES_SCHEMA,
                                                  read_sequences)
    from p2pddsketch_spark.streaming.sketch_stream import \
        ForeachBatchSketchWriter
    rows = [(f"d{i}", [i % 11, i % 7], 2 + (i % 9), "s")
            for i in range(300)]
    df = spark.createDataFrame(rows, SEQUENCES_SCHEMA)
    src = str(tmp_path / "drop")
    df.repartition(4).write.json(src)          # 4 files -> 4 micro-batches

    spec = [SketchSpec("dds_ntok", lambda: DDSketch(alpha=0.01),
                       scalar_extractor("n_tok"))]
    writer = ForeachBatchSketchWriter(
        spec, state_dir=str(tmp_path / "state"), salt_buckets=2)
    stream = (spark.readStream.schema(SEQUENCES_SCHEMA)
              .option("maxFilesPerTrigger", 1).json(src))
    q = (stream.writeStream.foreachBatch(writer)
         .trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    q.awaitTermination(120)
    got = writer.current_sketches(spark)["dds_ntok"]

    batch = collect_sketches(build_sketches(
        read_sequences(spark, src, "jsonl"), spec,
        salt_buckets=2))["dds_ntok"]
    assert got.to_bytes() == batch.to_bytes()
    assert got.n == 300


def test_audit_pipeline_own_output(spark, tmp_path, capsys):
    """The flagship audit loop: prepare_sequences' own parquet output
    (doc_id int64 passes through from the documents table) must read
    through read_sequences — doc_id conforms to string — and pass
    `validate.py --sequences-audit` with exit 0."""
    import sys as _sys
    _sys.path.insert(0, "/root/repo/jobs")
    import json as _json
    import prepare_sequences
    import validate as validate_job
    out = str(tmp_path / "own")
    assert prepare_sequences.main(
        ["--input", "/root/testdata/sf0.001/documents.parquet",
         "--output", out, "--vocab-size", "16"]) == 0
    capsys.readouterr()
    assert validate_job.main(["--input", out, "--sequences-audit"]) == 0
    rep = _json.loads(capsys.readouterr().out)
    assert rep["audit"]["rows"] == 500 and rep["failed"] == 0
    got = read_sequences(spark, out, "parquet")
    assert dict(got.dtypes)["doc_id"] == "string"


def test_jsonl_failfast_on_malformed_row(spark, tmp_path):
    """FAILFAST is load-bearing: a malformed JSONL line must abort the
    read loudly, never become a silent NULL row (PERMISSIVE's default
    would)."""
    import os
    from py4j.protocol import Py4JJavaError
    from p2pddsketch_spark.sources.ingest import read_sequences
    bad = str(tmp_path / "bad")
    os.makedirs(bad)
    with open(os.path.join(bad, "part-0.json"), "w") as fh:
        fh.write('{"doc_id": "a", "tokens": [1], "n_tok": 1, "source": "s"}\n')
        fh.write('this is not json\n')
    with pytest.raises(Py4JJavaError):
        read_sequences(spark, bad, "jsonl").collect()
