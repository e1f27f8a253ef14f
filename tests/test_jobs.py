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


def test_curate_importance_stage(spark, tmp_path, capsys):
    """--importance-target keeps exactly the docs whose DSIR score (over
    the post-quality surviving corpus) clears the threshold, and the
    funnel records the stage."""
    sys.path.insert(0, "/root/repo/jobs")
    import curate
    rc = curate.main([
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", str(tmp_path / "curated"),
        "--jaccard", "0.5",
        "--importance-target", "src3",
    ])
    assert rc == 0
    from pyspark.sql import functions as F
    out = capsys.readouterr().out
    m = json.loads(out[out.index("{"):])
    assert 0 < m["after_importance"] <= m["after_decontaminate"]
    # no --mix-budgets: the mix stage must inherit the importance count
    assert m["after_mix"] == m["after_importance"]
    curated = spark.read.parquet(str(tmp_path / "curated"))
    assert curated.count() == m["after_importance"]
    # src3 must survive disproportionately: its docs score >= 0 by
    # construction more often than the rest of the blend
    frac = curated.groupBy().agg(
        F.avg((F.col("source") == "src3").cast("double"))).collect()[0][0]
    base = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").groupBy().agg(
        F.avg((F.col("source") == "src3").cast("double"))).collect()[0][0]
    assert frac > base


def test_curate_semantic_dedup_stage(spark, tmp_path, capsys):
    """--embeddings-input adds the SemDeDup stage: the funnel stays
    monotone through it, the stage count lands between near-dup and
    quality, and every dropped doc really has a surviving semantic
    twin at the threshold (spot-checked via the operator)."""
    sys.path.insert(0, "/root/repo/jobs")
    import curate
    rc = curate.main([
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", str(tmp_path / "curated_sem"),
        "--min-quality", "0.0", "--jaccard", "0.5",
        "--embeddings-input", "/root/testdata/sf0.001/embeddings.parquet",
        "--semantic-threshold", "0.9",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    m = json.loads(out[out.index("{"):])
    assert m["after_near_dedup"] >= m["after_semantic_dedup"] > 0
    assert m["after_semantic_dedup"] >= m["after_quality"]
    curated = spark.read.parquet(str(tmp_path / "curated_sem"))
    assert curated.count() == m["after_lang"]


def test_curate_strip_spans_stage(spark, tmp_path, capsys):
    """--strip-spans cuts the duplicated word span from the
    NON-canonical doc and keeps the canonical copy intact — the region
    remover the whole-doc dedup stages can't express."""
    sys.path.insert(0, "/root/repo/jobs")
    import curate
    span = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = [
        (1, f"one unique opening sentence here {span} and a distinct tail",
         "en", "web", 0),
        (2, f"{span} followed by completely different trailing words "
            "nothing shared beyond the span", "en", "web", 0),
        (3, "an entirely unrelated document with its own private words "
            "sharing no span at all with anything", "en", "web", 0),
    ]
    inp = str(tmp_path / "docs_in")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long").write.parquet(inp)
    rc = curate.main([
        "--input", inp, "--output", str(tmp_path / "curated_spans"),
        "--min-quality", "0.0", "--jaccard", "0.99", "--strip-spans", "8",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    m = json.loads(out[out.index("{"):])
    assert m["docs_span_stripped"] == 1
    got = {r["doc_id"]: r["text"] for r in
           spark.read.parquet(str(tmp_path / "curated_spans")).collect()}
    assert span in got[1]                      # canonical copy survives
    assert span not in got[2]                  # duplicate region cut
    assert "completely different trailing" in got[2]
    assert got[3] == rows[2][1]                # untouched doc unchanged


def test_prepare_sequences_feeds_the_harness(spark, tmp_path, capsys):
    """documents → sequences materialization: the output table has the
    input_hint shape, token arrays regenerate identically (per-row
    token-array equality — the BASELINE per-row invariant), and the
    sketch harness consumes it directly (n_tok quantiles within α of
    exact)."""
    import numpy as np
    sys.path.insert(0, "/root/repo/jobs")
    import prepare_sequences
    out = str(tmp_path / "seqs")
    rc = prepare_sequences.main([
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out, "--vocab-size", "24", "--assign-splits"])
    assert rc == 0
    manifest = json.loads(capsys.readouterr().out.strip())
    assert manifest["n_docs"] == 500 and manifest["oov_tokens"] > 0

    seqs = spark.read.parquet(out)
    assert {"doc_id", "tokens", "n_tok", "source", "split"} <= set(seqs.columns)
    a = {r["doc_id"]: list(r["tokens"]) for r in seqs.collect()}
    # regeneration invariant: a second run yields identical arrays
    out2 = str(tmp_path / "seqs2")
    prepare_sequences.main([
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out2, "--vocab-size", "24"])
    capsys.readouterr()
    b = {r["doc_id"]: list(r["tokens"])
         for r in spark.read.parquet(out2).collect()}
    assert a == b

    # the harness ingests the materialized table directly
    from p2pddsketch_spark.operators.harness import (SketchSpec,
                                                     build_sketches,
                                                     collect_sketches,
                                                     scalar_extractor)
    from p2pddsketch_spark.sketches.ddsketch import DDSketch
    sk = collect_sketches(build_sketches(
        seqs, [SketchSpec("dds", lambda: DDSketch(alpha=0.01, bin_limit=1 << 20),
                          scalar_extractor("n_tok"))], salt_buckets=4))["dds"]
    ntok = np.sort(np.array([len(v) for v in a.values()], dtype=np.float64))
    assert sk.n == len(ntok)
    exact = ntok[int(np.floor(1 + 0.95 * (len(ntok) - 1))) - 1]
    assert abs(sk.quantile(0.95) - exact) / exact <= 0.01 * (1 + 1e-9)


def test_build_and_query_moments_estimator(spark, tmp_path, capsys):
    """--moments builds a second, O(k)-state quantile estimator in the
    same pass; its p50 agrees with DDSketch's within a loose rank
    tolerance (two independent estimators cross-checking)."""
    sys.path.insert(0, "/root/repo/jobs")
    import build_and_query
    rc = build_and_query.main([
        "--input", "/root/testdata/sf0.001/lineitem.parquet",
        "--value-col", "l_quantity", "--tokens-col", "",
        "--alpha", "0.005", "--moments", "--quantiles", "0.5", "0.95",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    manifest = json.loads(out[out.index("{"):])
    dds = manifest["results"]["dds"]["quantiles"]
    mom = manifest["results"]["moments"]["quantiles"]
    assert manifest["results"]["moments"]["n"] == manifest["results"]["dds"]["n"]
    for q in ("0.5", "0.95"):
        assert abs(mom[q] - dds[q]) / dds[q] < 0.10, (q, mom[q], dds[q])


def test_build_and_query_req_estimator(spark, tmp_path, capsys):
    """--req builds the tail-accurate REQ sketch in the same pass; the
    manifest records its quantiles plus the p99/p999 rank-space
    cross-check against DDSketch, and with --verify the REQ rank error
    at the exact quantile values stays inside the k=32 tail bound."""
    sys.path.insert(0, "/root/repo/jobs")
    import build_and_query
    rc = build_and_query.main([
        "--input", "/root/testdata/sf0.001/lineitem.parquet",
        "--value-col", "l_quantity", "--tokens-col", "",
        "--alpha", "0.005", "--req", "--verify",
        "--quantiles", "0.5", "0.99", "0.999",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    manifest = json.loads(out[out.index("{"):])
    req = manifest["results"]["req"]
    assert req["n"] == manifest["results"]["dds"]["n"]
    assert req["retained"] < req["n"]          # it actually compacted
    cc = manifest["tail_crosscheck"]
    assert [c["q"] for c in cc] == [0.99, 0.999]
    assert manifest["tail_crosscheck_pass"] is True
    assert manifest["verify_pass"] is True
    for row in manifest["verify"]:
        assert row["req_rank_err"] <= 0.02, row


def test_build_and_query_estimators_survive_empty_value_column(
        spark, tmp_path, capsys):
    """An all-NULL value column builds empty sketches; DDSketch answers
    NaN, and the moment/REQ branches (whose quantile() raises on empty)
    must still print a manifest instead of crashing — with the
    cross-check explicitly recorded as not-applicable."""
    import math
    path = str(tmp_path / "nulls.parquet")
    spark.sql("SELECT CAST(NULL AS DOUBLE) AS v, id FROM RANGE(100)") \
        .write.parquet(path)
    sys.path.insert(0, "/root/repo/jobs")
    import build_and_query
    rc = build_and_query.main([
        "--input", path, "--value-col", "v", "--tokens-col", "",
        "--req", "--moments", "--quantiles", "0.5", "0.99",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    manifest = json.loads(out[out.index("{"):])
    for fam in ("dds", "moments", "req"):
        assert manifest["results"][fam]["n"] == 0
        for v in manifest["results"][fam]["quantiles"].values():
            assert v is None or math.isnan(v)   # json NaN -> parsed nan
    assert manifest["tail_crosscheck"] == []
    assert manifest["tail_crosscheck_pass"] is None


def test_prepare_sequences_bpe_tokenizer(spark, tmp_path, capsys):
    """--tokenizer bpe materializes trained-BPE sequences (no OOV ids)
    plus the merge table that DEFINES the tokenizer, and the output
    matches bpe_tokenize run directly — the CLI twin of the bpe_tokenize
    / bpe_pack operator path."""
    sys.path.insert(0, "/root/repo/jobs")
    import prepare_sequences
    out = str(tmp_path / "bseqs")
    rc = prepare_sequences.main([
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out, "--tokenizer", "bpe", "--bpe-merges", "3"])
    assert rc == 0
    manifest = json.loads(capsys.readouterr().out.strip())
    assert manifest["tokenizer"] == "bpe"
    assert manifest["bpe_merges"] == 3 and manifest["vocab_size"] is None
    assert manifest["oov_tokens"] == 0          # BPE has no OOV
    assert manifest["n_docs"] == 500

    merges = spark.read.parquet(f"{out}.merges")
    assert merges.count() == 3
    assert set(merges.columns) == {"iteration", "left", "right", "merged",
                                   "pair_count"}

    from p2pddsketch_spark.operators.bpe import bpe_tokenize
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text", "source")
    direct = {r["doc_id"]: list(r["tokens"])
              for r in bpe_tokenize(docs, k=3).collect()}
    job = {r["doc_id"]: list(r["tokens"])
           for r in spark.read.parquet(out).collect()}
    assert job == direct


def test_validate_cli_sequences_audit(spark, tmp_path, capsys):
    """--sequences-audit: a clean drop exits 0 with zero counts, a dirty
    one (n_tok mismatch + negative id) exits 1 with the counts in the
    report; --rules and --sequences-audit are mutually exclusive."""
    sys.path.insert(0, "/root/repo/jobs")
    import validate as validate_job
    clean = str(tmp_path / "clean")
    spark.createDataFrame(
        [("a", [1, 2], 2, "s"), ("b", [], 0, "s")],
        "doc_id string, tokens array<int>, n_tok int, source string") \
        .write.parquet(clean)
    assert validate_job.main(
        ["--input", clean, "--sequences-audit"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["failed"] == 0 and out["audit"]["rows"] == 2

    dirty = str(tmp_path / "dirty")
    spark.createDataFrame(
        [("a", [1], 9, "s"), ("b", [-5], 1, "s")],
        "doc_id string, tokens array<int>, n_tok int, source string") \
        .write.parquet(dirty)
    assert validate_job.main(
        ["--input", dirty, "--sequences-audit"]) == 1
    out = json.loads(capsys.readouterr().out)
    assert out["audit"]["n_tok_mismatch"] == 1
    assert out["audit"]["invalid_token_rows"] == 1

    with pytest.raises(SystemExit):
        validate_job.main(["--input", clean])     # neither mode given


def test_build_and_query_jsonl_input(spark, tmp_path, capsys):
    """--input-format jsonl builds the same DDSketch as the parquet path
    on the same sequences (byte-level manifest equality of the quantile
    answers), and --checkpoint-dir refuses non-parquet input."""
    sys.path.insert(0, "/root/repo/jobs")
    import build_and_query
    from p2pddsketch_spark.errors import ConflictingOptions
    rows = [(f"d{i}", [i % 7, i % 5, i % 3], 3, "s") for i in range(200)]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string")
    jl, pq = str(tmp_path / "jl"), str(tmp_path / "pq")
    df.write.json(jl)
    df.write.parquet(pq)

    def run(inp, fmt):
        rc = build_and_query.main([
            "--input", inp, "--input-format", fmt,
            "--value-col", "n_tok", "--tokens-col", "tokens",
            "--alpha", "0.01", "--quantiles", "0.5", "0.99"])
        assert rc == 0
        out = capsys.readouterr().out
        return json.loads(out[out.index("{"):])["results"]

    a, b = run(jl, "jsonl"), run(pq, "parquet")
    assert a["dds"] == b["dds"]
    assert a["hll"] == b["hll"]

    with pytest.raises(ConflictingOptions):
        build_and_query.main([
            "--input", jl, "--input-format", "jsonl",
            "--value-col", "n_tok", "--tokens-col", "",
            "--checkpoint-dir", str(tmp_path / "ck")])


def test_spark_submit_pyfiles_contract(tmp_path):
    """The north_rule's deployment contract, actually executed: build
    the reproducible --py-files zip (tools/make_pyfiles_zip.py), copy
    the job file OUTSIDE the repo (so `p2pddsketch_spark` can resolve
    ONLY from the zip), and run `spark-submit --py-files` end-to-end —
    stage-1 mapInArrow workers must import every sketch class from the
    shipped archive. Asserts the testQuantile contract passes."""
    import os
    import shutil
    import subprocess
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not os.path.exists(spark_submit):
        pytest.skip("spark-submit not on this machine")
    sys.path.insert(0, "/root/repo/tools")
    import make_pyfiles_zip
    z = make_pyfiles_zip.build(str(tmp_path / "sketchlib.zip"))
    assert z["members"] > 40
    # reproducibility: a second build is byte-identical
    z2 = make_pyfiles_zip.build(str(tmp_path / "sketchlib2.zip"))
    assert (tmp_path / "sketchlib.zip").read_bytes() == \
        (tmp_path / "sketchlib2.zip").read_bytes() and z2["members"] == z["members"]
    job = tmp_path / "build_and_query.py"
    shutil.copy("/root/repo/jobs/build_and_query.py", job)
    proc = subprocess.run(
        [spark_submit, "--master", "local[4]",
         "--py-files", str(tmp_path / "sketchlib.zip"), str(job),
         "--input", "/root/testdata/sf0.001/lineitem.parquet",
         "--value-col", "l_quantity", "--tokens-col", "",
         "--alpha", "0.005", "--verify",
         "--checkpoint-dir", str(tmp_path / "ckpt")],
        cwd=str(tmp_path), capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    manifest = json.loads(out[out.index("{"):])
    assert manifest["verify_pass"] is True


def test_curate_mix_budget_stage(spark, tmp_path, capsys):
    """--mix-budgets turns per-source token budgets into a deterministic
    subset: only listed sources survive, the funnel count lands in the
    manifest, and the selection covers each under-total budget."""
    sys.path.insert(0, "/root/repo/jobs")
    import curate
    rc = curate.main([
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", str(tmp_path / "curated_mix"),
        "--min-quality", "0.0", "--jaccard", "0.5",
        "--mix-budgets", "src0=600,src1=999999",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    m = json.loads(out[out.index("{"):])
    curated = spark.read.parquet(str(tmp_path / "curated_mix"))
    assert m["after_mix"] <= m["after_decontaminate"]
    assert curated.count() == m["after_mix"] > 0
    from pyspark.sql import functions as F
    agg = {r["source"]: r["t"] for r in
           curated.withColumn("_n", F.size(F.split("text", " ")))
           .groupBy("source").agg(F.sum("_n").alias("t")).collect()}
    assert set(agg) <= {"src0", "src1"} and "src0" in agg
    assert agg["src0"] >= 600          # the crossing doc is included
    with pytest.raises(ValueError):
        curate.main([
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", str(tmp_path / "curated_mix_bad"),
            "--mix-budgets", "src0",
        ])


def test_curate_incremental_dedup_state(spark, tmp_path, capsys):
    """--dedup-state: the second curate run over a drop that re-contains
    the first run's docs publishes ONLY the genuinely-new content — the
    cross-run dedup leg. Pinned: run-1 publishes and commits state v1;
    run-2 over old+new drops every previously-published doc before the
    pipeline (after_state_dedup), publishes only new docs, state
    advances to v2; run-3 over the same drop publishes nothing."""
    from pyspark.sql import functions as F
    sys.path.insert(0, "/root/repo/jobs")
    import curate
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wave1 = str(tmp_path / "wave1")
    docs.where(F.col("doc_id") < 250).write.parquet(wave1)
    state = str(tmp_path / "state")

    rc = curate.main([
        "--input", wave1, "--output", str(tmp_path / "out1"),
        "--jaccard", "0.5", "--dedup-state", state,
        "--update-dedup-state"])
    assert rc == 0
    out = capsys.readouterr().out
    m1 = json.loads(out[out.index("{"):])
    assert m1["after_state_dedup"] == m1["rows_in"]   # no state yet
    assert m1["dedup_state_version"] == 1
    out1 = spark.read.parquet(str(tmp_path / "out1"))
    assert "content_hash" in out1.columns
    n_pub1 = out1.count()

    # wave 2 drop: every wave-1 doc again + the rest of the corpus
    wave2 = str(tmp_path / "wave2")
    docs.write.parquet(wave2)
    rc = curate.main([
        "--input", wave2, "--output", str(tmp_path / "out2"),
        "--jaccard", "0.5", "--dedup-state", state,
        "--update-dedup-state"])
    assert rc == 0
    out = capsys.readouterr().out
    m2 = json.loads(out[out.index("{"):])
    # every published wave-1 text was dropped by the state probe
    assert m2["after_state_dedup"] <= m2["rows_in"] - n_pub1
    assert m2["dedup_state_version"] == 2
    pub1 = {r["content_hash"] for r in
            out1.select("content_hash").collect()}
    pub2 = {r["content_hash"] for r in
            spark.read.parquet(str(tmp_path / "out2"))
            .select("content_hash").collect()}
    assert not (pub1 & pub2)          # nothing published twice, ever

    # wave 3 == wave 2. The state records PUBLISHED content, so the only
    # survivors of the probe are docs the earlier runs processed but
    # dropped in-pipeline (quality/near-dup losers) — and whatever they
    # publish now still never duplicates past output
    n_pub2 = spark.read.parquet(str(tmp_path / "out2")).count()
    rc = curate.main([
        "--input", wave2, "--output", str(tmp_path / "out3"),
        "--jaccard", "0.5", "--dedup-state", state])
    assert rc == 0
    out = capsys.readouterr().out
    m3 = json.loads(out[out.index("{"):])
    assert m3["after_state_dedup"] == m3["rows_in"] - n_pub1 - n_pub2
    pub3 = {r["content_hash"] for r in
            spark.read.parquet(str(tmp_path / "out3"))
            .select("content_hash").collect()}
    assert not (pub3 & (pub1 | pub2))
