"""End-to-end corpus-preparation pipeline (plans/corpus.py and its
streaming twin plans/corpus_stream.py): the beyond-reference operators
chained as one ingest run."""

import datetime as dt

from pyspark.sql import functions as F

from hogzilla_spark.plans.corpus import prepare_corpus
from hogzilla_spark.plans.corpus_stream import corpus_ingest_stream

def test_prepare_corpus_end_to_end(spark, tmp_path):
    out = str(tmp_path / "corpus")
    report = prepare_corpus(spark, "/root/testdata/sf0.001", out)

    # counts are coherent: monotone non-increasing through dedup stages
    assert report["input_docs"] >= report["after_exact_dedup"] >= report["after_neardup_dedup"] > 0
    assert report["output_chunks"] > 0

    clean = spark.read.parquet(f"{out}/clean_docs.parquet")
    chunks = spark.read.parquet(f"{out}/chunks.parquet")

    # no surviving exact duplicates
    from hogzilla_spark.operators.text import fingerprint
    n_fp = clean.select(fingerprint("text").alias("fp")).distinct().count()
    assert n_fp == clean.count() == report["output_docs"]

    # every chunk belongs to a surviving doc; chunk ids start at 0
    orphans = chunks.join(clean.select("doc_id"), "doc_id", "left_anti")
    assert orphans.count() == 0
    assert chunks.groupBy("doc_id").agg(F.min("chunk_id").alias("m")) \
        .filter("m != 0").count() == 0

    # shards: ids non-negative, per-language offsets consistent
    assert clean.filter("shard_id < 0").count() == 0
    assert {"shard_id", "shard_offset", "gopher_pass", "n_tok"} <= set(clean.columns)

def test_prepare_corpus_stage_report(spark, tmp_path):
    """VERDICT r10 task 3: the report carries per-stage wall-clock,
    rows in/out, and selectivity — the observability a training-data
    user reads.  Pins the stage schema and the committed sf10 record
    (CORPUS_E2E.json) against drift."""
    out = str(tmp_path / "corpus_sr")
    src = "/root/testdata/sf0.001"
    report = prepare_corpus(
        spark, src, out,
        lm_ppl_max=1e9,                      # stage on, nothing dropped
        dsir_target=f"{src}/documents.parquet",
        dsir_keep_frac=0.9,
        dsir_buckets=256,
    )
    names = [s["stage"] for s in report["stages"]]
    assert names == [
        "input_scan", "exact_dedup", "line_dedup", "quality_signals",
        "lm_perplexity_filter", "dsir_select", "lsh_component_dedup",
        "shard_pack_write", "chunk_write",
    ]
    for s in report["stages"]:
        assert s["seconds"] >= 0 and s["rows_out"] >= 0
        if "rows_in" in s and s["rows_in"]:
            assert s["selectivity"] == round(s["rows_out"] / s["rows_in"], 6)
    # stage seconds sum to the total (same clock, contiguous marks)
    assert (
        abs(sum(s["seconds"] for s in report["stages"]) - report["total_seconds"])
        < 1.0
    )
    # flat keys agree with their stage rows
    assert report["stages"][1]["rows_out"] == report["after_exact_dedup"]
    assert report["stages"][-1]["rows_out"] == report["output_chunks"]

    # the committed sf10 record has the same shape
    import json
    import os

    path = "/root/repo/CORPUS_E2E.json"
    assert os.path.exists(path), "committed corpus e2e record missing"
    doc = json.load(open(path))
    assert {"_note", "src", "config", "report"} <= set(doc)
    rec = doc["report"]
    assert {"stages", "total_seconds", "input_docs", "output_chunks"} <= set(rec)
    rec_names = [s["stage"] for s in rec["stages"]]
    assert [n for n in rec_names if n != "quality_drop"] == names
    assert all(s["seconds"] >= 0 for s in rec["stages"])

    # r11 verdict task 3: the committed record must demonstrate every
    # gate actually selecting — strictly inside (0,1), not vacuously 0
    # or 1 (the r11 record's gopher_pass=0/lines_removed=0 read as
    # "covered" while demonstrating nothing).  The record is produced on
    # a --plant-gopher dir (tools/scale_testdata.py) where a planted
    # subpopulation passes the Gopher bounds, shares boilerplate tail
    # lines, and carries near-dup pairs.
    by_name = {s["stage"]: s for s in rec["stages"]}
    assert doc["config"]["drop_low_quality"] is True
    assert rec["lines_removed"] > 0
    assert by_name["line_dedup"]["lines_removed"] > 0
    assert 0 < rec["gopher_pass"] < rec["after_exact_dedup"]
    for gate in ("exact_dedup", "quality_drop", "lm_perplexity_filter",
                 "dsir_select", "lsh_component_dedup"):
        sel = by_name[gate]["selectivity"]
        assert 0 < sel < 1, f"{gate} selectivity {sel} is vacuous"


def test_prepare_corpus_langless_corpus(spark, tmp_path):
    """A corpus WITHOUT a lang column must run end-to-end (global shard
    packing), and requesting an absent partition column must fail fast
    BEFORE stage 1 pays any compute."""
    import pytest

    src = str(tmp_path / "src")
    (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .drop("lang")
        .limit(100)
        .write.parquet(f"{src}/documents.parquet")
    )
    out = str(tmp_path / "corpus3")
    report = prepare_corpus(spark, src, out)
    assert report["output_docs"] > 0
    clean = spark.read.parquet(f"{out}/clean_docs.parquet")
    assert "shard_id" in clean.columns
    with pytest.raises(ValueError, match="shard_partition_cols"):
        prepare_corpus(
            spark, src, str(tmp_path / "corpus4"),
            shard_partition_cols=["lang"],
        )

def test_prepare_corpus_quality_drop(spark, tmp_path):
    """drop_low_quality prunes to the gopher_pass subset (empty on the
    synthetic corpus — the flag-not-drop default exists for exactly
    this reason, and the drop path must still run clean)."""
    out = str(tmp_path / "corpus2")
    report = prepare_corpus(
        spark, "/root/testdata/sf0.001", out, drop_low_quality=True
    )
    assert report["after_quality_drop"] == report["gopher_pass"]
    assert report["output_docs"] == spark.read.parquet(
        f"{out}/clean_docs.parquet"
    ).count()

def test_prepare_corpus_planted_all_stages_select(spark, tmp_path):
    """r11 verdict task 3, gate-scale twin of the committed-record
    assertions: on a --plant-gopher fixture every gate stage selects
    strictly inside (0,1) — quality drop keeps exactly the planted
    subpopulation, line dedup strips the shared boilerplate tail, the
    LM filter splits the Zipf-vocabulary docs at a measured quantile,
    and the LSH component pass collapses the planted near-dup pairs."""
    import subprocess
    import sys as _sys

    src = str(tmp_path / "planted_src")
    subprocess.run(
        [_sys.executable, "/root/repo/tools/scale_testdata.py",
         "/root/testdata/sf0.01", src, "1", "--plant-gopher", "5"],
        check=True, capture_output=True,
    )
    # pass 1: LM stage on but non-selective — its ppl column on the
    # output gives the threshold that makes pass 2's filter fractional
    out1 = str(tmp_path / "corpus_p1")
    r1 = prepare_corpus(
        spark, src, out1, drop_low_quality=True, lm_ppl_max=1e18,
        dsir_target=f"{src}/documents.parquet", dsir_keep_frac=0.5,
        dsir_buckets=256,
    )
    assert 0 < r1["gopher_pass"] < r1["after_exact_dedup"]
    assert r1["lines_removed"] > 0
    clean1 = spark.read.parquet(f"{out1}/clean_docs.parquet")
    ppl_med = clean1.approxQuantile("ppl", [0.5], 0.01)[0]
    assert ppl_med is not None and ppl_med > 0

    out2 = str(tmp_path / "corpus_p2")
    r2 = prepare_corpus(
        spark, src, out2, drop_low_quality=True, lm_ppl_max=ppl_med,
        dsir_target=f"{src}/documents.parquet", dsir_keep_frac=0.5,
        dsir_buckets=256,
    )
    by_name = {s["stage"]: s for s in r2["stages"]}
    # exact_dedup's fractional selection comes from the BASE corpus's
    # duplicate clusters (sf0.1-derived dirs have them, sf0.01 has no
    # exact dups) — the committed-record assertion above pins it; here
    # we pin the four gates the PLANTING itself provides
    for gate in ("quality_drop", "lm_perplexity_filter",
                 "dsir_select", "lsh_component_dedup"):
        sel = by_name[gate]["selectivity"]
        assert sel is not None and 0 < sel < 1, f"{gate}: {sel}"
    assert by_name["line_dedup"]["lines_removed"] > 0
    assert r2["output_docs"] > 0 and r2["output_chunks"] > 0


def _lm_test_corpus(spark):
    """20 docs sharing bigram structure + 1 gibberish doc of unique
    tokens: under a self-trained bigram LM the structured docs score
    low perplexity, the gibberish doc's singleton bigrams score near
    the smoothing floor (high ppl) — a deterministic separation."""
    rows = [
        (i, f"the cat number {i} sat on the mat and the cat looked at the dog", "en")
        for i in range(20)
    ]
    rows.append((99, "zxq qwv plm wok jxr vbn ytr mnb uio qaz", "en"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")

def test_prepare_corpus_lm_perplexity_filter(spark, tmp_path):
    """Stage 3b (--lm-ppl-max): the self-trained bigram LM drops the
    high-perplexity doc, keeps the rest, reports both counts, and the
    ppl column rides on the output."""
    from hogzilla_spark.operators.text import lm_cross_entropy, perplexity_col

    docs = _lm_test_corpus(spark)
    src = str(tmp_path / "src")
    docs.write.parquet(f"{src}/documents.parquet")

    # derive a robust threshold from the operator itself: midpoint
    # between the worst structured doc and the gibberish doc
    ppl = {
        r.doc_id: r.ppl
        for r in lm_cross_entropy(docs)
        .select("doc_id", perplexity_col().alias("ppl"))
        .collect()
    }
    worst_normal = max(v for k, v in ppl.items() if k != 99)
    assert ppl[99] > worst_normal * 1.5, (ppl[99], worst_normal)
    threshold = (worst_normal + ppl[99]) / 2

    out = str(tmp_path / "corpus_lm")
    report = prepare_corpus(spark, src, out, lm_ppl_max=threshold)
    # stage 3b: all 21 docs scored, exactly the gibberish doc dropped
    assert report["lm_scored"] == 21
    assert report["after_lm_filter"] == 20
    clean = spark.read.parquet(f"{out}/clean_docs.parquet")
    assert "ppl" in clean.columns
    ids = {r.doc_id for r in clean.select("doc_id").collect()}
    # stage 4 (near-dup) legitimately collapses the deliberately-similar
    # structured docs further; the LM stage's work is that 99 is gone
    # and no survivor exceeds the threshold
    assert 99 not in ids and ids <= set(range(20)) and ids
    assert clean.filter(F.col("ppl") > threshold).count() == 0

def test_prepare_corpus_dsir_selection(spark, tmp_path):
    """Stage 3c (--dsir-target): importance resampling against a target
    corpus keeps the requested fraction, preferring target-like docs;
    the logw_micro weight rides on the output."""
    # alien docs are LONG (19 all-unseen grams ≈ −13 nats vs the alpha
    # family's ≈ −4.5): the gap dwarfs the ±3-nat Gumbel noise, so the
    # selection is exactly the alpha family
    rows = [
        (i, f"alpha beta gamma delta run {i}", "en") for i in range(10)
    ] + [
        (
            100 + i,
            " ".join(f"{p}{i}" for p in
                     ["zz", "qq", "ww", "xx", "yy", "vv", "uu", "tt", "ss", "rr"]),
            "xx",
        )
        for i in range(10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    src = str(tmp_path / "src")
    docs.write.parquet(f"{src}/documents.parquet")

    # 10 target docs: per-gram target count 10 vs raw count 10 gives
    # shared grams λ = ln((R+αm)/(T+αm)) > 0 while unseen grams score
    # ln(0.5(R+αm)/1.5(T+αm)) < 0 — a real separation (3 target docs
    # would make BOTH ratios exactly 1:3 and the weights pure length)
    target = spark.createDataFrame(
        [(1000 + i, "alpha beta gamma delta epsilon") for i in range(10)],
        "doc_id long, text string",
    )
    tgt_path = str(tmp_path / "target.parquet")
    target.write.parquet(tgt_path)

    out = str(tmp_path / "corpus_dsir")
    # dsir_buckets small: the default's buckets/2 smoothing mass would
    # swamp this 20-doc corpus's ~200 real gram counts and degrade the
    # weights to a length penalty (the degeneration the docstring warns
    # about — observed, not hypothetical)
    report = prepare_corpus(
        spark, src, out, dsir_target=tgt_path, dsir_keep_frac=0.5,
        dsir_buckets=256,
    )
    # 20 in, no exact dups, keep round(0.5*20)=10
    assert report["after_exact_dedup"] == 20
    assert report["after_dsir_select"] == 10
    clean = spark.read.parquet(f"{out}/clean_docs.parquet")
    assert "logw_micro" in clean.columns
    ids = {r.doc_id for r in clean.select("doc_id").collect()}
    # stage 4 (near-dup) legitimately collapses the deliberately-similar
    # alpha docs further; the DSIR stage's work is that every zz doc is
    # gone and only target-like docs remain
    assert ids and ids <= set(range(10)), ids

def test_corpus_ingest_stream_lm_filter(spark, tmp_path):
    """Streaming twin of stage 3b: a model trained once on a reference
    corpus scores every micro-batch; the gibberish doc is dropped at
    ingest, survivors carry ppl."""
    from hogzilla_spark.operators.text import lm_score, lm_train, perplexity_col

    ref = _lm_test_corpus(spark).filter("doc_id < 20")
    model = lm_train(ref)

    input_dir = str(tmp_path / "in_lm")
    out_dir = str(tmp_path / "out_lm")
    ckpt = str(tmp_path / "ckpt_lm")
    schema = "doc_id long, text string, ts timestamp"
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    batch = spark.createDataFrame(
        [
            (1, "the cat number one sat on the mat and the cat looked", t0),
            (2, "zxq qwv plm wok jxr vbn ytr mnb uio qaz", t0),
        ],
        schema,
    )
    batch.coalesce(1).write.mode("append").parquet(input_dir)

    # threshold from the operator itself: midpoint between the in-model
    # doc and the gibberish doc (the floor tracks vocab size, so a
    # fixed literal would be corpus-fragile)
    ppl = {
        r.doc_id: r.ppl
        for r in lm_score(batch, model)
        .select("doc_id", perplexity_col().alias("ppl"))
        .collect()
    }
    assert ppl[2] > ppl[1] * 1.5, ppl
    threshold = (ppl[1] + ppl[2]) / 2

    qs = corpus_ingest_stream(
        spark.readStream.schema(schema).parquet(input_dir),
        out_dir, ckpt, available_now=True,
        lm_model=model, lm_ppl_max=threshold,
    )
    for q in qs:
        q.awaitTermination(120)
    clean = spark.read.parquet(f"{out_dir}/clean_docs.parquet")
    assert "ppl" in clean.columns
    rows = {r.doc_id: r.ppl for r in clean.collect()}
    assert set(rows) == {1}
    assert rows[1] is not None and rows[1] == ppl[1]

    # misuse guard: the drop rule without a model is a fail-fast error
    import pytest

    with pytest.raises(ValueError, match="lm_model"):
        corpus_ingest_stream(
            spark.readStream.schema(schema).parquet(input_dir),
            out_dir, ckpt, lm_ppl_max=1.0,
        )

def test_corpus_ingest_stream_dsir_filter(spark, tmp_path):
    """Streaming twin of stage 3c: a log-ratio table fit once offline
    weights every micro-batch; below-threshold and weightless docs are
    dropped at ingest, survivors carry logw_micro."""
    from hogzilla_spark.operators.sampling import dsir_log_ratio, dsir_weights

    target = spark.createDataFrame(
        [(1000 + i, "alpha beta gamma delta epsilon") for i in range(10)],
        "doc_id long, text string",
    )
    pool = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(10)]
        + [(100 + i, "zz qq ww xx yy vv uu tt ss rr") for i in range(10)],
        "doc_id long, text string",
    )
    lam = dsir_log_ratio(target, pool, n_buckets=256)

    input_dir = str(tmp_path / "in_dsir")
    out_dir = str(tmp_path / "out_dsir")
    ckpt = str(tmp_path / "ckpt_dsir")
    schema = "doc_id long, text string, ts timestamp"
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    batch = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", t0),       # target-like
            (2, "zz qq ww xx yy vv uu tt ss rr", t0),  # alien
            (3, "", t0),                              # weightless
        ],
        schema,
    )
    batch.coalesce(1).write.mode("append").parquet(input_dir)

    # threshold from the operator itself: midpoint between the two
    # weight families (fixed literals would be smoothing-fragile)
    w = {
        r.doc_id: r.logw_micro
        for r in dsir_weights(
            batch.select("doc_id", "text"), lam, n_buckets=256
        ).collect()
    }
    assert w[1] > w[2], w
    threshold = (w[1] + w[2]) // 2

    qs = corpus_ingest_stream(
        spark.readStream.schema(schema).parquet(input_dir),
        out_dir, ckpt, available_now=True,
        dsir_log_ratio=lam, dsir_min_logw=threshold, dsir_buckets=256,
    )
    for q in qs:
        q.awaitTermination(120)
    clean = spark.read.parquet(f"{out_dir}/clean_docs.parquet")
    assert "logw_micro" in clean.columns
    rows = {r.doc_id: r.logw_micro for r in clean.collect()}
    assert set(rows) == {1}
    assert rows[1] == w[1]

    # misuse guard: the drop rule without a fitted table fails fast
    import pytest

    with pytest.raises(ValueError, match="dsir_log_ratio"):
        corpus_ingest_stream(
            spark.readStream.schema(schema).parquet(input_dir),
            out_dir, ckpt, dsir_min_logw=0,
        )

def test_corpus_ingest_stream_end_to_end(spark, tmp_path):
    """Streaming twin: exact dups are dropped ACROSS micro-batches, a
    near-dup arriving later pairs against the band index, quality
    signals ride on every surviving doc, and a restart with no new
    input emits nothing (checkpointed state, no replay)."""
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string, ts timestamp"
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep green forest tonight")

    def drain():
        qs = corpus_ingest_stream(
            spark.readStream.schema(schema).parquet(input_dir),
            out_dir, ckpt, available_now=True,
        )
        for q in qs:
            q.awaitTermination(120)

    spark.createDataFrame(
        [(1, base, t0),
         (2, "completely unrelated words about databases and joins", t0)],
        schema,
    ).coalesce(1).write.mode("append").parquet(input_dir)
    drain()

    clean = spark.read.parquet(f"{out_dir}/clean_docs.parquet")
    assert {r.doc_id for r in clean.collect()} == {1, 2}
    assert {"fp", "n_tok", "gopher_pass"} <= set(clean.columns)

    # batch 2: exact dup of doc 1 (cross-batch drop) + a near-dup of it
    spark.createDataFrame(
        [(3, base, t0 + dt.timedelta(minutes=1)),
         (4, base.replace("tonight", "today"), t0 + dt.timedelta(minutes=1))],
        schema,
    ).coalesce(1).write.mode("append").parquet(input_dir)
    drain()

    clean = spark.read.parquet(f"{out_dir}/clean_docs.parquet")
    assert {r.doc_id for r in clean.collect()} == {1, 2, 4}  # 3 = exact dup
    n_tok = {r.doc_id: r.n_tok for r in clean.collect()}
    assert n_tok[1] == len(base.split())

    cands = {
        (r.id_a, r.id_b)
        for r in spark.read.parquet(
            f"{out_dir}/neardup_candidates.parquet"
        ).collect()
    }
    # doc 3 (identical) and doc 4 (near-dup) both pair against doc 1
    assert (1, 4) in cands and (1, 3) in cands

    # restart with no new input: checkpoints replay nothing
    before = (
        spark.read.parquet(f"{out_dir}/clean_docs.parquet").count(),
        spark.read.parquet(f"{out_dir}/neardup_candidates.parquet").count(),
    )
    drain()
    after = (
        spark.read.parquet(f"{out_dir}/clean_docs.parquet").count(),
        spark.read.parquet(f"{out_dir}/neardup_candidates.parquet").count(),
    )
    assert before == after
