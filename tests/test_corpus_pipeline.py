"""End-to-end corpus-preparation pipeline (plans/corpus.py): the
beyond-reference operators chained as one ingest run."""

from pyspark.sql import functions as F

from hogzilla_spark.plans.corpus import prepare_corpus

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
