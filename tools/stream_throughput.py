"""Throughput-test the streaming corpus-prep pipeline at real rates.

Stages an sf directory's documents as N parquet chunk files, streams
them through `plans/corpus_stream.corpus_ingest_stream` one file per
micro-batch (availableNow drain), and prints ONE JSON line with
per-micro-batch latency and state-size series for both queries — the
evidence that the state-bounded design (fingerprint state = rate ×
watermark horizon; FIFO-capped band buckets) holds beyond toy batches.

Usage: python tools/stream_throughput.py [sf_dir] [n_chunks] [--lm] [--dsir]
  sf_dir    default /root/testdata/sf0.1
  n_chunks  default 20 (≈ docs/20 per micro-batch)
  --lm      also run the LM-perplexity ingest stage: train the bigram
            model ONCE on the staged corpus, score every micro-batch
            against it with a median-perplexity drop threshold — the
            per-batch cost of the r8 streaming LM wiring shows up in
            the clean query's latency series
  --dsir    also run the DSIR importance-weight ingest stage: fit the
            log-ratio table ONCE (target = every 10th doc, raw = the
            staged corpus), score every micro-batch against it with a
            median-weight drop threshold (unseen buckets smoothed) —
            the per-batch cost of the r9 streaming DSIR wiring
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")


def main() -> None:
    args = [a for a in sys.argv[1:] if a not in ("--lm", "--dsir")]
    with_lm = "--lm" in sys.argv[1:]
    with_dsir = "--dsir" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    n_chunks = int(args[1]) if len(args) > 1 else 20

    from pyspark.sql import functions as F

    from hogzilla_spark import get_spark
    from hogzilla_spark.plans.corpus_stream import corpus_ingest_stream

    spark = get_spark(app_name="stream_throughput")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="stream_tp_")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id",
            "text",
            # synthetic event time inside one watermark horizon so the
            # fingerprint state stays live for the whole drain — the
            # worst case for state size
            F.timestamp_seconds(F.lit(1_600_000_000) + F.col("doc_id") % 600).alias(
                "ts"
            ),
        )
        n_docs = docs.count()
        docs.repartition(n_chunks).write.parquet(f"{work}/staged")

        stream = (
            spark.readStream.schema("doc_id long, text string, ts timestamp")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{work}/staged")
        )
        lm_kwargs = {}
        lm_meta = {}
        if with_lm:
            from hogzilla_spark.operators.text import (
                lm_score,
                lm_train,
                perplexity_col,
            )

            model = lm_train(docs)
            # median self-perplexity as the drop line: a real threshold
            # that rejects a measurable tail, derived from the operator
            ppl_med = (
                lm_score(docs, model)
                .select(perplexity_col().alias("ppl"))
                .agg(F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY ppl)"))
                .first()[0]
            )
            lm_kwargs = {"lm_model": model, "lm_ppl_max": float(ppl_med)}
            lm_meta = {"lm_ppl_max": round(float(ppl_med), 3)}
        if with_dsir:
            from hogzilla_spark.operators.sampling import (
                dsir_log_ratio,
                dsir_weights,
            )

            raw = docs.select("doc_id", "text")
            lam = dsir_log_ratio(
                raw.filter(F.col("doc_id") % 10 == 0), raw
            )
            # median self-weight as the drop line: a real threshold that
            # rejects a measurable tail, derived from the operator itself
            logw_med = (
                dsir_weights(raw, lam)
                .agg(
                    F.expr(
                        "percentile_disc(0.5) WITHIN GROUP (ORDER BY logw_micro)"
                    )
                )
                .first()[0]
            )
            lm_kwargs.update(
                {"dsir_log_ratio": lam, "dsir_min_logw": int(logw_med)}
            )
            lm_meta["dsir_min_logw"] = int(logw_med)
        q_clean, q_cand = corpus_ingest_stream(
            stream,
            out_dir=f"{work}/out",
            ckpt_dir=f"{work}/ckpt",
            available_now=True,
            **lm_kwargs,
        )
        q_clean.awaitTermination()
        q_cand.awaitTermination()

        def series(q):
            out = []
            for p in q.recentProgress:
                st = (p.get("stateOperators") or [{}])[0]
                out.append(
                    {
                        "rows": p.get("numInputRows", 0),
                        "ms": (p.get("durationMs") or {}).get("triggerExecution"),
                        "state_rows": st.get("numRowsTotal"),
                    }
                )
            return [b for b in out if b["rows"]]

        clean_b, cand_b = series(q_clean), series(q_cand)
        clean_rows = spark.read.parquet(f"{work}/out/clean_docs.parquet").count()
        cand_rows = spark.read.parquet(
            f"{work}/out/neardup_candidates.parquet"
        ).count()

        def agg(bs):
            ms = [b["ms"] for b in bs if b["ms"]]
            rows = sum(b["rows"] for b in bs)
            return {
                "batches": len(bs),
                "rows": rows,
                "p50_ms": sorted(ms)[len(ms) // 2] if ms else None,
                "max_ms": max(ms) if ms else None,
                "rows_per_sec": round(rows / (sum(ms) / 1000.0), 1) if ms else None,
                "final_state_rows": bs[-1]["state_rows"] if bs else None,
                "batch_series": bs,
            }

        print(
            json.dumps(
                {
                    "metric": "corpus_stream_throughput",
                    "sf_dir": sf_dir,
                    **lm_meta,
                    "input_docs": n_docs,
                    "clean_docs": clean_rows,
                    "neardup_candidates": cand_rows,
                    "clean_query": agg(clean_b),
                    "candidate_query": agg(cand_b),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
