"""Continuous auth profiling as Structured Streaming (SURVEY.md S17).

The reference polls HBase every 10 s and DELETES each consumed row
(HogzillaContinuous.scala:53-58, HogAuth.scala:307-308) — destructive
at-most-once reads.  The engine replaces that with a streaming source +
checkpoint: exactly-once batch tracking, no destructive reads, same
10-second micro-batch cadence via processingTime trigger.

Each micro-batch runs the same auth_profile plan as the batch path and
MERGEs state via foreachBatch — the Spark-idiomatic shape of the
reference's read-score-merge loop.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from hogzilla_spark.config import DEFAULT, EngineConfig
from hogzilla_spark.detectors.auth import auth_profile
from hogzilla_spark.schemas import AUTHRECORDS
from hogzilla_spark.state import store

def start_auth_stream(
    spark: SparkSession,
    input_dir: str,
    state_path: str,
    alerts_dir: str,
    checkpoint_dir: str,
    cfg: EngineConfig = DEFAULT,
    trigger: dict | None = None,
    ua_probe_every: int = 10,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """File-source streaming: drop auth-record parquet/json files into
    input_dir; each micro-batch scores against saved state, appends
    alerts, and merges the per-user histograms.

    trigger: e.g. {"processingTime": "10 seconds"} (reference cadence) or
    {"availableNow": True} for drain-and-stop (tests).

    Replay-idempotent: foreachBatch is at-least-once, so a crash
    between the state commit and the checkpoint commit re-delivers the
    batch on restart.  The last-applied batch id travels inside the
    state store's atomic pointer swap (store.save(batch_id=...)) and
    replayed batches are skipped; alerts land under a per-batch
    ``batch_id=<n>`` path with overwrite, so a replay that DID lose the
    state commit rewrites the same alert files instead of appending
    duplicates.  One state_path pairs with one checkpoint_dir (batch
    ids are monotonic per checkpoint).

    UA-cardinality probe caching: `prepare_auth`'s dictionary-join gate
    needs a distinct-UA estimate; probing every micro-batch is a full
    extra pass over the (persisted) batch.  Login streams' UA mix is
    stable, so the HLL estimate is probed on the first processed batch
    and then every `ua_probe_every`-th, carried in between
    (`ua_probe_every=1` restores per-batch probing).  Staleness is
    bounded: a UA-fuzzing storm can at worst win `ua_probe_every - 1`
    batches of a too-eager broadcast before the next probe flips the
    gate; each batch is persisted, so the micro-batch dictionary stays
    batch-sized either way.
    """
    reader = spark.readStream.schema(AUTHRECORDS)
    if max_files_per_trigger is not None:
        # pins micro-batch granularity (one source file ≈ one batch) —
        # rate limiting in production, deterministic batch counts in
        # the throughput harness
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    probe = {"n_ua": None, "since": 0}

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        last = store.last_applied_batch(state_path)
        if last is not None and batch_id <= last:
            return  # replay of an already-committed batch
        if batch_df.isEmpty():
            return
        # persist: the gate probe (when due), the dictionary build, the
        # alert scoring, and the three histogram updates all re-read
        # this frame — and a re-scan of a non-deterministic source
        # could otherwise observe different data per consumer
        batch_df = batch_df.persist()
        if probe["n_ua"] is None or probe["since"] + 1 >= ua_probe_every:
            from pyspark.sql import functions as F

            probe["n_ua"] = batch_df.agg(
                F.approx_count_distinct(F.coalesce("userAgent", F.lit("")))
            ).first()[0]
            probe["since"] = 0
        else:
            probe["since"] += 1
        saved = store.load(spark, state_path).persist()
        alerts, updates = auth_profile(
            batch_df, saved, cfg.auth, cfg.hist, batch_time=batch_id,
            ua_count_hint=probe["n_ua"],
        )
        alerts.write.mode("overwrite").parquet(
            os.path.join(alerts_dir, f"batch_id={batch_id}")
        )
        store.save(
            store.apply_updates(saved, updates), state_path, batch_id=batch_id
        )
        saved.unpersist()
        batch_df.unpersist()

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    writer = writer.trigger(**(trigger or {"processingTime": "10 seconds"}))
    return writer.start()

def wordcount(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """A13: running word counts over a line stream — the reference's
    streaming aggregation (HogzillaStream.scala:56-63).  Works on any
    line-shaped streaming OR batch DataFrame; on a stream the groupBy
    keeps running counts in the state store (update/complete mode)."""
    from pyspark.sql import functions as F

    return (
        lines.select(
            F.explode(
                F.filter(F.split(value_col, r"\s+"), lambda t: t != "")
            ).alias("word")
        )
        .groupBy("word")
        .count()
    )

def start_socket_wordcount(
    spark: SparkSession, host: str, port: int
) -> DataFrame:
    """S18 parity: the reference's skeleton socket word-count
    (HogzillaStream.scala:56-63) as Structured Streaming; returns the
    streaming DataFrame for the caller to sink."""
    lines = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    return wordcount(lines)

def start_file_wordcount(spark: SparkSession, input_dir: str) -> DataFrame:
    """A13 over a replayable file source (the production shape: exactly
    -once via checkpoint, unlike the at-most-once socket skeleton)."""
    return wordcount(spark.readStream.text(input_dir))
