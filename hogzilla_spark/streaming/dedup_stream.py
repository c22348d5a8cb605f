"""Streaming exact deduplication of a document stream.

Training-data ingest rarely sees a corpus at rest: documents arrive
continuously (crawl frontier, log shippers), and the dedup decision has
to happen at ingest or the duplicate is already in object storage.
This operator keeps the FIRST arrival of each normalized-text
fingerprint — the same md5 fingerprint as the batch `dedup_exact`
(operators/dedup.py), so a batch backfill and the streaming path agree
on which document survives.

Spark-first shape: `dropDuplicatesWithinWatermark` on the fingerprint.
Structured Streaming shuffles each micro-batch by fingerprint and keeps
one state-store row per fingerprint (RocksDB provider at scale); the
watermark evicts rows once the horizon passes, so state is bounded by
arrival-rate × horizon — NOT by corpus size, which is what makes this
viable on an unbounded stream.  The tradeoff is explicit: a duplicate
arriving after the horizon is NOT caught (run the batch dedup as a
periodic sweep for those — the fingerprints match by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hogzilla_spark.operators.text import fingerprint

def dedup_stream(
    docs: DataFrame,
    watermark: str = "10 minutes",
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """First-arrival-wins streaming dedup on the exact-dedup fingerprint.

    `docs` must be a streaming DataFrame with an event-time column
    `ts_col`.  Returns the deduplicated stream with the fingerprint
    exposed as `fp` (downstream sinks often key on it).
    """
    return (
        docs.withColumn("fp", fingerprint(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )
