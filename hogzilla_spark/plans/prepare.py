"""Retention purge (SURVEY.md S16; HogPrepare.scala:48-305).

Reference semantics:
  - flows: delete rows older than 100 time-units entirely; in the
    window (100 units ago, 1 unit ago) also delete rows WITHOUT a
    Snort priority-1 event (the NOT_EQUAL column filter, :117-126);
  - sflows / authrecords: delete rows older than 1 unit;
  - time unit = 21600000 ms (6 h).

The reference parallelizes deletes driver-side over 4-5 hand-cut time
slices (.par, :87-109).  The engine expresses the SAME retention as one
keep-predicate per table: on Delta this is a partition-pruned
``DELETE FROM``; on plain parquet a filtered rewrite.  Spark's own
parallelism replaces the hand slicing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TIME_UNIT_MS = 21_600_000  # 6 h

def flows_keep_predicate(
    now_ms: int, ts_col: str = "first_seen", unit_ms: int = TIME_UNIT_MS
) -> Column:
    """Keep: newer than 1 unit, OR (newer than 100 units AND has a
    priority-1 Snort event)."""
    ts = F.col(ts_col)
    recent = ts >= F.lit(now_ms - unit_ms)
    kept_window = (ts >= F.lit(now_ms - 100 * unit_ms)) & (
        F.col("event_priority_id") == "1"
    )
    return recent | kept_window

def stream_keep_predicate(
    now_s: int, ts_col: str = "timestamp", unit_s: int = TIME_UNIT_MS // 1000
) -> Column:
    """sflows/auth retention: keep only the last unit."""
    return F.col(ts_col) >= F.lit(now_s - unit_s)

def purge_flows(flows: DataFrame, now_ms: int, unit_ms: int = TIME_UNIT_MS) -> DataFrame:
    return flows.filter(flows_keep_predicate(now_ms, unit_ms=unit_ms))

def purge_sflows(sflows: DataFrame, now_s: int, unit_s: int = TIME_UNIT_MS // 1000) -> DataFrame:
    return sflows.filter(stream_keep_predicate(now_s, unit_s=unit_s))

def purge_parquet_table(
    spark, path: str, keep: Column, ts_partition_col: str | None = None
) -> None:
    """Filtered rewrite for plain parquet (staged write-swap).  With a
    date-partitioned table, Catalyst prunes untouched partitions from
    the scan; a Delta deployment would run DELETE FROM instead."""
    import os
    import shutil
    import uuid

    df = spark.read.parquet(path).filter(keep)
    staging = f"{path}.staging-{uuid.uuid4().hex[:8]}"
    writer = df.write.mode("overwrite")
    if ts_partition_col:
        writer = writer.partitionBy(ts_partition_col)
    writer.parquet(staging)
    shutil.rmtree(path)
    os.rename(staging, path)
