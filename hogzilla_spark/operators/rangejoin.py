"""Range join and hypertable (time-bucket) rollup.

range_join: left rows matched to right intervals (lo ≤ x < hi) by key.
A naive inequality join plans as BroadcastNestedLoopJoin — O(|L|·|R|).
The scale path bins the value domain: each interval explodes to the
bins it overlaps, the probe side computes its bin, and the join is an
EQUI-join on (key, bin) with a residual predicate.  Shuffle volume is
O(|L| + |R|·avg_bins) and Catalyst plans a hash join.

time_bucket rollup: TimescaleDB-style continuous aggregate — truncate
epochs to fixed-width buckets and aggregate per (bucket, dims...).
Pure groupBy (one shuffle); at scale the output is the materialized
rollup table that dashboards query instead of raw events.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    value_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int,
) -> DataFrame:
    """Inner join: left row × every right interval with
    lo ≤ value < hi on the same key.

    bin_width trades shuffle volume for fan-out: intervals explode to
    ceil(span/bin_width)+1 bins.  Pick ~ the median interval span.
    """
    lbin = (F.col(value_col) / bin_width).cast("long").alias("__bin")
    probe = left.withColumn("__bin", (F.col(value_col) / bin_width).cast("long"))
    n_bins = (
        (F.col(hi_col) / bin_width).cast("long")
        - (F.col(lo_col) / bin_width).cast("long")
    )
    build = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                (F.col(lo_col) / bin_width).cast("long"),
                (F.col(lo_col) / bin_width).cast("long") + n_bins,
            )
        ),
    )
    joined = probe.join(build, on=[*on, "__bin"])
    return joined.filter(
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    ).drop("__bin")

def time_bucket(ts_col: Column | str, width_s: int, epoch_unit: str = "s") -> Column:
    """Bucket start (epoch seconds) for a fixed-width time bucket —
    TimescaleDB time_bucket semantics (floor to width)."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    secs = c.cast("long")
    if epoch_unit == "ms":
        secs = (c.cast("long") / 1000).cast("long")
    return (secs - (secs % width_s)).alias("bucket_start")

def hypertable_rollup(
    df: DataFrame,
    ts_col: str,
    width_s: int,
    dims: list[str],
    aggs: dict[str, Column],
    epoch_unit: str = "s",
) -> DataFrame:
    """Continuous-aggregate rollup: (time bucket, dims...) → aggregates.
    The result is the hypertable's materialized view; incremental
    refresh at scale = run over the new time partition and append."""
    return (
        df.withColumn("bucket_start", time_bucket(ts_col, width_s, epoch_unit))
        .groupBy("bucket_start", *dims)
        .agg(*[v.alias(k) for k, v in aggs.items()])
    )
