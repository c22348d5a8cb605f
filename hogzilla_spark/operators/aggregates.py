"""Aggregation operators (SURVEY.md §2.4 A3-A12).

Each helper returns a DataFrame plan; Catalyst compiles them to
partial+final hash aggregates (map-side combine for free).  At 100 TB
the two-level rollups deliberately re-key on a subset of the previous
key so the second shuffle moves only pre-aggregated rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def two_level_rollup(
    df: DataFrame,
    level1_keys: list[str],
    level2_keys: list[str],
    aggs: dict[str, Column],
    pair_count_col: str = "pairs",
) -> DataFrame:
    """A3: per-pair rollup then per-host pair count.

    Level 1 groups by ``level1_keys`` summing the metrics; level 2
    re-keys on ``level2_keys`` (a subset) and additionally counts the
    level-1 groups — the reference's "sum of 1L per pair" idiom
    (HogSFlow.scala:1162-1187).
    """
    lvl1 = df.groupBy(*level1_keys).agg(*[c.alias(n) for n, c in aggs.items()])
    lvl2_aggs = [F.sum(n).alias(n) for n in aggs] + [
        F.count(F.lit(1)).alias(pair_count_col)
    ]
    return lvl1.groupBy(*level2_keys).agg(*lvl2_aggs)

def distinct_count_per_group(
    df: DataFrame, keys: list[str], value_col: str, out_col: str = "n_distinct"
) -> DataFrame:
    """A5: countDistinct per group (distinct ports per host etc.)."""
    return df.groupBy(*keys).agg(F.countDistinct(value_col).alias(out_col))

def global_stats(df: DataFrame, value_col: str) -> DataFrame:
    """A7: StatCounter equivalent — count/mean/population-stdev/max/min.
    (RDD.stats() stdev is population stdev; we keep that.)"""
    return df.agg(
        F.count(value_col).alias("n"),
        F.avg(value_col).alias("mean"),
        F.stddev_pop(value_col).alias("stdev"),
        F.min(value_col).alias("min"),
        F.max(value_col).alias("max"),
    )

def sum_and_sumsq(df: DataFrame, cols: list[str]) -> DataFrame:
    """A8: column-wise Σx and Σx² in one pass (z-score prep,
    HogDNS.scala:169-183)."""
    exprs = []
    for c in cols:
        exprs.append(F.sum(F.col(c)).alias(f"sum_{c}"))
        exprs.append(F.sum(F.col(c) * F.col(c)).alias(f"sumsq_{c}"))
    return df.agg(*exprs)

def flow_set(
    df: DataFrame, keys: list[str], fields: list[str], order_field: str, limit: int
) -> DataFrame:
    """A4 + O3: per-group bounded flow-set for alert rendering.  The
    struct puts the ordering field first so array_sort gives the
    deterministic total order SURVEY §4 item 5 requires."""
    struct = F.struct(F.col(order_field), *[F.col(f) for f in fields if f != order_field])
    return df.groupBy(*keys).agg(
        F.slice(F.reverse(F.array_sort(F.collect_list(struct))), 1, limit).alias("flows")
    )
