"""Histogram state store (S3/S7/S10): parquet-backed, batch-merged.

The reference does a per-entity HBase Get before scoring and a Put after
merging (HogHBaseHistogram.scala:75-136) — per-row RPCs inside foreach.
The engine's contract (SURVEY.md §4 custom-work item 1): scoring reads
are an equi-join against the saved state table, and writes are ONE
batched upsert per family per run.  On Delta this would be MERGE INTO;
on plain parquet we implement upsert as full-outer-join + staged
rewrite, which is the same shuffle shape.

Update modes:
  - "merge":     weighted mean + decay (Histograms.merge, H5)
  - "merge_max": pointwise max, sizes added (Histograms.mergeMax, H6)
  - "replace":   snapshot overwrite (the HIST02.1 path)
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hogzilla_spark.operators.histogram import (
    merge_histograms,
    merge_labels,
    merge_max,
    merged_size,
)
from hogzilla_spark.schemas import HISTOGRAMS

def EMPTY_MAP_D() -> "F.Column":
    """Typed empty map<string,double> (function: Columns need a live session)."""
    return F.map_from_arrays(F.array().cast("array<string>"), F.array().cast("array<double>"))

def EMPTY_MAP_S() -> "F.Column":
    return F.map_from_arrays(F.array().cast("array<string>"), F.array().cast("array<string>"))

def load(spark: SparkSession, path: str | None) -> DataFrame:
    if path and os.path.exists(path):
        return spark.read.schema(HISTOGRAMS).parquet(path)
    return spark.createDataFrame([], HISTOGRAMS)

def apply_updates(saved: DataFrame, updates: DataFrame) -> DataFrame:
    """One batched upsert: full-outer join saved ↔ batch updates on
    hist_name, merge per the row's mode.  updates columns:
    (hist_name, size, values, labels, mode)."""
    s = saved.select(
        F.col("hist_name"),
        F.col("size").alias("s_size"),
        F.col("values").alias("s_values"),
        F.col("labels").alias("s_labels"),
    )
    u = updates.select(
        F.col("hist_name"),
        F.col("size").alias("u_size"),
        F.col("values").alias("u_values"),
        F.coalesce(F.col("labels"), EMPTY_MAP_S()).alias("u_labels"),
        F.col("mode"),
    )
    j = s.join(u, "hist_name", "full_outer")
    both = j.filter(F.col("s_size").isNotNull() & F.col("u_size").isNotNull())
    only_saved = j.filter(F.col("u_size").isNull()).select(
        "hist_name",
        F.col("s_size").alias("size"),
        F.col("s_values").alias("values"),
        F.col("s_labels").alias("labels"),
    )
    only_new = j.filter(F.col("s_size").isNull()).select(
        "hist_name",
        F.col("u_size").alias("size"),
        F.col("u_values").alias("values"),
        F.col("u_labels").alias("labels"),
    )
    merged = both.select(
        "hist_name",
        F.when(F.col("mode") == "replace", F.col("u_size"))
        .when(F.col("mode") == "merge_max", F.col("s_size") + F.col("u_size"))
        .otherwise(merged_size("s_size", "u_size"))
        .alias("size"),
        F.when(F.col("mode") == "replace", F.col("u_values"))
        .when(F.col("mode") == "merge_max", merge_max("s_values", "u_values"))
        .otherwise(merge_histograms("s_values", "s_size", "u_values", "u_size"))
        .alias("values"),
        F.when(F.col("mode") == "replace", F.col("u_labels"))
        .otherwise(merge_labels("s_labels", "u_labels"))
        .alias("labels"),
    )
    return merged.unionByName(only_saved).unionByName(only_new)

def save(df: DataFrame, path: str) -> None:
    """Staged write-then-swap so the upsert can read the old files while
    computing the new ones (parquet has no MERGE; Delta would)."""
    staging = f"{path}.staging-{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(staging)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(staging, path)

def mk_update(
    df: DataFrame, family: str, entity_col: str, mode: str = "merge"
) -> DataFrame:
    """Shape a per-entity batch histogram (entity, size, values[, labels])
    into store update rows for one family."""
    labels = F.col("labels") if "labels" in df.columns else EMPTY_MAP_S()
    return df.select(
        F.concat(F.lit(family + "-"), F.col(entity_col)).alias("hist_name"),
        F.col("size").cast("long").alias("size"),
        F.col("values"),
        labels.alias("labels"),
        F.lit(mode).alias("mode"),
    )
