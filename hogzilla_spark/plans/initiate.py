"""Engine initiation (S15; HogInitiate.scala:35-48): idempotent sensor
registration — the reference upserts (sensor_id, description, hostname)
at the start of every batch."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hogzilla_spark.schemas import SENSOR

def sensor_upsert(
    spark: SparkSession,
    existing: DataFrame | None,
    sensor_id: int,
    description: str,
    hostname: str,
) -> DataFrame:
    """Merge one sensor row into the sensor table (insert-or-replace on
    sensor_id) — Delta MERGE shape, expressed as anti-join + union."""
    new = spark.createDataFrame([(sensor_id, description, hostname)], SENSOR)
    if existing is None:
        return new
    kept = existing.join(new.select("sensor_id"), "sensor_id", "left_anti")
    return kept.unionByName(new)
