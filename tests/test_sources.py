"""Physical-layout tests: partition pruning and shuffle-free bucketed
joins — the storage half of the 100 TB story."""

import io
import contextlib

import pyspark.sql.functions as F

from hogzilla_spark.sources import catalog

def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()

def test_time_partitioned_write_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", 1_700_000_000), ("b", 1_700_000_000 + 5 * 86400)],
        "k string, timestamp long",
    )
    path = str(tmp_path / "ts_table")
    catalog.write_time_partitioned(df, path)
    back = spark.read.parquet(path)
    one_day = back.filter(F.col("__day") == "2023-11-14")
    assert [r.k for r in one_day.collect()] == ["a"]
    # partition filter appears in the scan, not as a post-filter
    plan = _plan(one_day)
    assert "PartitionFilters" in plan and "__day" in plan

def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # (spark.sql.warehouse.dir is static config — tables land in the
    # default ./spark-warehouse, dropped afterwards and git-ignored)
    left = spark.range(1000).select(
        F.concat(F.lit("10.1.0."), (F.col("id") % 100).cast("string")).alias("myIP"),
        (F.col("id") * 7).alias("bytes"),
    )
    right = spark.range(100).select(
        F.concat(F.lit("10.1.0."), (F.col("id") % 100).cast("string")).alias("myIP"),
        F.col("id").alias("risk"),
    )
    catalog.write_bucketed(left, "t_flows_bucketed", "myIP", num_buckets=8)
    catalog.write_bucketed(right, "t_state_bucketed", "myIP", num_buckets=8)
    l = spark.table("t_flows_bucketed")
    r = spark.table("t_state_bucketed")
    # disable broadcast so the join strategy decision is about bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = l.join(r, "myIP")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        # co-located buckets: no Exchange feeds the join
        assert "Exchange" not in plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS t_flows_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_state_bucketed")

def test_schema_enforced_read(spark, tmp_path):
    from hogzilla_spark import datagen

    path = str(tmp_path / "mynets")
    datagen.mynets_df(spark).write.parquet(path)
    back = catalog.read_table(spark, path, "mynets")
    assert back.schema["prefix"].dataType.typeName() == "string"
    assert [r.prefix for r in back.collect()] == ["10.1."]
