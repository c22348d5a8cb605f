"""Unit tests for the scalar function library (SURVEY.md §2.8)."""

import pyspark.sql.functions as F
import pytest

from hogzilla_spark.functions import scalar as S

def one(spark, expr, **cols):
    schema = ", ".join(f"{k} string" for k in cols)
    df = spark.createDataFrame([tuple(cols.values())], schema)
    return df.select(expr.alias("x")).collect()[0].x

def test_ip_to_bytes_sentinels(spark):
    # HogEvent.scala:44-58: v4 → 4 bytes, v6 → 255.255.6.6, bogus → 255.255.1.1
    df = spark.createDataFrame(
        [("10.1.2.3",), ("fe80::1",), ("garbage",)], "ip string"
    )
    got = [r.h for r in df.select(F.hex(S.ip_to_bytes("ip")).alias("h")).collect()]
    assert got == ["0A010203", "FFFF0606", "FFFF0101"]

def test_ip_significant_network(spark):
    assert one(spark, S.ip_significant_network("ip"), ip="10.1.2.3") == "10.1.2."
    assert one(spark, S.ip_significant_network("ip"), ip="a:b::c:d") == "a:b::c:"
    assert one(spark, S.ip_significant_network("ip"), ip="weird") == "weird"

def test_is_my_ip_prefix_semantics(spark):
    # HogSFlow.scala:725-731 — string-prefix, not CIDR
    df = spark.createDataFrame([("10.1.5.9",), ("10.10.1.1",), ("8.8.8.8",)], "ip string")
    got = [r.m for r in df.select(S.is_my_ip("ip", ["10.1."]).alias("m")).collect()]
    assert got == [True, False, False]

def test_log_bin(spark):
    import math

    assert one(spark, S.log_bin(F.col("x").cast("double")), x="1000") == math.floor(
        math.log(1001.0)
    )

def test_haversine_known_distance(spark):
    # São Paulo ↔ Rio ≈ 357.8 km
    d = one(
        spark,
        S.haversine_from_coords("a", "b"),
        a="-23.55,-46.63",
        b="-22.90,-43.20",
    )
    assert d == pytest.approx(357.85, abs=0.5)

def test_haversine_error_sentinel(spark):
    # HogGeograph.scala:55-57 — parse error → 999999999
    d = one(spark, S.haversine_from_coords("a", "b"), a="junk", b="0,0")
    assert d == 999999999.0

def test_human_bytes(spark):
    df = spark.createDataFrame([(512.0,), (1536.0,), (1.5e9,)], "b double")
    got = [r.h for r in df.select(S.human_bytes("b").alias("h")).collect()]
    assert got == ["512.0b", "1.5K", "1.4G"]

def test_strip_accents(spark):
    assert (
        one(spark, S.strip_accents(F.col("s")), s="São Paulo é ótima")
        == "Sao Paulo e otima"
    )

def test_parse_long_default(spark):
    assert one(spark, S.parse_long("x", -1), x="42") == 42
    assert one(spark, S.parse_long("x", -1), x="nope") == -1

def test_location_label(spark):
    got = one(
        spark,
        S.location_label(F.lit(""), F.lit("SP"), F.lit("BR")),
        dummy="x",
    )
    assert got == "N/A/SP/BR"
