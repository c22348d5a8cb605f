"""r12: mk_alert builds its projection from SQL text (one parsed
selectExpr) instead of ~1,700 py4j round trips of Column calls.  The
SQL twins must be VALUE-identical to the Column reference forms on the
full sentinel/edge grid, and mk_alert's rows must match the old
fully-Column construction exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hogzilla_spark.detectors.base import SIGNATURES, mk_alert
from hogzilla_spark.functions.scalar import (
    human_bytes,
    human_bytes_sql,
    ip_to_bytes,
    ip_to_bytes_sql,
    sql_quote,
)


def test_ip_to_bytes_sql_twin_matches_column_form(spark):
    vals = [
        "1.2.3.4",
        "10.1.0.39",
        "255.255.255.255",
        "0.0.0.0",
        "999.999.999.999",  # rlike passes; conv/lpad path (lpad truncates)
        "01.002.3.4",
        "a:b::c:d",
        "::1",
        "not-an-ip",
        "1.2.3",
        "1.2.3.4.5",
        "",
        None,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "ip string")
    rows = df.select(
        ip_to_bytes(F.col("ip")).alias("col_form"),
        F.expr(ip_to_bytes_sql("ip")).alias("sql_form"),
    ).collect()
    assert rows  # non-vacuous
    for r in rows:
        assert r.col_form == r.sql_form, r


def test_human_bytes_sql_twin_matches_column_form(spark):
    vals = [
        0.0,
        1.0,
        1023.0,
        1024.0,
        1024.5,
        1536.0,
        1024.0**2,
        1024.0**3 * 1.5,
        1024.0**5,
        1024.0**6,  # beyond the unit table: least() caps at P
        1e18,
        123456789.0,
        None,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "b double")
    rows = df.select(
        human_bytes(F.col("b")).alias("col_form"),
        F.expr(human_bytes_sql("b")).alias("sql_form"),
    ).collect()
    assert rows
    for r in rows:
        assert r.col_form == r.sql_form, r


def _mk_alert_column_reference(
    df: DataFrame,
    sig,
    lower_ip: Column,
    upper_ip: Column,
    title: Column,
    data: dict[str, Column],
    batch_time: int = 0,
) -> DataFrame:
    """The pre-r12 fully-Column mk_alert, kept verbatim as the
    semantic reference the SQL-built form must reproduce."""
    entries = []
    note_parts: list[Column] = [
        F.lit(
            "This IP was detected by Hogzilla performing an abnormal "
            "activity. In what follows, you can see more information.\n"
            "Abnormal behaviour: "
        ),
        title,
    ]
    for k, v in data.items():
        entries.append(F.lit(k))
        entries.append(v.cast("string"))
        rendered = (
            human_bytes(v.cast("double"))
            if k.lower().startswith("bytes")
            else v.cast("string")
        )
        note_parts.append(F.lit(f"\n{k}: "))
        note_parts.append(F.coalesce(rendered, F.lit("")))
    return df.select(
        F.lit(sig.sig_id).alias("signature_id"),
        F.lit(batch_time).cast("long").alias("time"),
        ip_to_bytes(lower_ip).alias("lower_ip"),
        ip_to_bytes(upper_ip).alias("upper_ip"),
        lower_ip.cast("string").alias("lower_ip_str"),
        upper_ip.cast("string").alias("upper_ip_str"),
        title.alias("title"),
        F.create_map(*entries).alias("data")
        if entries
        else F.create_map().alias("data"),
        F.concat(*note_parts).alias("note"),
    )


@pytest.mark.parametrize("with_data", [True, False])
def test_mk_alert_sql_build_matches_column_reference(spark, with_data):
    df = spark.createDataFrame(
        [
            ("10.1.2.3", "8.9.0.1", 1_500_000, 42, None),
            ("a:b::c:d", "bogus", 0, None, 7),
            (None, "7.7.7.7", 2**40, 3, 3),
        ],
        "myIP string, alienIP string, up long, conns int, pkts int",
    )
    sig = SIGNATURES["udp_amplifier"]
    kwargs = dict(
        sig=sig,
        lower_ip=F.col("myIP"),
        upper_ip=F.lit("255.255.255.255"),
        title=F.lit("HZ: UDP amplifier (DDoS)"),
        data=(
            {
                "hostname": F.col("myIP"),
                "bytesUp": F.col("up"),
                "connections": F.col("conns"),
                "numberPkts": F.col("pkts"),
            }
            if with_data
            else {}
        ),
        batch_time=21600,
    )
    got = mk_alert(df, **kwargs)
    ref = _mk_alert_column_reference(df, **kwargs)
    assert got.schema == ref.schema
    g = sorted(map(repr, got.collect()))
    r = sorted(map(repr, ref.collect()))
    assert g == r
    assert g  # non-vacuous


def test_ua_family_sql_twin_matches_column_form(spark):
    """The 171-rule nested-CASE text twin must reproduce ua_family
    exactly on the vendored uap-core-style vectors (regex literals
    survive SQL quoting) plus null/empty/exotic strings."""
    import importlib.util

    from hogzilla_spark.functions.scalar import ua_family, ua_family_sql

    spec = importlib.util.spec_from_file_location(
        "_test_auth_mod", "/root/repo/tests/test_auth.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    vals = [ua for ua, _ in mod._UA_FIXTURE] + [
        None,
        "",
        "quote ' backslash \\ in UA",
        "Mozilla/5.0 (Windows NT 10.0) Chrome/120.0 Safari/537.36",
        "curl/7.79.1",
        "random text",
    ]
    df = spark.createDataFrame([(v,) for v in vals], "ua string")
    rows = df.select(
        ua_family(F.col("ua")).alias("col_form"),
        F.expr(ua_family_sql("ua")).alias("sql_form"),
    ).collect()
    assert len(rows) == len(vals)
    for r in rows:
        assert r.col_form == r.sql_form, r


def test_sql_quote_roundtrips_specials(spark):
    for s in ["plain", "a'b", "back\\slash", "line\nbreak", "'; DROP--"]:
        got = spark.range(1).select(F.expr(sql_quote(s))).collect()[0][0]
        assert got == s
