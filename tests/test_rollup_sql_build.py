"""r12: orient_flows / icmp_summary and the synth-sflow builders are
constructed from parsed SQL text (one selectExpr) instead of py4j-heavy
Column chains.  These tests keep the old Column builds verbatim as
reference twins and pin full row-identity on the real synth corpora.
(The round's plan audit additionally showed byte-identical physical
plans modulo expression/lambda ids for every consumer query.)"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import __spark_entry__ as E
from hogzilla_spark.operators.rollup import (
    LEFTRIGHT,
    OCCURRED,
    RIGHTLEFT,
    UNKNOWN,
    icmp_summary,
    orient_flows,
)
from hogzilla_spark.functions.scalar import (
    TCP_ACK,
    TCP_PSHACK,
    TCP_SYN,
    TCP_SYNACK,
    is_my_ip,
)

SF = "/root/testdata/sf0.001"


def _orient_flows_column_reference(sflows: DataFrame, my_nets) -> DataFrame:
    """Pre-r12 Column build of orient_flows, kept verbatim."""
    src_mine = is_my_ip("srcIP", my_nets)
    is_tcp = F.col("IPprotocol") == "6"
    flags = F.col("tcpFlags")
    direction = F.when(
        is_tcp,
        F.when(flags == TCP_SYN, F.lit(LEFTRIGHT))
        .when(flags == TCP_SYNACK, F.lit(RIGHTLEFT))
        .otherwise(
            F.when(F.col("srcPort").try_cast("int") < 1024, F.lit(RIGHTLEFT))
            .when(F.col("dstPort").try_cast("int") < 1024, F.lit(LEFTRIGHT))
            .otherwise(F.lit(UNKNOWN))
        ),
    ).otherwise(F.lit(UNKNOWN))
    status = F.when(
        is_tcp
        & (
            (flags == TCP_SYNACK)
            | (flags == TCP_PSHACK)
            | ((flags == TCP_ACK) & src_mine)
        ),
        F.lit(OCCURRED),
    ).otherwise(F.lit(UNKNOWN))
    proto = F.when(is_tcp, F.lit("TCP")).otherwise(F.lit("UDP"))
    return sflows.select(
        F.when(src_mine, F.col("srcIP")).otherwise(F.col("dstIP")).alias("myIP"),
        F.when(src_mine, F.col("srcPort")).otherwise(F.col("dstPort")).alias("myPort"),
        F.when(src_mine, F.col("dstIP")).otherwise(F.col("srcIP")).alias("alienIP"),
        F.when(src_mine, F.col("dstPort")).otherwise(F.col("srcPort")).alias("alienPort"),
        proto.alias("proto"),
        F.when(src_mine, F.col("packetSize")).otherwise(F.lit(0)).cast("long").alias("bytesUp"),
        F.when(src_mine, F.lit(0)).otherwise(F.col("packetSize")).cast("long").alias("bytesDown"),
        F.lit(1).cast("long").alias("numberPkts"),
        F.when(src_mine, direction).otherwise(-direction).alias("direction"),
        F.col("timestamp").alias("beginTime"),
        F.col("timestamp").alias("endTime"),
        F.col("IPprotocol"),
        F.col("samplingRate").alias("sampleRate"),
        status.alias("status"),
    )


def _icmp_projection_column_reference(sflows: DataFrame, my_nets) -> DataFrame:
    src_mine = is_my_ip("srcIP", my_nets)
    proto = F.when(F.col("IPprotocol") == "1", F.lit("ICMP")).otherwise(F.lit("ICMPv6"))
    return sflows.filter(F.col("IPprotocol").isin("1", "58")).select(
        F.when(src_mine, F.col("srcIP")).otherwise(F.col("dstIP")).alias("myIP"),
        F.when(src_mine, F.col("srcPort")).otherwise(F.col("dstPort")).alias("icmpType"),
        F.when(src_mine, F.col("dstIP")).otherwise(F.col("srcIP")).alias("alienIP"),
        F.when(src_mine, F.col("dstPort")).otherwise(F.col("srcPort")).alias("icmpCode"),
        proto.alias("proto"),
        F.when(src_mine, F.col("packetSize")).otherwise(F.lit(0)).cast("long").alias("bytesUp"),
        F.when(src_mine, F.lit(0)).otherwise(F.col("packetSize")).cast("long").alias("bytesDown"),
        F.lit(1).cast("long").alias("numberPkts"),
        F.when(src_mine, F.lit(1)).otherwise(F.lit(-1)).alias("direction"),
        F.col("timestamp").alias("beginTime"),
        F.col("timestamp").alias("endTime"),
        F.col("samplingRate").alias("sampleRate"),
    )


def _rows(df: DataFrame) -> list[str]:
    return sorted(map(repr, df.collect()))


def test_orient_flows_matches_column_reference(spark):
    pkts = E._synth_sflows(spark, SF)
    got = orient_flows(pkts, ["10.1."])
    ref = _orient_flows_column_reference(pkts, ["10.1."])
    assert got.schema == ref.schema
    g, r = _rows(got), _rows(ref)
    assert g == r
    assert g  # non-vacuous


def test_orient_flows_empty_mynets(spark):
    pkts = E._synth_sflows(spark, SF).limit(50)
    got = orient_flows(pkts, [])
    ref = _orient_flows_column_reference(pkts, [])
    assert _rows(got) == _rows(ref)


def test_icmp_projection_matches_column_reference(spark):
    pkts = E._synth_sflows2(spark, SF)
    # compare the pre-aggregation projection (the changed piece) and
    # the aggregated frame (the public surface)
    got = icmp_summary(pkts, ["10.1."])
    from hogzilla_spark.operators.rollup import icmp_summary as _  # noqa: F401

    ref_proj = _icmp_projection_column_reference(pkts, ["10.1."])
    ref = ref_proj.groupBy("myIP", "icmpType", "alienIP", "icmpCode", "proto").agg(
        F.sum("bytesUp").alias("bytesUp"),
        F.sum("bytesDown").alias("bytesDown"),
        F.sum("numberPkts").alias("numberPkts"),
        F.sum("direction").alias("direction"),
        F.min("beginTime").alias("beginTime"),
        F.max("endTime").alias("endTime"),
        F.avg("sampleRate").alias("sampleRate"),
    )
    assert got.schema == ref.schema
    g, r = _rows(got), _rows(ref)
    assert g == r
    assert g


def _synth_sflows_column_reference(spark, sf_dir: str) -> DataFrame:
    """Pre-r12 Column build of _synth_sflows, kept verbatim."""
    ev = E._t(spark, sf_dir, "events")
    internal = F.concat(F.lit("10.1.0."), (F.col("user_id") % 250).cast("string"))
    slot = (F.expr("event_id div 2") % 10).cast("string")
    external = F.concat(
        F.lit("8.8."), slot, F.lit("."), (F.col("user_id") % 250).cast("string")
    )
    outbound = F.col("event_id") % 2 == 0
    svc_port = (
        F.when(F.col("event_type") == "click", F.lit("53"))
        .when(F.col("event_type") == "view", F.lit("80"))
        .when(
            F.col("event_type") == "error",
            (F.lit(2000) + (F.expr("event_id div 2") % 5) * 500).cast("string"),
        )
        .when(F.col("event_type") == "purchase", F.lit("443"))
        .otherwise(F.lit("19999"))
    )
    flags = (
        F.when(F.col("event_type") == "error", "0x02")
        .when(F.col("event_type") == "purchase", "0x12")
        .when(F.col("event_type") == "view", "0x18")
        .otherwise("0x00")
    )
    client_port = (
        F.when(F.col("event_type") == "error", F.lit("4000"))
        .when(F.col("event_id") % 7 == 0, F.lit("514"))
        .when(
            F.col("event_type") == "signup",
            (F.lit(30000) + (F.expr("event_id div 4") % 2) * 10000).cast("string"),
        )
        .otherwise(F.lit("40000"))
    )
    proto = F.when(F.col("event_type").isin("click", "error"), "17").otherwise("6")
    return ev.select(
        F.when(outbound, internal).otherwise(external).alias("srcIP"),
        F.when(outbound, client_port).otherwise(svc_port).alias("srcPort"),
        F.when(outbound, external).otherwise(internal).alias("dstIP"),
        F.when(outbound, svc_port).otherwise(client_port).alias("dstPort"),
        proto.alias("IPprotocol"),
        E._cents(F.col("value")).alias("packetSize"),
        F.lit(1024).cast("long").alias("samplingRate"),
        flags.alias("tcpFlags"),
        F.expr("ts div 1000000000").alias("timestamp"),
    )


def test_synth_sflows_matches_column_reference(spark):
    got = E._synth_sflows(spark, SF)
    ref = _synth_sflows_column_reference(spark, SF)
    assert got.schema == ref.schema
    g, r = _rows(got), _rows(ref)
    assert g == r
    assert g


def test_synth_sflows_golden_shape(spark):
    """The parsed-SQL synth builders keep their documented output
    schema and deterministic values (spot-pin one row per builder; the
    DuckDB _SYNTH_SQL twins and every detector oracle pin the rest)."""
    p1 = E._synth_sflows(spark, SF)
    assert [f.name for f in p1.schema.fields] == [
        "srcIP", "srcPort", "dstIP", "dstPort", "IPprotocol",
        "packetSize", "samplingRate", "tcpFlags", "timestamp",
    ]
    p2 = E._synth_sflows2(spark, SF)
    assert [f.name for f in p2.schema.fields] == [
        "srcIP", "srcPort", "dstIP", "dstPort", "IPprotocol",
        "packetSize", "samplingRate", "tcpFlags", "timestamp",
    ]
    assert p1.count() == p2.count() > 0
