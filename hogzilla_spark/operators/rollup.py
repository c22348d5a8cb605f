"""Canonical flow rollups (SURVEY.md §2.4 A1/A2 + §2.2 P7).

The reference builds ``sflowSummary`` — the shared input of every sFlow
detector — by orienting each sampled packet into the (myIP, alienIP)
frame and reducing on the 5-tuple (HogSFlow.scala:789-882).  Here it is
one declarative groupBy over a ``when``-chain projection; Catalyst plans
a partial+final hash aggregate (same shape as the reference's
``reduceByKey``, minus the hand-scheduling).

Intentional divergence (SURVEY.md §4 item 4): the reference's running
``(a+b)/2`` sampleRate "average" is order-dependent; we compute a true
mean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hogzilla_spark.functions.scalar import (
    TCP_ACK,
    TCP_PSHACK,
    TCP_SYN,
    TCP_SYNACK,
    is_my_ip,
)

UNKNOWN, LEFTRIGHT, RIGHTLEFT, OCCURRED = 0, 1, -1, 1

def orient_flows(sflows: DataFrame, my_nets: list[str]) -> DataFrame:
    """P7: per-packet direction/status inference + (myIP, alienIP) orientation.

    Semantics (HogSFlow.scala:811-866):
      - TCP only: SYN → direction +1 (src initiated); SYN-ACK → −1 and a
        confirmed status; PSH-ACK → confirmed; ACK from a my-host →
        confirmed; else ports<1024 heuristic (srcPort wins when both are
        low — reference last-write-wins).  UDP keeps direction 0.
      - If src is not a my-net IP the tuple is flipped to (dst, src) and
        the direction vote is negated; bytes land on bytesDown.
    """
    src_mine = is_my_ip("srcIP", my_nets)
    is_tcp = F.col("IPprotocol") == "6"
    flags = F.col("tcpFlags")

    direction = F.when(
        is_tcp,
        F.when(flags == TCP_SYN, F.lit(LEFTRIGHT))
        .when(flags == TCP_SYNACK, F.lit(RIGHTLEFT))
        .otherwise(
            # port heuristic only when flags decided nothing.  The
            # reference's two sequential `if`s (HogSFlow.scala:838-845)
            # are last-write-wins: srcPort<1024 overwrites dstPort<1024,
            # so when BOTH ports are low the answer is RIGHTLEFT.
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

def sflow_summary(sflows: DataFrame, my_nets: list[str]) -> DataFrame:
    """A1: the canonical 5-tuple rollup every TCP/UDP detector reads.

    One shuffle on (myIP, myPort, alienIP, alienPort, proto); map-side
    partial aggregation is automatic.  Callers `.persist()` the result
    when fanning out to many detectors (the reference `.cache`s too,
    HogSFlow.scala:882).
    """
    oriented = orient_flows(sflows, my_nets).filter(
        F.col("IPprotocol").isin("6", "17")
    )
    return oriented.groupBy("myIP", "myPort", "alienIP", "alienPort", "proto").agg(
        F.sum("bytesUp").alias("bytesUp"),
        F.sum("bytesDown").alias("bytesDown"),
        F.sum("numberPkts").alias("numberPkts"),
        F.sum("direction").alias("direction"),
        F.min("beginTime").alias("beginTime"),
        F.max("endTime").alias("endTime"),
        F.avg("sampleRate").alias("sampleRate"),
        F.sum("status").alias("status"),
    )

def icmp_summary(sflows: DataFrame, my_nets: list[str]) -> DataFrame:
    """A2: ICMP/ICMPv6 variant keyed (myIP, icmpType, alienIP, icmpCode,
    proto); srcPort/dstPort carry type/code (HogSFlow.scala:885-939)."""
    src_mine = is_my_ip("srcIP", my_nets)
    proto = F.when(F.col("IPprotocol") == "1", F.lit("ICMP")).otherwise(F.lit("ICMPv6"))
    oriented = sflows.filter(F.col("IPprotocol").isin("1", "58")).select(
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
    return oriented.groupBy("myIP", "icmpType", "alienIP", "icmpCode", "proto").agg(
        F.sum("bytesUp").alias("bytesUp"),
        F.sum("bytesDown").alias("bytesDown"),
        F.sum("numberPkts").alias("numberPkts"),
        F.sum("direction").alias("direction"),
        F.min("beginTime").alias("beginTime"),
        F.max("endTime").alias("endTime"),
        F.avg("sampleRate").alias("sampleRate"),
    )
