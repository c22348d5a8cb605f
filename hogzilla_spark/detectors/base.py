"""Alert/signature infrastructure (HogEvent/HogSignature equivalents).

The reference emits alerts via per-row HBase puts inside foreach
(HogEvent.scala:61-82).  The engine builds alert DataFrames with a
uniform schema and appends them to the events sink in one batched
write — the 100 TB-safe shape.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hogzilla_spark.functions.scalar import ip_to_bytes

@dataclass(frozen=True)
class Signature:
    """HogSignature(class, name, priority, revision, id, group)
    (HogSignature.scala:30-52)."""

    sig_class: int
    name: str
    priority: int
    revision: int
    sig_id: int
    group_id: int

# The sFlow detector catalog (HogSFlow.scala:61-77); DNS/HTTP/hist/auth
# signatures live with their modules.
SIGNATURES: dict[str, Signature] = {
    "top_talker": Signature(3, "HZ: Top talker identified", 2, 1, 826001001, 826),
    "smtp_talker": Signature(3, "HZ: SMTP talker identified", 1, 1, 826001002, 826),
    "atypical_tcp_port": Signature(3, "HZ: Atypical TCP port used", 2, 1, 826001003, 826),
    "atypical_alien_tcp_port": Signature(3, "HZ: Atypical alien TCP port used", 2, 1, 826001004, 826),
    "atypical_pairs": Signature(3, "HZ: Atypical number of pairs in the period", 2, 1, 826001005, 826),
    "atypical_data": Signature(3, "HZ: Atypical amount of data transferred", 2, 1, 826001006, 826),
    "alien_many_hosts": Signature(3, "HZ: Alien accessing too much hosts", 3, 1, 826001007, 826),
    "p2p": Signature(3, "HZ: P2P communication", 3, 1, 826001008, 826),
    "udp_amplifier": Signature(3, "HZ: UDP amplifier (DDoS)", 1, 1, 826001009, 826),
    "abused_smtp": Signature(3, "HZ: Abused SMTP Server", 2, 1, 826001010, 826),
    "media_client": Signature(3, "HZ: Media streaming client", 3, 1, 826001011, 826),
    "dns_tunnel": Signature(3, "HZ: DNS Tunnel", 1, 1, 826001012, 826),
    "icmp_tunnel": Signature(3, "HZ: ICMP Tunnel", 1, 1, 826001013, 826),
    "horizontal_portscan": Signature(3, "HZ: Horizontal portscan", 2, 1, 826001014, 826),
    "vertical_portscan": Signature(3, "HZ: Vertical portscan", 2, 1, 826001015, 826),
    "ddos": Signature(3, "HZ: Server under DDoS attack", 1, 1, 826001016, 826),
    "cc_botnet": Signature(3, "HZ: C&C BotNet communication", 1, 1, 826001017, 826),
    # DNS/HTTP k-means (HogDNS.scala:53, HogHTTP.scala:50; the 826000001 id
    # collides with the Snort-RF module in the reference — kept, documented)
    "dns_kmeans": Signature(3, "HZ: Suspicious DNS flow identified", 3, 1, 826000001, 826),
    "http_kmeans": Signature(3, "HZ: Suspicious HTTP flow identified", 3, 1, 826000101, 826),
    # auth (HogAuth.scala:68-71)
    "auth_location": Signature(3, "HZ/Auth: Atypical access location", 2, 1, 826001201, 826),
    "auth_useragent": Signature(3, "HZ/Auth: Atypical access user-agent", 2, 1, 826001202, 826),
    "auth_service": Signature(3, "HZ/Auth: Atypical access service or system", 2, 1, 826001203, 826),
    "auth_combined": Signature(3, "HZ/Auth: Atypical user access", 2, 1, 826001204, 826),
}

def signatures_df(spark: SparkSession) -> DataFrame:
    """S14: the idempotent signature catalog as a DataFrame (engine
    equivalent of HogSignature.saveHBase upserts)."""
    rows = [
        (s.sig_id, s.sig_class, s.name, s.priority, s.revision, s.group_id)
        for s in SIGNATURES.values()
    ]
    return spark.createDataFrame(
        rows,
        "signature_id long, signature_class int, signature_name string, "
        "signature_priority int, signature_revision int, signature_group_id long",
    )

def mk_alert(
    df: DataFrame,
    sig: Signature,
    lower_ip: Column,
    upper_ip: Column,
    title: Column,
    data: dict[str, Column],
    batch_time: int = 0,
) -> DataFrame:
    """Uniform alert schema (S9 sink rows, HogEvent.scala:61-82).

    `data` carries the detector's event.data key/values as a map column;
    `batch_time` is injected (not wall clock) so outputs are
    deterministic and golden-testable.
    """
    from hogzilla_spark.functions.scalar import human_bytes

    entries = []
    # note text follows the reference's populate* template
    # (HogSFlow.scala:233-452): fixed preamble + behaviour + field lines,
    # byte-valued fields human-formatted
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
        F.create_map(*entries).alias("data") if entries else F.create_map().alias("data"),
        F.concat(*note_parts).alias("note"),
    )

def flow_struct() -> Column:
    """The 13-field flow tuple the reference accumulates per alert
    (HogSFlow flowSet; bytes first for deterministic desc rendering)."""
    return F.struct(
        (F.col("bytesUp") + F.col("bytesDown")).alias("totalBytes"),
        F.col("myIP"),
        F.col("myPort"),
        F.col("alienIP"),
        F.col("alienPort"),
        F.col("proto"),
        F.col("bytesUp"),
        F.col("bytesDown"),
        F.col("numberPkts"),
        F.col("direction"),
        F.col("beginTime"),
        F.col("endTime"),
        F.col("status"),
    )

def collect_flows(limit: int = 1000) -> Column:
    """A4+O3: bounded deterministic flow list for alert rendering
    (alert.maxFlowList=1000, HogSFlow.scala:662-696)."""
    return F.slice(
        F.reverse(F.array_sort(F.collect_list(flow_struct()))), 1, limit
    ).alias("flows")
