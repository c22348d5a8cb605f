"""Fixed-seed ML determinism goldens (VERDICT r7 task 7).

The k-means / RF unit tests prove the planted fixtures are found; this
tool records the FIT-level outcomes at real scale as committed goldens
so ML drift (a pyspark upgrade, a feature change, a seed slip) shows up
as a git diff on ML_GOLDENS.json instead of only inside unit asserts.

Per sf dir it derives a deterministic nDPI-flow table from `events`
with the same planted structure as `datagen.flows_rows` — a dominant
normal mass per protocol plus a tiny identical-feature anomalous group
(half Snort-tagged, half unlabeled) — and records integer metrics from
the three fit paths (all seeds pinned via MLConfig.seed):

  dns / http   n flows, sorted tainted-cell member counts, planted
               recall (every unlabeled anomaly row selected) and
               precision (nothing else selected)
  hist         HIST01 server-profile clustering: cluster count +
               sorted sizes over a two-profile host population
  rf           flagged-row count + planted precision/recall

Usage: python tools/ml_goldens.py [sf_dir ...]   (default sf0.1)
Prints one JSON object; redirect into ML_GOLDENS.json to re-record.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

#: anomalous user slots: uid%50 == 13 → DNS anomaly host, 7 → HTTP
#: (both single-digit-population-safe: the smallest sf dir has only
#: ~15 distinct users)
DNS_ANOM_UID, HTTP_ANOM_UID = 13, 7


def synth_flows(spark, sf_dir: str):
    """events → planted nDPI flows (pure deterministic mapping,
    FLOWS_TEST_SCHEMA-shaped)."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id"
    )
    uid = F.col("user_id") % 50
    eid = F.col("event_id")
    is_dns = eid % 2 == 0
    # anomaly rows: the anomalous host's every-10th event, on the
    # protocol its event-id parity lands on (eid%10==0 is even → DNS,
    # eid%10==5 is odd → HTTP); Snort-tag every other anomaly row
    # (tagged train positives vs unlabeled rows the fit must FIND)
    dns_anom = (uid == DNS_ANOM_UID) & (eid % 10 == 0)
    http_anom = (uid == HTTP_ANOM_UID) & (eid % 10 == 5)
    anom = dns_anom | http_anom
    tagged = dns_anom & (eid % 20 == 0) | http_anom & (eid % 20 == 5)
    host = F.concat(F.lit("10.1.0."), uid.cast("string"))
    n = lambda base, mod, scale=1: (  # mild normal variation
        F.lit(base) + (eid % mod) * scale
    ).cast("long")
    a = lambda normal, extreme: F.when(anom, F.lit(extreme)).otherwise(normal)
    df = ev.select(
        F.concat(F.lit("1700000000000."), eid.cast("string")).alias("flow_id"),
        host.alias("lower_ip"),
        F.when(anom, F.lit("7.7.7.7")).otherwise(F.lit("8.8.8.8")).alias("upper_ip"),
        F.lit("44000").alias("lower_port"),
        F.when(is_dns, F.lit("53")).otherwise(F.lit("80")).alias("upper_port"),
        host.alias("src_name"),
        F.lit("8.8.8.8").alias("dst_name"),
        F.when(is_dns, F.lit("5/DNS")).otherwise(F.lit("7/HTTP")).alias(
            "detected_protocol"
        ),
        F.when(anom, F.lit("evil.example")).otherwise(F.lit("example.com")).alias(
            "host_server_name"
        ),
        a(n(1000, 7), 90000).alias("bytes"),
        (a(n(4, 3), 200) + F.lit(2)).alias("packets"),  # > 1 filter
        a(n(120, 5), 1450).alias("avg_packet_size"),
        a(F.lit(1).cast("long"), 80).alias("packets_without_payload"),
        a(n(50, 9), 9000).alias("avg_inter_time"),
        a(n(2000, 11), 500000).alias("flow_duration"),
        a(F.lit(300).cast("long"), 1500).alias("max_packet_size"),
        a(F.lit(60).cast("long"), 40).alias("min_packet_size"),
        a(n(100, 4), 1400).alias("packet_size_0"),
        a(F.lit(110).cast("long"), 1400).alias("packet_size_1"),
        a(F.lit(100).cast("long"), 1400).alias("packet_size_2"),
        a(F.lit(95).cast("long"), 1400).alias("packet_size_3"),
        a(F.lit(90).cast("long"), 1400).alias("packet_size_4"),
        a(n(40, 5), 9000).alias("inter_time_0"),
        a(F.lit(42).cast("long"), 9100).alias("inter_time_1"),
        a(F.lit(44).cast("long"), 9200).alias("inter_time_2"),
        a(F.lit(41).cast("long"), 9300).alias("inter_time_3"),
        a(F.lit(43).cast("long"), 9400).alias("inter_time_4"),
        F.lit(1).alias("http_method"),
        a(F.lit(1), 40).cast("int").alias("dns_num_queries"),
        a(F.lit(1), 0).cast("int").alias("dns_num_answers"),
        a(F.lit(0), 3).cast("int").alias("dns_ret_code"),
        a(F.lit(0), 5).cast("int").alias("dns_bad_packet"),
        a(F.lit(1), 16).cast("int").alias("dns_query_type"),
        a(F.lit(1), 0).cast("int").alias("dns_rsp_type"),
        F.when(anom, F.lit(None).cast("string")).otherwise(F.lit("Safe")).alias(
            "ndpi_risk"
        ),
        F.when(tagged, F.lit("1")).otherwise(F.lit("")).alias("event_signature_id"),
        F.when(tagged, F.lit("1")).otherwise(F.lit("")).alias("event_generator_id"),
        F.when(tagged, F.lit("1")).otherwise(F.lit("")).alias("event_priority_id"),
    )
    # pin partitioning so seeded fits see a stable data layout across
    # file-split differences between runs/machines
    return df.repartitionByRange(8, "flow_id")


def planted_metrics(members, anom_ip: str) -> dict:
    """Integer selection-quality metrics for one taint path."""
    got = members.select("lower_ip", "flow_id").collect()
    n_sel = len(got)
    n_planted_sel = sum(1 for r in got if r.lower_ip == anom_ip)
    return {
        "members_selected": n_sel,
        "planted_members_selected": n_planted_sel,
        "foreign_members_selected": n_sel - n_planted_sel,
    }


def record(spark, sf_dir: str) -> dict:
    """The per-sf golden record — also asserted against the committed
    ML_GOLDENS.json by tests/test_ml.py, so ML drift fails CI instead
    of waiting for a manual re-record."""
    from pyspark.sql import functions as F

    from hogzilla_spark.config import MLConfig
    from hogzilla_spark.ml.kmeans import dns_kmeans, histogram_clustering, http_kmeans
    from hogzilla_spark.ml.rf import rf_train_score

    cfg = MLConfig()
    flows = synth_flows(spark, sf_dir)
    flows = flows.localCheckpoint(eager=True)
    rec: dict = {"n_flows": flows.count()}

    # cell-size VECTORS are excluded like centroids: k-means centroid
    # sums depend on task-completion order (treeAggregate combine
    # order), so borderline normal-mass rows hop cells run-to-run under
    # different host load even at a fixed seed — found when the in-suite
    # re-run diverged from a standalone recording.  The count of cells
    # and the (well-separated) planted cell's size ARE stable, as are
    # all selection metrics.
    dns_members, dns_cells = dns_kmeans(flows, cfg)
    dns_sizes = sorted(
        r.cell_count for r in dns_cells.select("cell_count").collect()
    )
    rec["dns"] = {
        "n_cells": len(dns_sizes),
        "planted_cell": dns_sizes[0],
        **planted_metrics(dns_members, f"10.1.0.{DNS_ANOM_UID}"),
    }
    http_members, http_cells = http_kmeans(flows, cfg)
    http_sizes = sorted(
        r.cell_count for r in http_cells.select("cell_count").collect()
    )
    rec["http"] = {
        "n_cells": len(http_sizes),
        "planted_cell": http_sizes[0],
        **planted_metrics(http_members, f"10.1.0.{HTTP_ANOM_UID}"),
    }

    # HIST01 profile clustering over a two-profile host population
    hosts = flows.select("lower_ip").distinct()
    octet = F.element_at(F.split("lower_ip", r"\."), 4).try_cast("int")
    hists = hosts.select(
        F.concat(F.lit("HIST01-"), "lower_ip").alias("hist_name"),
        F.lit(100).cast("long").alias("size"),
        F.when(
            octet % 2 == 0,
            F.create_map(F.lit("80"), F.lit(0.7), F.lit("443"), F.lit(0.3)),
        )
        .otherwise(
            F.create_map(F.lit("22"), F.lit(0.9), F.lit("53"), F.lit(0.1))
        )
        .alias("values"),
    )
    clusters, members = histogram_clustering(hists, ["10.1."], cfg)
    rec["hist"] = {
        "clusters": sorted(r.size for r in clusters.select("size").collect()),
        "members": members.count(),
    }

    flagged = rf_train_score(
        flows,
        numeric_cols=["bytes", "packets", "flow_duration"],
        char_cols=["detected_protocol"],
        cfg=cfg,
    ).select("lower_ip").collect()
    planted = {f"10.1.0.{DNS_ANOM_UID}", f"10.1.0.{HTTP_ANOM_UID}"}
    rec["rf"] = {
        "flagged_rows": len(flagged),
        "planted_rows_flagged": sum(1 for r in flagged if r.lower_ip in planted),
        "foreign_rows_flagged": sum(
            1 for r in flagged if r.lower_ip not in planted
        ),
    }
    return rec


def main() -> None:
    from hogzilla_spark import get_spark

    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = get_spark(app_name="ml_goldens")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"_note": (
        "Fixed-seed (MLConfig.seed=42) fit-level goldens over the planted "
        "synth-flow mapping in tools/ml_goldens.py — asserted against a "
        "re-run by tests/test_ml.py, so drift fails CI. Scheduling-robust "
        "integer metrics only (cell counts, the planted cell's size, "
        "selection counts); FP-order-jittery values (centroids, full "
        "cell-size vectors — treeAggregate combine order moves borderline "
        "rows between cells) are excluded by design."
    )}
    for sf_dir in sf_dirs:
        out[sf_dir.rstrip("/").rsplit("/", 1)[-1]] = record(spark, sf_dir)
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
