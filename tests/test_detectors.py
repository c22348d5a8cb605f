"""Golden detector tests: planted true-positive + near-miss per detector
(SURVEY.md §5 item 2) over the deterministic datagen fixtures."""

import pyspark.sql.functions as F
import pytest

from hogzilla_spark import datagen
from hogzilla_spark.config import DEFAULT
from hogzilla_spark.detectors import sflow as D
from hogzilla_spark.operators.rollup import icmp_summary, sflow_summary

CFG = DEFAULT.sflow

@pytest.fixture(scope="module")
def summary(spark):
    s = sflow_summary(datagen.sflows_df(spark), datagen.MY_NETS).persist()
    s.count()
    yield s
    s.unpersist()

@pytest.fixture(scope="module")
def icmp(spark):
    return icmp_summary(datagen.sflows_df(spark), datagen.MY_NETS)

@pytest.fixture(scope="module")
def empty_ips(spark):
    return spark.createDataFrame([], "myIP string")

def lower_ips(alerts):
    return sorted(r.lower_ip_str for r in alerts.select("lower_ip_str").collect())

def test_dns_tunnel(spark, summary):
    alerts = D.dns_tunnel(summary, datagen.MY_NETS, CFG)
    assert lower_ips(alerts) == ["10.1.0.40"]  # near-miss .41 absent

def test_icmp_tunnel(spark, icmp):
    alerts = D.icmp_tunnel(icmp, CFG)
    assert lower_ips(alerts) == ["10.1.0.50"]

def test_udp_amplifier(spark, summary):
    alerts = D.udp_amplifier(summary, datagen.MY_NETS, CFG)
    assert lower_ips(alerts) == ["10.1.0.60"]

def test_abused_smtp(spark, summary):
    alerts = D.abused_smtp(summary, datagen.MY_NETS, CFG)
    got = alerts.select("lower_ip_str", "upper_ip_str").collect()
    assert [(r.lower_ip_str, r.upper_ip_str) for r in got] == [
        ("10.1.0.70", "203.0.114.7")
    ]

def test_smtp_talkers_stateless(spark, summary):
    alerts = D.smtp_talkers(summary, datagen.MY_NETS, CFG, histograms=None)
    assert lower_ips(alerts) == ["10.1.0.80"]

def test_smtp_talkers_state_guard(spark, summary):
    # a mature HIST01 with port-25 weight marks .80 as a known SMTP
    # server → suppressed (HogSFlow.scala:1073-1079)
    hist = spark.createDataFrame(
        [("HIST01-10.1.0.80", 200, {"25": 0.9, "443": 0.1}, {})],
        "hist_name string, size long, values map<string,double>, labels map<string,string>",
    )
    alerts = D.smtp_talkers(summary, datagen.MY_NETS, CFG, histograms=hist)
    assert lower_ips(alerts) == []

def test_p2p_and_dependency_chain(spark, summary):
    ftp_pairs = D.ftp_talkers(summary)
    assert [(r.myIP, r.alienIP) for r in ftp_pairs.collect()] == [
        ("10.1.0.140", "44.44.44.44")
    ]
    hist = spark.createDataFrame(
        [], "hist_name string, size long, values map<string,double>, labels map<string,string>"
    )
    alerts, talkers = D.p2p_talkers(
        summary, datagen.MY_NETS, CFG, ftp_pairs, D.ftp_servers(hist)
    )
    assert lower_ips(alerts) == ["10.1.0.90"]
    assert sorted(r.myIP for r in talkers.collect()) == ["10.1.0.90"]

def test_p2p_suppressed_for_ftp_server(spark, summary):
    # learned HIST01 with port-21 weight → myIP is an FTP server → no P2P
    hist = spark.createDataFrame(
        [("HIST01-10.1.0.90", 100, {"21": 0.5}, {})],
        "hist_name string, size long, values map<string,double>, labels map<string,string>",
    )
    alerts, _ = D.p2p_talkers(
        summary, datagen.MY_NETS, CFG, D.ftp_talkers(summary), D.ftp_servers(hist)
    )
    assert lower_ips(alerts) == []

def test_media_streaming(spark, summary, empty_ips):
    alerts, clients = D.media_streaming_clients(summary, datagen.MY_NETS, CFG, empty_ips)
    assert lower_ips(alerts) == ["10.1.0.100"]  # near-miss .101: 10s session

def test_media_suppressed_for_p2p_talker(spark, summary):
    p2p = spark.createDataFrame([("10.1.0.100",)], "myIP string")
    alerts, _ = D.media_streaming_clients(summary, datagen.MY_NETS, CFG, p2p)
    assert lower_ips(alerts) == []

def test_alien_many_hosts(spark, summary):
    alerts = D.alien_accessing_many_hosts(summary, datagen.MY_NETS, CFG)
    rows = alerts.collect()
    assert [r.lower_ip_str for r in rows] == ["66.66.66.66"]
    assert rows[0].data["numberOfPairs"] == "21"
    assert "TCP/22" in rows[0].data["ports"]

def test_ddos(spark, summary, empty_ips):
    alerts = D.ddos_attack(summary, datagen.MY_NETS, CFG, empty_ips)
    rows = alerts.collect()
    assert [r.lower_ip_str for r in rows] == ["10.1.0.110"]  # .111: 120s gaps
    assert rows[0].data["numberOfAttackers"] == "21"

def test_cc_botnet_prefix_match(spark, summary):
    bl = datagen.reputation_df(spark).filter(
        (F.col("list") == "CCBotNet") & (F.col("list_type") == "blacklist")
    ).select(F.col("ip").alias("prefix"))
    alerts = D.cc_botnet(summary, bl, CFG)
    rows = alerts.collect()
    assert [r.lower_ip_str for r in rows] == ["10.1.0.120"]  # .121: 5 pkts
    assert rows[0].data["aliens"] == "203.0.113.7"

def test_os_inventory(spark, summary):
    rep = datagen.reputation_df(spark)
    os_repos = rep.filter(F.col("list") == "OSRepo").select(
        "ip",
        F.when(F.col("list_type") == "linux", "Linux")
        .when(F.col("list_type") == "windows", "Windows")
        .alias("os"),
    )
    inv = D.os_inventory(summary, os_repos)
    assert [(r.ip, r.os) for r in inv.collect()] == [("10.1.0.130", "Linux")]

def test_top_talkers_disabled_threshold(spark, summary):
    # nothing in the fixtures reaches 20 GB — empty like the reference
    alerts = D.top_talkers(summary, datagen.MY_NETS, CFG)
    assert lower_ips(alerts) == []
