"""Deterministic hogzilla-shaped fixtures (FIXTURES.md).

Builds the sflows packet-sample table with one planted true-positive
and one near-miss per detector, plus the dimension tables (mynets,
reputation).  Everything is hand-placed (no RNG) so golden tests are
byte-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

MY_NETS = ["10.1."]

def _pkt(
    src: str,
    sport: str,
    dst: str,
    dport: str,
    proto: str,
    size: int,
    rate: int = 1024,
    flags: str = "0x00",
    ts: int = 1_700_000_000,
):
    return (src, sport, dst, dport, proto, size, rate, flags, ts)

def sflow_rows() -> list[tuple]:
    rows: list[tuple] = []
    T = 1_700_000_000

    # --- DNS tunnel (826001012): UDP/53, both directions > 25MB*rate ------
    # TP: 10.1.0.40 ↔ 8.8.4.4 — 30000B each way, rate 1024 → 30.7MB each
    rows += [
        _pkt("10.1.0.40", "44000", "8.8.4.4", "53", "17", 30000, ts=T),
        _pkt("8.8.4.4", "53", "10.1.0.40", "44000", "17", 30000, ts=T + 5),
    ]
    # near-miss: up-heavy only (bytesDown*rate below threshold)
    rows += [
        _pkt("10.1.0.41", "44001", "8.8.4.4", "53", "17", 30000, ts=T),
        _pkt("8.8.4.4", "53", "10.1.0.41", "44001", "17", 100, ts=T + 5),
    ]

    # --- ICMP tunnel (826001013): >200B/pkt, total*rate > 100MB -----------
    # TP: 50 pkts × 300B at rate 8192 → 122MB
    rows += [
        _pkt("10.1.0.50", "8", "9.9.9.9", "0", "1", 300, rate=8192, ts=T + i)
        for i in range(50)
    ]
    # near-miss: small total (50 pkts × 300B at rate 1 → 15KB)
    rows += [
        _pkt("10.1.0.51", "8", "9.9.9.9", "0", "1", 300, rate=1, ts=T + i)
        for i in range(50)
    ]

    # --- UDP amplifier (826001009): myPort∈{19,53,123,1900}, >250B/pkt ----
    # TP: 3 pkts × 300B from port 53
    rows += [
        _pkt("10.1.0.60", "53", "198.51.100.9", "40000", "17", 300, ts=T + i)
        for i in range(3)
    ]
    # near-miss: 200B/pkt (≤250)
    rows += [
        _pkt("10.1.0.61", "53", "198.51.100.9", "40001", "17", 200, ts=T + i)
        for i in range(3)
    ]

    # --- abused SMTP (826001010): myPort 465/587 TCP, >50 conns/pair ------
    # TP: 51 connections (distinct alien ports), 2000B down each
    for j in range(51):
        rows.append(
            _pkt("203.0.114.7", str(50000 + j), "10.1.0.70", "465", "6", 2000, ts=T + j)
        )
    # near-miss: 20 connections
    for j in range(20):
        rows.append(
            _pkt("203.0.114.7", str(50000 + j), "10.1.0.71", "465", "6", 2000, ts=T + j)
        )

    # --- SMTP talker (826001002): alienPort 25, pkts>3/flow, >20MB*rate ---
    # TP: 2 connections × 11 pkts × 1000B  → pkts 22 > 20, 22.5MB
    for conn in range(2):
        for p in range(11):
            rows.append(
                _pkt("10.1.0.80", str(40100 + conn), "198.51.100.25", "25", "6",
                     1000, ts=T + conn * 100 + p)
            )
    # near-miss: volume below threshold (pkts 22 but tiny bytes, rate 1)
    for conn in range(2):
        for p in range(11):
            rows.append(
                _pkt("10.1.0.81", str(40200 + conn), "198.51.100.25", "25", "6",
                     10, rate=1, ts=T + conn * 100 + p)
            )

    # --- P2P method 1 (826001008): ports>10000 both sides, >5 pairs,
    #     >4 distinct myPorts -------------------------------------------
    for i in range(6):  # 6 pairs, 6 distinct myPorts
        for p in range(2):  # numberPkts > 1
            rows.append(
                _pkt("10.1.0.90", str(20000 + i), f"198.51.{100 + i}.1",
                     str(30000 + i), "6", 500, ts=T + i * 10 + p)
            )
    # near-miss: only 4 pairs
    for i in range(4):
        for p in range(2):
            rows.append(
                _pkt("10.1.0.91", str(21000 + i), f"198.51.{100 + i}.2",
                     str(31000 + i), "6", 500, ts=T + i * 10 + p)
            )

    # --- media streaming client (826001011): TCP mid ports, 300<dur<7200,
    #     download-heavy ---------------------------------------------------
    rows += [
        _pkt("10.1.0.100", "5555", "198.51.200.1", "5000", "6", 500, ts=T),
        _pkt("198.51.200.1", "5000", "10.1.0.100", "5555", "6", 2000, ts=T + 1000),
    ]
    # near-miss: duration too short (10 s)
    rows += [
        _pkt("10.1.0.101", "5556", "198.51.200.1", "5001", "6", 500, ts=T),
        _pkt("198.51.200.1", "5001", "10.1.0.101", "5556", "6", 2000, ts=T + 10),
    ]

    # --- alien accessing many hosts (826001007): >20 pairs inbound --------
    for i in range(21):
        rows.append(
            _pkt("66.66.66.66", "40000", f"10.1.2.{i}", "22", "6", 100,
                 flags="0x02", ts=T + i)
        )
    # near-miss: 10 pairs
    for i in range(10):
        rows.append(
            _pkt("66.66.66.67", "40000", f"10.1.3.{i}", "22", "6", 100,
                 flags="0x02", ts=T + i)
        )

    # --- DDoS (826001016): >20 attackers, >50 flows each, gaps<60s,
    #     down>up ----------------------------------------------------------
    for a in range(21):
        for f in range(51):
            rows.append(
                _pkt(f"55.55.{a}.1", str(20000 + f), "10.1.0.110", "7777", "17",
                     3000, ts=T + f * 10)
            )
    # near-miss: gaps of 120 s (irregular / slow)
    for a in range(21):
        for f in range(51):
            rows.append(
                _pkt(f"56.56.{a}.1", str(20000 + f), "10.1.0.111", "7777", "17",
                     3000, ts=T + f * 120)
            )

    # --- C&C botnet (826001017): alien prefix-matches blacklist,
    #     myPort>1023, pkts>=20 -------------------------------------------
    for p in range(20):
        rows.append(
            _pkt("10.1.0.120", "30000", "203.0.113.7", "6667", "6", 100, ts=T + p)
        )
    # near-miss: only 5 pkts
    for p in range(5):
        rows.append(
            _pkt("10.1.0.121", "30001", "203.0.113.7", "6667", "6", 100, ts=T + p)
        )

    # --- OS inventory: contact with OS repo IP ----------------------------
    rows.append(_pkt("10.1.0.130", "44321", "91.189.88.1", "443", "6", 500, ts=T))

    # ===== stateful-detector scenarios (HIST01-08 fixtures in
    # histograms_df pair with these) ======================================

    # atypical TCP port (826001003): 10.1.0.150 serves port 12345 to 4
    # distinct client ports (server heuristic: >3 alien ports, ratio>0.2),
    # PSH-ACK confirmed; mature HIST01 knows only 443 → atypical.
    for j in range(4):
        for p in range(2):  # numberPkts >= 2
            rows.append(
                _pkt("10.1.0.150", "12345", "77.77.77.1", str(50001 + j), "6",
                     400, flags="0x18", ts=T + j * 5 + p)
            )
    # learn-only twin (no saved HIST01) → state update, no alert
    for j in range(4):
        for p in range(2):
            rows.append(
                _pkt("10.1.0.151", "12346", "77.77.77.2", str(50001 + j), "6",
                     400, flags="0x18", ts=T + j * 5 + p)
            )

    # atypical alien TCP port (826001004): 10.1.0.160 → 88.88.88.1:4567;
    # mature HIST02 (443 only) + HIST02.1 marks 4567 typical-now;
    # alien histogram absent → J8 check passes → alert.
    rows.append(_pkt("10.1.0.160", "40005", "88.88.88.1", "4567", "6", 300, flags="0x02", ts=T))
    rows.append(_pkt("10.1.0.160", "40005", "88.88.88.1", "4567", "6", 300, flags="0x18", ts=T + 1))
    # near-miss twin: HIST02.1 does NOT contain 4568 → no alert
    rows.append(_pkt("10.1.0.161", "40006", "88.88.88.2", "4568", "6", 300, flags="0x02", ts=T))
    rows.append(_pkt("10.1.0.161", "40006", "88.88.88.2", "4568", "6", 300, flags="0x18", ts=T + 1))

    # atypical pairs (826001005): 301 distinct aliens (>300), 2 pkts each;
    # mature concentrated HIST03 lacking the bucket → alert.
    for i in range(301):
        for p in range(2):
            rows.append(
                _pkt("10.1.0.170", str(45000 + (i % 1000)), f"89.89.{i // 250}.{i % 250}",
                     "443", "6", 100, ts=T + i)
            )
    # learn-only twin
    for i in range(301):
        for p in range(2):
            rows.append(
                _pkt("10.1.0.171", str(45000 + (i % 1000)), f"90.90.{i // 250}.{i % 250}",
                     "443", "6", 100, ts=T + i)
            )

    # atypical data (826001006): one 6MB-sampled flow → 6.1GB estimated
    # (> the 5_737_418_240 threshold); bucket floor(ln(6e6*1e-4+1)) = 6
    rows.append(_pkt("10.1.0.180", "45999", "91.91.91.1", "443", "6", 6_000_000, ts=T))
    rows.append(_pkt("10.1.0.181", "45998", "91.91.91.2", "443", "6", 6_000_000, ts=T))

    # horizontal portscan (826001014): 101 aliens on port 2323, tiny flows
    for i in range(101):
        rows.append(
            _pkt("10.1.0.190", "40000", f"92.92.{i // 250}.{i % 250}", "2323", "6",
                 60, flags="0x02", ts=T + i)
        )
    for i in range(101):
        rows.append(
            _pkt("10.1.0.191", "40000", f"93.93.{i // 250}.{i % 250}", "2323", "6",
                 60, flags="0x02", ts=T + i)
        )

    # vertical portscan (826001015): 4 low ports on one alien
    # (21 avoided: port-21 pairs would register as FTP talkers)
    for port in ("100", "101", "102", "103"):
        rows.append(
            _pkt("10.1.0.200", "40000", "99.99.99.9", port, "6", 60, flags="0x02", ts=T)
        )
    # near-miss twin: saved HIST08 already has a ≥4-port bucket
    for port in ("100", "101", "102", "103"):
        rows.append(
            _pkt("10.1.0.201", "40000", "99.99.99.8", port, "6", 60, flags="0x02", ts=T)
        )

    # alien-network profiling: 5 internal hosts → 123.123.123.0/24:8443
    for i in range(5):
        rows.append(
            _pkt(f"10.1.4.{i}", "40001", "123.123.123.9", "8443", "6", 500, ts=T + i)
        )
    # big-provider learning: >1GB-estimated flow from 5 hosts
    for i in range(5):
        rows.append(
            _pkt(f"10.1.5.{i}", "40002", "124.124.124.1", "8443", "6", 2_000_000, ts=T + i)
        )

    # --- FTP talkers: port-21 pair (suppresses p2p for this pair) ---------
    for p in range(2):
        rows.append(_pkt("10.1.0.140", "21", "44.44.44.44", "40000", "6", 100, ts=T + p))

    # --- both-ports-low direction edge: srcPort 514 AND dstPort 513 are
    # <1024, so the reference's last-write-wins heuristic votes RIGHTLEFT
    # (HogSFlow.scala:838-845); benign single flow, triggers no detector.
    rows.append(_pkt("10.1.0.141", "514", "45.45.45.45", "513", "6", 100, ts=T))

    return rows

def sflows_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        sflow_rows(),
        "srcIP string, srcPort string, dstIP string, dstPort string, "
        "IPprotocol string, packetSize long, samplingRate long, "
        "tcpFlags string, timestamp long",
    )

def reputation_df(spark: SparkSession) -> DataFrame:
    rows = [
        ("203.0.113.", "CCBotNet", "blacklist", "test C&C prefix"),
        ("91.189.88.1", "OSRepo", "linux", "ubuntu archive"),
        ("91.189.88.2", "OSRepo", "windows", "wsus"),
    ]
    return spark.createDataFrame(rows, "ip string, list string, list_type string, description string")

def mynets_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([("10.1.", "lab net")], "prefix string, description string")

FLOWS_TEST_SCHEMA = (
    "flow_id string, lower_ip string, upper_ip string, lower_port string, "
    "upper_port string, src_name string, dst_name string, "
    "detected_protocol string, host_server_name string, "
    "bytes long, packets long, avg_packet_size long, "
    "packets_without_payload long, avg_inter_time long, flow_duration long, "
    "max_packet_size long, min_packet_size long, "
    "packet_size_0 long, packet_size_1 long, packet_size_2 long, "
    "packet_size_3 long, packet_size_4 long, inter_time_0 long, "
    "inter_time_1 long, inter_time_2 long, inter_time_3 long, "
    "inter_time_4 long, http_method int, "
    "dns_num_queries int, dns_num_answers int, dns_ret_code int, "
    "dns_bad_packet int, dns_query_type int, dns_rsp_type int, "
    "ndpi_risk string, event_signature_id string, event_generator_id string, "
    "event_priority_id string"
)

def flows_rows() -> list[tuple]:
    """nDPI flows for the k-means / RF tests: 200 normal DNS flows plus a
    small identical-feature anomalous group (10 rows, 5 Snort-tagged —
    enough positives for the RF, still under the 5% taint cap) that the
    taint selection must find (FIXTURES.md §2)."""
    rows = []
    for i in range(200):
        rows.append((
            f"1700000000000.{i}", "10.1.0.5", "8.8.8.8", "44000", "53",
            "10.1.0.5", "8.8.8.8", "5/DNS", "example.com",
            1000 + (i % 7), 4 + (i % 3), 120 + (i % 5), 1, 50 + (i % 9),
            2000 + (i % 11), 300, 60, 100, 110, 100, 95, 90,
            40 + (i % 5), 42, 44, 41, 43, 1,
            1, 1, 0, 0, 1, 1,
            "Safe", "", "", "",
        ))
    for i in range(10):
        tagged = i < 5
        rows.append((
            f"1700000000000.{200 + i}", "10.1.0.66", "7.7.7.7", "44001", "53",
            "10.1.0.66", "7.7.7.7", "5/DNS", "evil.example",
            90000, 200, 450, 80, 9000, 500000, 1400, 40, 1400, 1400, 1400, 1400, 1400,
            9000, 9100, 9200, 9300, 9400, 1,
            40, 0, 3, 5, 16, 0,
            None, "1" if tagged else "", "1" if tagged else "",
            "1" if tagged else "",
        ))
    # HTTP flows (ports 80/81) for the HTTP k-means path: 120 normal
    # + 6 identical anomalous (2 Snort-tagged; 6 < 5% of 126 so the
    # taint cap keeps the cell eligible)
    for i in range(120):
        rows.append((
            f"1700000000000.{300 + i}", "10.1.0.7", "93.184.216.34", "52000", "80",
            "10.1.0.7", "93.184.216.34", "7/HTTP", "example.org",
            5000 + (i % 13), 10 + (i % 4), 400 + (i % 7), 2, 80 + (i % 5),
            9000 + (i % 17), 900, 200, 300, 310, 320, 330, 340,
            30 + (i % 5), 31, 32, 33, 34, 1,
            0, 0, 0, 0, 0, 0,
            "Safe", "", "", "",
        ))
    for i in range(6):
        tagged = i < 2
        rows.append((
            f"1700000000000.{420 + i}", "10.1.0.77", "6.6.6.6", "52001", "80",
            "10.1.0.77", "6.6.6.6", "7/HTTP", "bad.example",
            400000, 900, 1450, 300, 30000, 2000000, 1500, 60,
            1500, 1500, 1500, 1500, 1500,
            20000, 21000, 22000, 23000, 24000, 3,
            0, 0, 0, 0, 0, 0,
            None, "1" if tagged else "", "1" if tagged else "",
            "1" if tagged else "",
        ))
    return rows

def flows_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(flows_rows(), FLOWS_TEST_SCHEMA)

def auth_rows() -> list[tuple]:
    """Login records for auth profiling (FIXTURES.md §3): alice has
    mature state in auth_histograms_df; each scenario isolates one
    atypicality."""
    chrome = "Mozilla/5.0 (Windows NT 10.0) Chrome/120.0 Safari/537.36"
    base = {
        "agent": "vpn1", "service": "ssh", "authMethod": "password",
        "loginFailed": 0, "asn": "AS1",
    }
    def rec(user, coords, city, region, country, reverse="", ua=chrome,
            agent="vpn1", service="ssh", t=1.7e9):
        return (t, agent, service, reverse, "200.1.2.3", user,
                base["authMethod"], base["loginFailed"], ua,
                country, region, city, coords, base["asn"])
    rows = [
        # 1: far city (Rio, ~357 km) → cityEvent "C"
        rec("alice", "-22.90,-43.20", "Rio de Janeiro", "RJ", "Brazil"),
        # 2: new coords but < 300 km from a known location → no alert
        rec("alice", "-23.50,-46.60", "Osasco", "SP", "Brazil"),
        # 3: far city but whitelisted reverse domain → no alert
        rec("alice", "40.71,-74.00", "New York", "NY", "USA",
            reverse="mail.google.com"),
        # 4: novel user-agent family → UAEvent "U"
        rec("alice", "-23.55,-46.63", "Sao Paulo", "SP", "Brazil",
            ua="curl/7.79.1"),
        # 5: unknown user → learn only
        rec("bob", "48.85,2.35", "Paris", "IDF", "France"),
        # 6: novel agent/service → systemEvent "S"
        rec("alice", "-23.55,-46.63", "Sao Paulo", "SP", "Brazil",
            agent="vpn2", service="rdp"),
    ]
    return rows

def auth_df(spark: SparkSession) -> DataFrame:
    from hogzilla_spark.schemas import AUTHRECORDS

    return spark.createDataFrame(auth_rows(), AUTHRECORDS)

def auth_histograms_df(spark: SparkSession) -> DataFrame:
    sp = "-23.55,-46.63"
    rows = [
        ("HIST20-alice", 20, {sp: 1.0}, {sp: "Sao_Paulo/Brazil"}),
        ("HIST21-alice", 20, {"Windows/Chrome": 1.0}, {}),
        ("HIST22-alice", 20, {"vpn1/ssh": 1.0}, {}),
    ]
    return spark.createDataFrame(
        rows,
        "hist_name string, size long, values map<string,double>, labels map<string,string>",
    )

def histograms_df(spark: SparkSession) -> DataFrame:
    """Pre-seeded learned state pairing with the stateful scenarios:
    mature histograms for the planted TPs, gates/near-misses exercised
    (FIXTURES.md §6)."""
    rows = [
        ("HIST01-10.1.0.150", 200, {"443": 1.0}, {}),
        ("HIST02-10.1.0.160", 2000, {"443": 1.0}, {}),
        ("HIST02.1-10.1.0.160", 10, {"4567": 0.5}, {}),
        ("HIST02-10.1.0.161", 2000, {"443": 1.0}, {}),
        ("HIST02.1-10.1.0.161", 10, {"9999": 1.0}, {}),
        ("HIST03-10.1.0.170", 20, {"5": 1.0}, {}),
        ("HIST04-10.1.0.180", 100, {"2": 1.0}, {}),
        ("HIST07-10.1.0.190", 150, {"2323": 50.0}, {}),
        ("HIST08-10.1.0.200", 20, {"2": 0.9}, {}),
        ("HIST08-10.1.0.201", 20, {"6": 0.5}, {}),
    ]
    return spark.createDataFrame(
        rows,
        "hist_name string, size long, values map<string,double>, labels map<string,string>",
    )
