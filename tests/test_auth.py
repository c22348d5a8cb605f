"""Auth-profiling tests (826001201-04): location/UA/service scoring,
guards, learn gate, state updates."""

import pyspark.sql.functions as F
import pytest

from hogzilla_spark import datagen
from hogzilla_spark.config import DEFAULT
from hogzilla_spark.detectors.auth import auth_profile
from hogzilla_spark.functions.scalar import ua_family

@pytest.fixture(scope="module")
def result(spark):
    alerts, updates = auth_profile(
        datagen.auth_df(spark),
        datagen.auth_histograms_df(spark),
        DEFAULT.auth,
        DEFAULT.hist,
    )
    return alerts.collect(), {r.hist_name: r for r in updates.collect()}

def test_alert_set(result):
    alerts, _ = result
    vars_seen = sorted(a.data["atypicalVars"] for a in alerts)
    # scenario 1 → "C"; scenario 4 → "U"; scenario 6 → "S"
    assert vars_seen == ["C", "S", "U"]

def test_location_guards(result):
    alerts, _ = result
    city_alerts = [a for a in alerts if "C" in a.data["atypicalVars"]]
    assert len(city_alerts) == 1
    assert city_alerts[0].data["atypicalCities"] == "Rio de Janeiro/Brazil"
    # near-known (scenario 2) and whitelisted-reverse (3) did NOT alert
    assert all("New York" not in a.data["atypicalCities"] for a in alerts)

def test_ua_and_service_events(result):
    alerts, _ = result
    ua = [a for a in alerts if a.data["atypicalVars"] == "U"][0]
    assert ua.data["atypicalUserAgents"] == "Other/curl"
    svc = [a for a in alerts if a.data["atypicalVars"] == "S"][0]
    assert svc.data["atypicalServices"] == "vpn2/rdp"

def test_unknown_user_learns_only(result):
    alerts, updates = result
    assert all(a.data["userName"] != "bob" for a in alerts)
    assert "HIST20-bob" in updates  # learned
    assert updates["HIST20-bob"].size == 1

def test_state_updates_shapes(result):
    _, updates = result
    # alice: 5 city-bearing records → HIST20 batch size 5 with shares
    h20 = updates["HIST20-alice"]
    assert h20.size == 5
    assert sum(h20.values.values()) == pytest.approx(1.0)
    # labels carried for coords ("city/country")
    assert h20.labels["-22.90,-43.20"] == "Rio_de_Janeiro/Brazil"
    assert "HIST21-alice" in updates and "HIST22-alice" in updates

def test_ua_family_expression(spark):
    df = spark.createDataFrame(
        [
            ("Mozilla/5.0 (Windows NT 10.0) Chrome/120.0 Safari/537.36",),
            ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15) Safari/605.1",),
            ("curl/7.79.1",),
            ("",),
        ],
        "ua string",
    )
    got = [r.f for r in df.select(ua_family("ua").alias("f")).collect()]
    assert got == ["Windows/Chrome", "Mac OS X/Safari", "Other/curl", ""]
