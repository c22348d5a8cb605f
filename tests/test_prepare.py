"""Retention purge semantics (S16, HogPrepare.scala:48-305)."""

from hogzilla_spark.plans.prepare import (
    TIME_UNIT_MS,
    purge_flows,
    purge_sflows,
)

NOW_MS = 1_700_000_000_000

def test_flows_purge_three_zones(spark):
    rows = [
        # recent (< 1 unit old): kept regardless of events
        ("recent_noevent", NOW_MS - TIME_UNIT_MS // 2, ""),
        ("recent_event", NOW_MS - TIME_UNIT_MS // 2, "1"),
        # mid window (1..100 units): kept only with priority-1 event
        ("mid_noevent", NOW_MS - 5 * TIME_UNIT_MS, ""),
        ("mid_event", NOW_MS - 5 * TIME_UNIT_MS, "1"),
        ("mid_low_priority", NOW_MS - 5 * TIME_UNIT_MS, "2"),
        # ancient (> 100 units): always purged
        ("old_event", NOW_MS - 101 * TIME_UNIT_MS, "1"),
        ("old_noevent", NOW_MS - 101 * TIME_UNIT_MS, ""),
    ]
    df = spark.createDataFrame(
        rows, "flow_id string, first_seen long, event_priority_id string"
    )
    kept = sorted(r.flow_id for r in purge_flows(df, NOW_MS).collect())
    assert kept == ["mid_event", "recent_event", "recent_noevent"]

def test_sflows_purge_one_unit(spark):
    unit_s = TIME_UNIT_MS // 1000
    now_s = NOW_MS // 1000
    df = spark.createDataFrame(
        [("new", now_s - 10), ("old", now_s - unit_s - 10)],
        "k string, timestamp long",
    )
    kept = [r.k for r in purge_sflows(df, now_s).collect()]
    assert kept == ["new"]

def test_initiate_sensor_upsert(spark):
    from hogzilla_spark.plans.initiate import sensor_upsert

    t1 = sensor_upsert(spark, None, 1, "edge sensor", "probe-a")
    t2 = sensor_upsert(spark, t1, 2, "core sensor", "probe-b")
    t3 = sensor_upsert(spark, t2, 1, "edge sensor v2", "probe-a2")  # replace
    rows = {r.sensor_id: (r.description, r.hostname) for r in t3.collect()}
    assert rows == {1: ("edge sensor v2", "probe-a2"), 2: ("core sensor", "probe-b")}
