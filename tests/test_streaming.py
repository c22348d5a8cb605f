"""Structured Streaming auth path (S17): read-once semantics replacing
the reference's destructive consume, with state merge per micro-batch."""

import pyspark.sql.functions as F

from hogzilla_spark import datagen
from hogzilla_spark.state import store
from hogzilla_spark.streaming.auth_stream import start_auth_stream

def test_auth_stream_available_now(spark, tmp_path):
    input_dir = str(tmp_path / "auth_in")
    state_path = str(tmp_path / "state")
    alerts_dir = str(tmp_path / "alerts")
    ckpt = str(tmp_path / "ckpt")

    # seed mature state and drop one batch of records into the source dir
    store.save(datagen.auth_histograms_df(spark), state_path)
    datagen.auth_df(spark).write.mode("append").parquet(input_dir)

    q = start_auth_stream(
        spark, input_dir, state_path, alerts_dir, ckpt,
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)

    alerts = spark.read.parquet(alerts_dir)
    vars_seen = sorted(r["data"]["atypicalVars"] for r in alerts.collect())
    assert vars_seen == ["C", "S", "U"]

    # state evolved: alice merged (20 + 5 city records), bob learned
    state = store.load(spark, state_path)
    sizes = {r.hist_name: r.size for r in state.collect()}
    assert sizes["HIST20-alice"] == 25
    assert sizes["HIST20-bob"] == 1

    # read-once: draining again processes nothing new
    q2 = start_auth_stream(
        spark, input_dir, state_path, alerts_dir, ckpt,
        trigger={"availableNow": True},
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(alerts_dir).count() == len(vars_seen)
