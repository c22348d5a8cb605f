"""End-to-end full-batch test: the Hogzilla.main-equivalent DAG with
sFlow + ML modules + histogram clustering in one pass."""

import pyspark.sql.functions as F

from hogzilla_spark import datagen
from hogzilla_spark.plans.batch import run_full_batch

def test_full_batch_all_modules(spark):
    hists = datagen.histograms_df(spark)
    result = run_full_batch(
        spark,
        datagen.sflows_df(spark),
        datagen.mynets_df(spark),
        datagen.reputation_df(spark),
        hists,
        flows=datagen.flows_df(spark),
        rf_numeric_cols=["bytes", "packets", "flow_duration"],
        rf_char_cols=["detected_protocol"],
    )
    sig_counts = {
        r.signature_id: r.n
        for r in result.alerts.groupBy("signature_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # stateless + stateful + ML alert families all present
    assert sig_counts[826001012] == 1  # dns tunnel
    assert sig_counts[826001003] == 1  # atypical tcp port (state-scored)
    assert sig_counts[826000001] >= 5  # dns k-means taint + RF (id collision kept)
    # state updates cover every touched family
    fams = {
        r.hist_name.split("-")[0]
        for r in result.state_updates.select("hist_name").collect()
    }
    assert {"HIST01", "HIST02", "HIST03", "HIST04", "HIST05", "HIST06", "HIST07", "HIST08"} <= fams
    assert [tuple(r) for r in result.inventory.collect()] == [("10.1.0.130", "Linux")]

def test_disable_flags_skip_detectors(spark):
    from dataclasses import replace

    from hogzilla_spark.config import DEFAULT, EngineConfig
    from hogzilla_spark.plans.batch import run_sflow_batch

    cfg = EngineConfig(
        sflow=replace(DEFAULT.sflow, disabled=frozenset({"dns_tunnel", "ddos"})),
        auth=DEFAULT.auth, hist=DEFAULT.hist, ml=DEFAULT.ml,
    )
    r = run_sflow_batch(
        spark,
        datagen.sflows_df(spark),
        datagen.mynets_df(spark),
        datagen.reputation_df(spark),
        datagen.histograms_df(spark),
        cfg=cfg,
    )
    assert "dns_tunnel" not in r.per_detector and "ddos" not in r.per_detector
    sigs = {row.signature_id for row in r.alerts.select("signature_id").distinct().collect()}
    assert 826001012 not in sigs and 826001016 not in sigs
    assert 826001013 in sigs  # icmp tunnel still runs
