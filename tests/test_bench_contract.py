"""Pins the bench.py stdout contract the driver depends on.

Round-7 regression: the per-query IO map was folded into the same JSON
line as the wallclock summary, the line outgrew the driver's stdout
tail-capture window, and BENCH_r07.json recorded parsed:null.  This test
runs bench.py as a subprocess on two tiny queries and asserts:

1. the LAST stdout line parses as JSON with exactly the summary schema
   {"metric","value","unit","queries","sf"} (no "io" key — IO goes on
   its own earlier line), and
2. that line stays compact (well under any plausible tail window).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

def test_bench_last_line_is_compact_summary():
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env["SPARK_GRAFT_QUERIES"] = "a_rollups,dedup_exact"
    env["SPARK_GRAFT_CPUS"] = "4"
    env["SPARK_DRIVER_MEMORY"] = "2g"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert lines, "bench produced no stdout"

    summary = json.loads(lines[-1])
    assert set(summary) == {"metric", "value", "unit", "queries", "sf"}
    assert summary["metric"] == "full_query_suite_wallclock"
    assert summary["unit"] == "sec"
    assert set(summary["queries"]) == {"a_rollups", "dedup_exact"}
    assert all(t > 0 for t in summary["queries"].values())
    assert summary["value"] > 0
    # the full 50-query suite adds ~45 more {name: sec} pairs (~30 B
    # each); assert enough headroom that the real artifact stays far
    # below a 4 KiB tail window
    assert len(lines[-1]) + 50 * 40 < 4096

    # if IO metrics were captured they are on their own earlier line
    io_lines = [
        json.loads(ln)
        for ln in lines[:-1]
        if ln.startswith("{") and '"full_query_suite_io"' in ln
    ]
    for io in io_lines:
        assert set(io["io"]) == {"a_rollups", "dedup_exact"}


def test_bench_remeasure_and_artifact_isolation(tmp_path):
    """Pins the r10 additions in one subprocess run:

    1. variance attribution: a query >1.5× over its BENCH_PRIOR_sf*
       entry is re-run and the IO line carries a "remeasure" map with
       {in_suite, retry, prior} (+ io deltas) per outlier;
    2. artifact isolation: a run at a NON-graded scale must write
       neither BENCH_IO.json nor (on a subset run) BENCH_PRIOR_sf*.json
       into the state dir — the r9 fix (90f54ab) as a test, not lore.
    """
    state = tmp_path / "state"
    state.mkdir()
    # a prior low enough that both queries trip the 1.5× outlier test
    (state / "BENCH_PRIOR_sf0.001.json").write_text(
        json.dumps(
            {
                "metric": "bench_prior",
                "sf": "0.001",
                "queries": {"a_rollups": 0.001, "dedup_exact": 0.001},
            }
        )
    )
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env["SPARK_GRAFT_QUERIES"] = "a_rollups,dedup_exact"
    env["SPARK_GRAFT_CPUS"] = "4"
    env["SPARK_DRIVER_MEMORY"] = "2g"
    env["SPARK_GRAFT_STATE_DIR"] = str(state)
    env["SPARK_GRAFT_REMEASURE_FLOOR"] = "0.0"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]

    # last line: unchanged driver summary schema (remeasure never leaks in)
    summary = json.loads(lines[-1])
    assert set(summary) == {"metric", "value", "unit", "queries", "sf"}

    io_lines = [
        json.loads(ln)
        for ln in lines[:-1]
        if ln.startswith("{") and '"full_query_suite_io"' in ln
    ]
    assert io_lines, "IO line missing"
    rem = io_lines[-1].get("remeasure", {})
    assert set(rem) == {"a_rollups", "dedup_exact"}
    for entry in rem.values():
        assert {"in_suite", "retry", "prior"} <= set(entry)
        assert entry["prior"] == 0.001
        assert entry["retry"] > 0

    # isolation: nothing written at a non-graded scale / subset run
    written = {p.name for p in state.iterdir()}
    assert written == {"BENCH_PRIOR_sf0.001.json"}
    # and the prior was not overwritten by the subset run
    prior = json.loads((state / "BENCH_PRIOR_sf0.001.json").read_text())
    assert prior["queries"]["a_rollups"] == 0.001


def test_prior_min_envelope_fold():
    """r12 verdict task 6: the prior file is a per-query MINIMUM
    envelope maintained by bench.py itself (metric
    bench_prior_min_envelope) — each run folds in element-wise, retries
    count as observations, errored (-1) timings never fold."""
    sys.path.insert(0, REPO)
    from bench import _fold_envelope

    prior = {"a": 1.0, "b": 0.5, "gone": 2.0}
    timings = {"a": 0.8, "b": 0.9, "c": 3.0, "d": -1.0}
    remeasure = {"b": {"retry": 0.4}, "c": {"retry": -1.0}}
    env = _fold_envelope(prior, timings, remeasure)
    assert env["a"] == 0.8          # run beat prior
    assert env["b"] == 0.4          # retry beat both
    assert env["c"] == 3.0          # new query enters at its first time
    assert "d" not in env           # errored run never folds
    assert env["gone"] == 2.0       # dropped-from-run queries keep prior
    # committed artifacts carry the envelope metric name
    import json as _json
    import os as _os

    for name in _os.listdir(REPO):
        if name.startswith("BENCH_PRIOR_sf") and name.endswith(".json"):
            d = _json.load(open(_os.path.join(REPO, name)))
            assert d["metric"] == "bench_prior_min_envelope", name


def test_drifted_two_tier():
    """Tier 1: >1.5x over prior above the floor.  Tier 2 (r11 verdict
    task 5): sub-2s priors retry at >1.2x so ambient-noise drifts are
    attributed in the record instead of left for a judge to re-derive."""
    sys.path.insert(0, REPO)
    from bench import _drifted

    assert _drifted(3.2, 2.0, 1.0)            # tier 1: 1.6x
    assert not _drifted(4.0, 3.0, 1.0)        # 1.33x on a big query: no
    assert _drifted(1.07, 0.84, 1.0)          # tier 2: m5_taint's r11 drift
    assert _drifted(1.3, 1.0, 1.0)            # tier 2: 1.3x under the floor
    assert not _drifted(1.1, 1.0, 1.0)        # 1.1x: ambient, ignored
    assert not _drifted(0.25, 0.1, 1.0)       # below the 0.3s absolute floor
    assert not _drifted(3.0, 2.5, 1.0)        # prior > 2s: tier 2 off
    assert not _drifted(5.0, 0.0, 1.0)        # no prior: nothing to compare
