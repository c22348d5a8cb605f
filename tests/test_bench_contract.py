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
