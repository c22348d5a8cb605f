"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract: the LAST stdout line is a compact JSON summary
{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...} sized to fit the driver's stdout
tail-capture window.  Per-query shuffle/spill IO metrics print on their
own EARLIER line (metric "full_query_suite_io") and are mirrored to
BENCH_IO.json.  tests/test_bench_contract.py pins this schema.

Each query is timed ONCE (cold numbers are the honest ones for a batch
engine); timing wraps the full action (plan + execute + count-style
sink) via a noop write.  One-time JVM/codegen/JIT cost is paid by an
untimed warm-up that exercises the heavy execution paths BEFORE the
suite, so the first registry slot doesn't absorb it (r9: the first
query read 8.75 s in-suite vs ~3 s warm).

Variance attribution (r9 verdict task 3): after the suite, any query
whose in-suite time exceeds its committed prior (BENCH_PRIOR_sf*.json)
by >1.5× is re-measured in the same process; both numbers and both IO
deltas go into the "remeasure" key of the IO line, so a host-variance
episode carries its own evidence instead of needing a hand-assembled
case.

Prior semantics (r12 verdict task 6): BENCH_PRIOR_sf*.json is a
per-query MINIMUM ENVELOPE — each full-suite run folds its timings in
element-wise (new = min(old, this run)), so the file converges on the
quietest observed time per query.  This host shows bursty co-tenant
CPU steal (r12 measured ~2.4 s of steal over a 2.4 s idle interval),
and a single-run prior recorded inside a steal window would suppress
the very drift attribution the prior exists for.  A too-low prior only
costs bounded cheap retries; reported timings are never replaced.
bench.py itself maintains the envelope (metric
"bench_prior_min_envelope"); tests/test_bench_contract.py pins it.
"""

from __future__ import annotations

import json
import os
import sys
import time

def _fold_envelope(
    prior: dict[str, float],
    timings: dict[str, float],
    remeasure: dict[str, dict] | None = None,
) -> dict[str, float]:
    """Element-wise minimum of the committed prior, this run's in-suite
    timings, and any remeasure retries (each a valid observation of the
    same query in the same process).  Non-positive timings (errored
    queries) never fold in."""
    envelope = dict(prior)
    def fold(name: str, t: float) -> None:
        if t and t > 0 and (envelope.get(name, 0) <= 0 or t < envelope[name]):
            envelope[name] = t
    for name, t in timings.items():
        fold(name, t)
    for name, entry in (remeasure or {}).items():
        fold(name, entry.get("retry", -1.0))
    return envelope

def _drifted(t: float, p: float, floor: float) -> bool:
    """Should a query at in-suite time ``t`` with committed prior ``p``
    be re-measured?  Tier 1: the classic >1.5x regression above the
    env floor.  Tier 2: sub-2s queries sit in ambient-noise territory
    where host variance alone produces 1.2-1.3x drifts the 1.5x trigger
    never catches (r11: m5_taint 1.27x, a_rollups 1.21x read as
    unexplained) — retry those at a tighter trigger so the record
    attributes the drift itself; a tier-2 retry costs <2s by definition."""
    if p <= 0:
        return False
    if t > floor and t > 1.5 * p:
        return True
    return p <= 2.0 and t > 0.3 and t > 1.2 * p

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    import __spark_entry__ as E
    from hogzilla_spark import get_spark

    # the engine ships with the UI off; the bench enables it to read
    # per-stage shuffle/spill totals from the status REST API, so the
    # artifact records WHY a query is slow (spill regime vs plan
    # regression), not just wall-clock.  retainedStages is raised so
    # cumulative diffs stay exact across the 50-query run — but task
    # and SQL-execution retention are cut to the bone: with the
    # defaults (100k tasks) the in-memory status store grows by every
    # task row of the whole suite and the listener/GC overhead
    # MEASURABLY bleeds into query wall-clock (sf1 suite 326-385 s with
    # default retention vs 234-242 s with tasks=1 or the UI off — the
    # stage-level sums this harness reads are identical either way).
    spark = get_spark(
        app_name="hogzilla_bench",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100",
            "spark.ui.retainedTasks": "1",
            "spark.sql.ui.retainedExecutions": "10",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def stage_totals() -> dict[str, float] | None:
        """Cumulative completed-stage metric sums from the REST API
        (None if the UI is unreachable — the bench never fails on
        missing metrics)."""
        import urllib.request

        base = spark.sparkContext.uiWebUrl
        if not base:
            return None
        try:
            with urllib.request.urlopen(
                f"{base}/api/v1/applications", timeout=5
            ) as r:
                apps = json.load(r)
            app_id = apps[0]["id"]
            with urllib.request.urlopen(
                f"{base}/api/v1/applications/{app_id}/stages?status=complete",
                timeout=10,
            ) as r:
                stages = json.load(r)
        except Exception:
            return None
        out = {k: 0.0 for k in (
            "shuffle_write_mb", "shuffle_read_mb", "spill_mem_mb", "spill_disk_mb"
        )}
        mb = 1024.0 * 1024.0
        for st in stages:
            out["shuffle_write_mb"] += st.get("shuffleWriteBytes", 0) / mb
            out["shuffle_read_mb"] += st.get("shuffleReadBytes", 0) / mb
            out["spill_mem_mb"] += st.get("memoryBytesSpilled", 0) / mb
            out["spill_disk_mb"] += st.get("diskBytesSpilled", 0) / mb
        return out

    # JVM/codegen/parquet-reader warm-up outside the timed loop so the
    # first real query doesn't pay one-time class-loading costs
    spark.range(1).count()
    try:
        spark.read.parquet(f"{sf_dir}/region.parquet").count()
    except Exception:
        pass
    # untimed JIT warm-up of the heavy execution paths — hash aggregate,
    # broadcast hash join, sort-merge join, window, noop sink — so
    # whole-stage-codegen compilation and JIT tiering are paid before
    # the first timed query instead of inside it
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = spark.range(0, 200_000).select(
        "id",
        (F.col("id") % 97).alias("k"),
        (F.col("id") % 7).cast("string").alias("g"),
    )
    agg = w.groupBy("k").agg(F.count(F.lit(1)).alias("c"), F.sum("id").alias("s"))
    bhj = agg.join(F.broadcast(agg.select("k")), "k")
    win = bhj.withColumn(
        "r", F.row_number().over(Window.partitionBy("c").orderBy(F.col("s").desc()))
    )
    win.filter(F.col("r") <= 5).write.format("noop").mode("overwrite").save()
    w.alias("a").join(w.alias("b").hint("merge"), "id").write.format(
        "noop"
    ).mode("overwrite").save()

    # Optional subset: comma-separated names in $SPARK_GRAFT_QUERIES
    # (scale sweeps bench the linear family at sfs where the declared
    # quadratic members would dominate wall-clock).  Unset = full
    # suite, exactly the driver's contract.
    only = {
        q.strip()
        for q in os.environ.get("SPARK_GRAFT_QUERIES", "").split(",")
        if q.strip()
    }
    registry = E.queries()
    unknown = only - set(registry)
    if unknown:  # a typo'd name silently skipped = a sweep that lies
        raise SystemExit(f"SPARK_GRAFT_QUERIES not in registry: {sorted(unknown)}")
    timings: dict[str, float] = {}
    io: dict[str, dict[str, float]] = {}
    total = 0.0
    before = stage_totals()
    for name, fn in registry.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            # force full execution without driver materialization cost
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
        except Exception as ex:  # keep the bench running; report the failure
            print(f"bench error in {name}: {ex}", file=sys.stderr)
            dt = -1.0
        timings[name] = round(dt, 3)
        if dt > 0:
            total += dt
        # the status store is fed by an async listener bus — the last
        # stages of a finished job can land after the action returns.
        # Poll until two consecutive reads agree so a query's shuffle
        # isn't attributed to the next query.
        after = stage_totals()
        for _ in range(10):
            time.sleep(0.1)
            nxt = stage_totals()
            if nxt == after:
                break
            after = nxt
        if before is not None and after is not None:
            io[name] = {k: round(after[k] - before[k], 2) for k in after}
        before = after

    # --- variance attribution (r9 verdict task 3) ---------------------
    # A query >1.5× over its committed prior is re-measured in the same
    # process; a genuine plan/size regression reproduces on the retry
    # (and moves shuffle bytes), ambient host variance collapses.
    # artifact dir: the repo root in production; tests point it at a
    # tmp dir so contract runs can't clobber committed artifacts
    state_dir = os.environ.get(
        "SPARK_GRAFT_STATE_DIR", os.path.dirname(os.path.abspath(__file__))
    )
    prior_path = os.path.join(state_dir, f"BENCH_PRIOR_sf{sf}.json")
    floor = float(os.environ.get("SPARK_GRAFT_REMEASURE_FLOOR", "1.0"))
    prior: dict[str, float] = {}
    try:
        with open(prior_path) as f:
            prior = json.load(f).get("queries", {})
    except (OSError, ValueError):
        pass
    remeasure: dict[str, dict] = {}
    outliers = sorted(
        (n for n, t in timings.items() if _drifted(timings[n], prior.get(n, 0), floor)),
        key=lambda n: timings[n] / prior[n],
        reverse=True,
    )[:8]  # bound the retry budget
    for name in outliers:
        t0 = time.time()
        try:
            registry[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = round(time.time() - t0, 3)
        except Exception:
            dt = -1.0
        after = stage_totals()
        for _ in range(10):
            time.sleep(0.1)
            nxt = stage_totals()
            if nxt == after:
                break
            after = nxt
        entry = {
            "in_suite": timings[name],
            "retry": dt,
            "prior": prior[name],
            "io_in_suite": io.get(name),
        }
        if before is not None and after is not None:
            entry["io_retry"] = {k: round(after[k] - before[k], 2) for k in after}
        before = after
        remeasure[name] = entry
    spark.stop()
    # fold this run into the min-envelope prior (full suite only — a
    # subset sweep would record misleadingly warm numbers).  Retry
    # timings from the remeasure pass fold in too: a retry is a valid
    # observation of the same query in the same process.
    if not only:
        envelope = _fold_envelope(prior, timings, remeasure)
        try:
            with open(prior_path, "w") as f:
                json.dump(
                    {
                        "metric": "bench_prior_min_envelope",
                        "sf": sf,
                        "queries": envelope,
                    },
                    f,
                )
                f.write("\n")
        except OSError:
            pass
    # Two-line output contract (r7 verdict: a single line holding both the
    # wallclock summary AND the per-query IO map outgrew the driver's
    # stdout tail-capture window and BENCH_r07.json recorded parsed:null).
    # The IO metrics go on their OWN earlier line (+ a side file for the
    # scale ledger); the LAST stdout line is always the compact
    # {"metric","value","unit","queries","sf"} summary the driver parses.
    if io:
        io_obj = {"metric": "full_query_suite_io", "unit": "MiB", "io": io}
        if remeasure:
            io_obj["remeasure"] = remeasure
        io_line = json.dumps(io_obj)
        print(io_line)
        # side-file mirror ONLY for full-suite runs AT THE GRADED SCALE
        # (sf0.1): a subset sweep (SPARK_GRAFT_QUERIES — incl. the
        # contract test's 2-query run) or a scale-ladder run at another
        # sf must not clobber the committed graded-scale artifact (an
        # sf0.01 run once rode into a commit via a stale working tree;
        # ladder IO maps live inside BENCH_sf*.json instead)
        if not only and sf == "0.1":
            try:
                with open(os.path.join(state_dir, "BENCH_IO.json"), "w") as f:
                    f.write(io_line + "\n")
            except OSError:
                pass
    print(
        json.dumps(
            {
                "metric": "full_query_suite_wallclock",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )

if __name__ == "__main__":
    main()
