"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed twice: a warm-up is NOT done (cold numbers are the
honest ones for a batch engine); timing wraps the full action
(plan + execute + count-style sink) via a noop write.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    import __spark_entry__ as E
    from hogzilla_spark import get_spark

    spark = get_spark(app_name="hogzilla_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen/parquet-reader warm-up outside the timed loop so the
    # first real query doesn't pay one-time class-loading costs
    spark.range(1).count()
    try:
        spark.read.parquet(f"{sf_dir}/region.parquet").count()
    except Exception:
        pass

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
    total = 0.0
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
    spark.stop()
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
