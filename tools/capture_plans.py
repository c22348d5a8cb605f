"""Capture .explain("formatted") for every registry query into
plans/<tag>/<query>_<suffix>.txt (optimization-round evidence).

Usage: python tools/capture_plans.py <tag> <suffix> [sf_dir] [only,names]

The plan is captured from the same frame the bench times (the registry
callable's return), under the engine's own get_spark() session — the
shape the noop write executes.  AQE shows the initial plan; Exchange
count / join strategy / PushedFilters are what we audit.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r12"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

    import __spark_entry__ as E
    from hogzilla_spark import get_spark

    spark = get_spark(app_name="plan_capture")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # capture the failure instead of dying
            plan = f"PLAN CAPTURE FAILED: {ex}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"captured {name}")
    spark.stop()


if __name__ == "__main__":
    main()
