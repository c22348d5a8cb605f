"""Throughput-test the streaming auth detector, with and without the
cached UA-cardinality probe.

Stages sf-derived synthetic auth records (the hz_auth oracle's
scenario mapping) as N parquet files, drains them through
`streaming/auth_stream.start_auth_stream` one file per micro-batch
against pre-seeded HIST20/21/22 state, and prints ONE JSON line with
the drain wall-clock for `ua_probe_every=1` (the old probe-per-batch
behavior) vs the default cached probe — the evidence for whether the
per-batch HLL pass matters.

Usage: python tools/auth_stream_throughput.py [sf_dir] [n_chunks]
  sf_dir    default /root/testdata/sf0.1
  n_chunks  default 20
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    import __spark_entry__ as E
    from hogzilla_spark import get_spark
    from hogzilla_spark.state import store
    from hogzilla_spark.streaming.auth_stream import start_auth_stream

    spark = get_spark(app_name="auth_stream_throughput")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="auth_tp_")
    try:
        auth = E._synth_auth(spark, sf_dir)
        n_rec = auth.count()
        auth.repartition(n_chunks).write.parquet(f"{work}/staged")

        def seed_state(path: str) -> None:
            # mature per-user state so scoring (not just learning) runs
            from pyspark.sql import functions as F

            users = auth.select("userName").distinct()
            rows = []
            for fam, vals in (
                ("HIST20", {E._AUTH_SAVED_COORDS: 1.0}),
                ("HIST21", {"Windows/Chrome": 1.0}),
                ("HIST22", {"vpn1/ssh": 1.0}),
            ):
                rows.append(
                    users.select(
                        F.concat(F.lit(fam + "-"), "userName").alias("hist_name"),
                        F.lit(20).cast("long").alias("size"),
                        F.create_map(
                            *[x for kv in vals.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
                        ).alias("values"),
                        F.create_map().cast("map<string,string>").alias("labels"),
                    )
                )
            df = rows[0]
            for r in rows[1:]:
                df = df.unionByName(r)
            store.save(df, path)

        results = {}
        # throwaway warmup drain: whichever configuration runs first
        # would otherwise absorb one-time JVM/codegen/parquet-reader
        # warmup and the A/B would misattribute it to the probe cache
        seed_state(f"{work}/state_warm")
        start_auth_stream(
            spark, f"{work}/staged", f"{work}/state_warm",
            f"{work}/alerts_warm", f"{work}/ckpt_warm",
            trigger={"availableNow": True}, ua_probe_every=1,
            max_files_per_trigger=max(1, n_chunks // 2),
        ).awaitTermination(1800)
        for label, every in (("probe_per_batch", 1), ("probe_cached", 10)):
            state = f"{work}/state_{label}"
            seed_state(state)
            t0 = time.time()
            q = start_auth_stream(
                spark,
                f"{work}/staged",
                state,
                f"{work}/alerts_{label}",
                f"{work}/ckpt_{label}",
                trigger={"availableNow": True},
                ua_probe_every=every,
                max_files_per_trigger=1,
            )
            q.awaitTermination(1800)
            dt = time.time() - t0
            n_batches = len(q.recentProgress)
            results[label] = {
                "drain_sec": round(dt, 2),
                "batches": n_batches,
                "rows_per_sec": round(n_rec / dt, 1),
            }
        print(
            json.dumps(
                {
                    "metric": "auth_stream_throughput",
                    "sf_dir": sf_dir,
                    "records": n_rec,
                    "chunks": n_chunks,
                    **results,
                    "speedup": round(
                        results["probe_per_batch"]["drain_sec"]
                        / results["probe_cached"]["drain_sec"],
                        3,
                    ),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
