"""Custom stateful streaming operator: per-entity histogram
learn-and-score via ``applyInPandasWithState``.

This is the reference engine's histogram cycle — learn a per-entity
key distribution, gate on minimum evidence, then alert on keys the
entity has never (or rarely) produced — run as a TRUE streaming
stateful operator instead of the batch join+merge
(`detectors/stateful.py`) or the foreachBatch store
(`streaming/auth_stream.py`).  Reference semantics:
``HogHBaseHistogram.atypical`` + the learn gates
(/root/reference/src/org/hogzilla/histogram/HogHBaseHistogram.scala:79-96,
src/org/hogzilla/auth/HogAuth.scala:150-176).

Spark-first shape: Structured Streaming shuffles each micro-batch by
the entity key and hands every key's rows to the operator with that
key's state — state lives in the checkpointed state store (RocksDB at
scale), so entity count scales with the cluster, not the driver, and
a restart resumes mid-stream with no replayed alerts.

State schema holds the histogram as parallel arrays (keys,
counts, total) because state structs cannot carry maps; the merge is
numpy-side per micro-batch — per-key batch sizes are micro-batch
sized, so the Python cost is bounded by arrival rate, not corpus size.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ALERT_SCHEMA = T.StructType(
    [
        T.StructField("entity", T.StringType()),
        T.StructField("bucket", T.StringType()),
        T.StructField("ratio", T.DoubleType()),
        T.StructField("seen_total", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("keys", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("total", T.LongType()),
    ]
)

def _score_and_learn(
    key: Any,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """One entity's micro-batch: score each bucket against the learned
    histogram (alert when ratio < threshold AFTER the learn gate), then
    fold the batch into state.  Scoring precedes learning, so a burst
    of a brand-new bucket alerts on its first row only."""
    if state.exists:
        keys, counts, total = state.get
        hist = dict(zip(keys, counts))
    else:
        hist, total = {}, 0
    out_e, out_b, out_r, out_t = [], [], [], []
    # thresholds ride in the rows (constant per stream); defaults match
    # the reference's HIST01 gate
    learn_gate, threshold = 100, 0.05
    for pdf in pdfs:
        if len(pdf) and "learn_gate" in pdf.columns:
            learn_gate = int(pdf["learn_gate"].iloc[0])
            threshold = float(pdf["threshold"].iloc[0])
        for bucket in pdf["bucket"]:
            if total >= learn_gate:
                ratio = hist.get(bucket, 0) / total
                if ratio < threshold:
                    out_e.append(str(key[0]))
                    out_b.append(bucket)
                    out_r.append(round(ratio, 6))
                    out_t.append(total)
            hist[bucket] = hist.get(bucket, 0) + 1
            total += 1
    state.update((list(hist.keys()), [int(v) for v in hist.values()], total))
    if out_e:
        yield pd.DataFrame(
            {"entity": out_e, "bucket": out_b, "ratio": out_r, "seen_total": out_t}
        )

def streaming_histogram_scores(
    stream_df: DataFrame,
    entity_col: str = "entity",
    bucket_col: str = "bucket",
    learn_gate: int = 100,
    threshold: float = 0.05,
) -> DataFrame:
    """Per-entity streaming anomaly scores with persistent histogram
    state.  Input: a streaming frame with (entity, bucket) rows.
    Output (update mode): one alert row per atypical observation."""
    from pyspark.sql import functions as F

    prepared = stream_df.select(
        F.col(entity_col).cast("string").alias("entity"),
        F.col(bucket_col).cast("string").alias("bucket"),
        F.lit(learn_gate).alias("learn_gate"),
        F.lit(threshold).alias("threshold"),
    )
    return prepared.groupBy("entity").applyInPandasWithState(
        _score_and_learn,
        outputStructType=ALERT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
