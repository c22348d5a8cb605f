"""As-of join — for each left row, the most recent right row with
right.ts ≤ left.ts within the same key (the time-series enrichment join
Spark lacks natively; SURVEY.md §2.3 lists it as absent-but-exposable).

Implementation: union-and-carry.  Both sides are tagged and unioned,
then one window per key ordered by (ts, side) carries the latest right
payload forward with ``last(..., ignorenulls)``; left rows then hold
exactly the as-of match.  Cost: ONE shuffle on the key + a sort — the
same shape as a sort-merge join, with no range-explosion, no
per-row lookups, and no driver state.  At 100 TB this beats the naive
"join then filter max-ts" (which shuffles the cross product of
key-collisions) by the full fan-out factor.

Tolerance: optional max lookback (left.ts − right.ts ≤ tolerance),
matching the common as-of semantics (pandas merge_asof, kdb aj).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance: int | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row, plus the value_cols of the
    latest right row with right_ts ≤ left_ts per key (nulls when no
    prior right row, or outside tolerance)."""
    lt = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rt = (
        right.select(
            *on,
            F.col(right_ts).alias("__rts"),
            F.struct(
                F.col(right_ts).alias("__match_ts"),
                *[F.col(c) for c in value_cols],
            ).alias("__payload"),
        )
        .withColumn("__side", F.lit(0))
        .withColumn("__ts", F.col("__rts"))
    )
    # align schemas for the union: left carries a null payload
    lt = lt.withColumn("__payload", F.lit(None).cast(rt.schema["__payload"].dataType))
    rt_full = rt.select(
        *[
            F.col(c) if c in rt.columns else F.lit(None).cast(lt.schema[c].dataType).alias(c)
            for c in lt.columns
        ]
    )
    unioned = lt.unionByName(rt_full)
    # right rows sort BEFORE left rows at equal ts (side 0 < 1), so a
    # right row at exactly left_ts is eligible — standard asof "<="
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__side") == 1)
    match_ok = F.col("__match").isNotNull()
    if tolerance is not None:
        match_ok = match_ok & (
            F.col("__ts") - F.col("__match.__match_ts") <= tolerance
        )
    cols = [c for c in left.columns]
    picked = [
        F.when(match_ok, F.col(f"__match.{c}")).alias(f"{c}{suffix}")
        for c in value_cols
    ]
    ts_col = [F.when(match_ok, F.col("__match.__match_ts")).alias(f"{right_ts}{suffix}")]
    return out.select(*cols, *ts_col, *picked)
