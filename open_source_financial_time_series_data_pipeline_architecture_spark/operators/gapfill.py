"""Time-series gap filling + LOCF (last observation carried forward).

TimescaleDB ships `time_bucket_gapfill(...)` + `locf(...)` for exactly
this (the reference's stack; its continuous aggregates leave missing
buckets absent). Spark-first equivalent: generate the dense bucket grid
per key with `sequence()` (one row per key → explode, no driver loop),
left-join the sparse aggregate, then forward-fill with
`last(value, ignorenulls=True)` over an unbounded-preceding row frame.

Scale: the grid is |keys| × |buckets-in-range| rows — the same
cardinality the filled output must have, so nothing is materialized
beyond the answer; the forward-fill window reuses the (key) partition
the join just produced. Per-key ranges keep sparse keys from inflating
the grid to the global min/max span.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_locf(
    df: DataFrame,
    key: str | list[str],
    ts_col: str,
    value_cols: list[str],
    step_seconds: int = 60,
) -> DataFrame:
    """Densify `df` to one row per (key, step bucket) between each
    key's min and max `ts_col`, carrying each value column forward
    across the introduced gaps. Adds `is_gap` marking synthesized rows.
    ``key`` may be one column or a composite list.
    """
    keys = [key] if isinstance(key, str) else list(key)
    step = F.expr(f"INTERVAL {int(step_seconds)} SECONDS")
    # explicit presence marker: a source row whose FIRST value column is
    # NULL is still a real observation — inferring is_gap from value
    # nullity would mislabel it and LOCF would silently overwrite it
    src = df.withColumn("__present", F.lit(True))
    bounds = df.groupBy(*keys).agg(
        F.min(ts_col).alias("__mn"), F.max(ts_col).alias("__mx")
    )
    grid = bounds.select(
        *keys,
        F.explode(F.sequence(F.col("__mn"), F.col("__mx"), step)).alias(ts_col),
    )
    joined = grid.join(src, [*keys, ts_col], "left")
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = joined.withColumn("is_gap", F.col("__present").isNull())
    for c in value_cols:
        # carry forward only across synthesized rows: a real row keeps
        # its own value (including a genuine NULL)
        out = out.withColumn(
            c,
            F.when(
                F.col("is_gap"), F.last(c, ignorenulls=True).over(w)
            ).otherwise(F.col(c)),
        )
    return out.drop("__present")
