"""State-duration accounting over a tagged time series.

The analog of TimescaleDB toolkit's ``state_agg``/``duration_in``: given
a series where each row carries a discrete state label (here the A9
regime tag, reference sql/timescaledb_schema.sql:241-265), report per
(key, state) the total wall-clock time spent in the state, the number
of distinct episodes (maximal runs of consecutive rows in the state),
and the row count.

Semantics: a row "holds" its state until the next row's timestamp
(right-open intervals); the last row of each key contributes zero
duration because its end is unknown. An episode starts wherever the
state differs from the previous row's state (or at the first row).

Scale: one window pass per key partition (lag + lead over the same
(key, time, tiebreak) sort — a single shuffle and one in-partition
sort) followed by a hash aggregate on (key, state). State cardinality
is tiny, so the aggregate output is O(keys × states).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def state_durations(
    df: DataFrame,
    state_col: str,
    key: str = "symbol",
    time_col: str = "time",
    tiebreak: str = "trade_id",
) -> DataFrame:
    """Per (key, state): total seconds in state, episode count, rows.

    Duration math uses the fractional-seconds epoch
    (``time.cast("double")``) per the repo convention, so sub-second
    gaps are kept exactly as DuckDB's ``epoch()`` sees them.
    """
    w = Window.partitionBy(key).orderBy(time_col, tiebreak)
    ts = F.col(time_col).cast("double")
    prev_state = F.lag(state_col).over(w)
    is_start = F.when(
        prev_state.isNull() | (prev_state != F.col(state_col)), F.lit(1)
    ).otherwise(F.lit(0))
    dur = F.coalesce(F.lead(ts).over(w) - ts, F.lit(0.0))
    return (
        df.select(key, state_col, time_col, tiebreak)
        .withColumn("_is_start", is_start)
        .withColumn("_dur", dur)
        .groupBy(key, state_col)
        .agg(
            F.sum("_is_start").cast("bigint").alias("episodes"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.round(F.sum("_dur"), 6).alias("total_seconds"),
        )
    )


def gap_uptime(
    df: DataFrame,
    heartbeat_seconds: float,
    key: str = "symbol",
    time_col: str = "time",
    tiebreak: str = "trade_id",
) -> DataFrame:
    """TimescaleDB toolkit ``heartbeat_agg`` analog: treat each row as a
    liveness heartbeat; a gap ≤ ``heartbeat_seconds`` counts as "up"
    time, a longer gap is downtime (an outage). Per key: observed span,
    up seconds, outage count, and uptime share of the span.

    Same single-window shape as `state_durations`: one (key, time,
    tiebreak) sort feeds a lead(), then a hash aggregate.
    """
    w = Window.partitionBy(key).orderBy(time_col, tiebreak)
    ts = F.col(time_col).cast("double")
    gap = F.lead(ts).over(w) - ts
    up = F.when(gap <= heartbeat_seconds, gap).otherwise(F.lit(0.0))
    is_outage = F.when(gap > heartbeat_seconds, 1).otherwise(0)
    return (
        df.select(key, time_col, tiebreak)
        .withColumn("_gap", gap)
        .withColumn("_up", up)
        .withColumn("_outage", is_outage)
        .groupBy(key)
        .agg(
            F.round(F.max(ts) - F.min(ts), 6).alias("span_seconds"),
            F.round(F.sum("_up"), 6).alias("up_seconds"),
            F.sum("_outage").cast("bigint").alias("n_outages"),
            F.round(
                F.sum("_up") / F.nullif(F.max(ts) - F.min(ts), F.lit(0.0)), 6
            ).alias("uptime_ratio"),
            F.count(F.lit(1)).cast("bigint").alias("n_heartbeats"),
        )
    )
