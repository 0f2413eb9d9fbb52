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
