"""Chart/series downsampling operators.

M4 downsampling (Jugel et al., "M4: A Visualization-Oriented Time
Series Data Aggregation", VLDB 2014): per (key, time bucket) keep the
first, last, min and max points — the four rows that make a line-chart
rendering of the bucket pixel-identical to the full series. This is
the standard dashboard-serving downsample for tick data; the reference
serves the same need through its 1-minute continuous aggregates
(reference sql/timescaledb_schema.sql:44-57) but drops the extreme
points' *timestamps*, which M4 preserves.

Scale: ONE hash aggregate over (key, bucket) — no window, no sort, no
shuffle beyond the aggregation itself; partial aggregation (map-side
combine) applies, so at 100 TB the shuffle carries only
O(buckets × keys) pre-aggregated rows.

Determinism: every arg-extreme is resolved through a struct ordering
key that ends in (time, tiebreak), so equal prices inside a bucket
pick the earliest (time, trade_id) point on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def m4_downsample(
    df: DataFrame,
    bucket_seconds: int = 300,
    key: str = "symbol",
    time_col: str = "time",
    value_col: str = "price",
    tiebreak: str = "trade_id",
) -> DataFrame:
    """M4: (first, min, max, last) points per (key, bucket).

    The min/max point timestamps use ``min_by`` over a struct ordering
    key — ``(value, time, tie)`` for the minimum and
    ``(-value, time, tie)`` for the maximum — so ties select the
    earliest point deterministically. (Negation is safe for the
    ordering: Spark compares -0.0 and 0.0 as equal, so a zero price
    still falls through to the time tiebreak.)
    """
    t, v, k = F.col(time_col), F.col(value_col), F.col(key)
    bucket = F.timestamp_seconds(
        (F.floor(t.cast("double") / bucket_seconds) * bucket_seconds).cast(
            "long"
        )
    ).alias("bucket")
    order_first = F.struct(t, F.col(tiebreak))
    order_min = F.struct(v, t, F.col(tiebreak))
    order_max = F.struct((-v).alias(value_col), t, F.col(tiebreak))
    return (
        df.groupBy(bucket, k)
        .agg(
            F.min_by(t, order_first).alias("t_first"),
            F.round(F.min_by(v, order_first), 6).alias("v_first"),
            F.min_by(t, order_min).alias("t_min"),
            F.round(F.min(v), 6).alias("v_min"),
            F.min_by(t, order_max).alias("t_max"),
            F.round(F.max(v), 6).alias("v_max"),
            F.max_by(t, order_first).alias("t_last"),
            F.round(F.max_by(v, order_first), 6).alias("v_last"),
            F.count(F.lit(1)).alias("n_points"),
        )
    )
