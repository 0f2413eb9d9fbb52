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

from pyspark.sql import DataFrame, Window
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


def lttb_downsample(
    df: DataFrame,
    bucket_seconds: int = 21600,
    key: str = "symbol",
    time_col: str = "time",
    value_col: str = "price",
    tiebreak: str = "trade_id",
) -> DataFrame:
    """LTTB-style downsampling, fixed-anchor variant: one point per
    (key, bucket), chosen to maximize the triangle area against the
    neighboring buckets' average points.

    True LTTB (Steinarsson 2013) anchors the triangle on the
    *previously selected* point — a sequential dependency that would
    force a per-key recurrence. This variant anchors on the previous
    bucket's AVERAGE point instead (both neighbors symmetric), which
    removes the recurrence while keeping the visual property that
    selected points track extremes relative to the local trend; the
    difference from sequential LTTB is documented, not hidden.

    Plan: one hash aggregate builds per-bucket anchor averages
    (partial-agg friendly), lag/lead windows over the |key × buckets|
    aggregate attach neighbor anchors, an equi-join maps each raw
    point to its bucket's anchors, and one row_number window per
    (key, bucket) picks the max-area point — (area DESC, time, tie)
    ordering, deterministic. First/last buckets per key (no neighbor
    anchor) keep their first/last point, matching LTTB's endpoint
    rule; a key whose data spans a SINGLE bucket (both anchors NULL)
    keeps its first AND last point, collapsing to one row when the
    bucket holds a single point. Empty buckets simply don't appear;
    their neighbors anchor across the gap, the standard
    irregular-sampling behavior.
    """
    t = F.col(time_col).cast("double")
    bexp = (F.floor(t / bucket_seconds) * bucket_seconds).cast("long")
    pts = df.select(
        F.col(key),
        F.col(time_col),
        F.col(tiebreak),
        F.col(value_col),
        bexp.alias("_b"),
        t.alias("_t"),
    )
    anch = pts.groupBy(key, "_b").agg(
        F.avg("_t").alias("_at"), F.avg(value_col).alias("_ay")
    )
    wk = Window.partitionBy(key).orderBy("_b")
    anch = anch.select(
        key,
        "_b",
        F.lag("_at").over(wk).alias("_tp"),
        F.lag("_ay").over(wk).alias("_yp"),
        F.lead("_at").over(wk).alias("_tn"),
        F.lead("_ay").over(wk).alias("_yn"),
    )
    j = pts.join(anch, [key, "_b"])
    area = 0.5 * F.abs(
        (F.col("_tp") - F.col("_tn")) * (F.col(value_col) - F.col("_yp"))
        - (F.col("_tp") - F.col("_t")) * (F.col("_yn") - F.col("_yp"))
    )
    wb = Window.partitionBy(key, "_b")
    j = j.withColumn("_area", area).withColumn(
        "_n", F.count(F.lit(1)).over(wb)
    )
    mid = (
        j.filter(F.col("_tp").isNotNull() & F.col("_tn").isNotNull())
        .withColumn(
            "_rn",
            F.row_number().over(
                wb.orderBy(
                    F.col("_area").desc(), F.col(time_col), F.col(tiebreak)
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .withColumn("rule", F.lit("area"))
    )
    first = (
        j.filter(F.col("_tp").isNull())
        .withColumn(
            "_rn",
            F.row_number().over(wb.orderBy(F.col(time_col), F.col(tiebreak))),
        )
        .filter(F.col("_rn") == 1)
        .withColumn("rule", F.lit("first"))
    )
    # _tn IS NULL covers BOTH the final bucket and the single-bucket
    # key (ADVICE r2: the latter previously got no 'last' endpoint);
    # a one-point single bucket would duplicate its 'first' row, so
    # that one case is excluded rather than deduped after the fact.
    last = (
        j.filter(
            F.col("_tn").isNull()
            & ~(F.col("_tp").isNull() & (F.col("_n") == 1))
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                wb.orderBy(F.col(time_col).desc(), F.col(tiebreak).desc())
            ),
        )
        .filter(F.col("_rn") == 1)
        .withColumn("rule", F.lit("last"))
    )
    out_cols = [
        F.timestamp_seconds(F.col("_b")).alias("bucket"),
        F.col(key),
        F.col(time_col),
        F.col(tiebreak),
        F.round(F.col(value_col), 6).alias(value_col),
        F.col("rule"),
    ]
    return mid.select(*out_cols).unionByName(
        first.select(*out_cols)
    ).unionByName(last.select(*out_cols))
