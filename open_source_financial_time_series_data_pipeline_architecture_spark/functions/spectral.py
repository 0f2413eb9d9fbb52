"""Spectral analysis: DFT periodogram over time-bucketed series.

Seasonality detection for trading activity (the classic "is volume
intraday-periodic?" question a feature pipeline answers before building
seasonal features; the reference's Smart-DB features are all
time-bucketed aggregates — sql/timescaledb_schema.sql:44-65 — and this
is the diagnostic layer above them). The Goertzel-style direct DFT at a
handful of candidate frequencies is Spark-friendly where an FFT is not:
power at frequency k is two SUMS over the series —
``(Σ x·cos(2πkt/N))² + (Σ x·sin(2πkt/N))²`` — so the whole periodogram
is one explode (|series|×K rows of three doubles) and one hash
aggregate with map-side partials. No sequential pass, no per-key
collect; K is small and fixed, N is the bar count (bounded by the time
span, not the row count — the trade→bar aggregate runs first).

Scale: O(N·K) arithmetic inside whole-stage codegen; the only shuffles
are the bar aggregate and the final (key, k) aggregate. At 100 TB the
bar grain bounds N per key to the calendar, and K is a constant.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TWO_PI = 2.0 * math.pi


def periodogram(
    series: DataFrame,
    key_col: str = "symbol",
    order_col: str = "bucket",
    value_col: str = "x",
    max_k: int = 8,
) -> DataFrame:
    """Power at frequencies k = 1..max_k per key, over a mean-centered
    series (centering removes the DC component that would otherwise
    dominate every bin). Input: one row per (key, bucket). Output:
    (key, k, n_buckets, power). Window functions are key-partitioned —
    never global."""
    w = Window.partitionBy(key_col)
    wo = w.orderBy(order_col)
    centered = (
        series.withColumn("__n", F.count(F.lit(1)).over(w))
        .withColumn("__mean", F.avg(value_col).over(w))
        .withColumn("__t", (F.row_number().over(wo) - F.lit(1)).cast("double"))
        .withColumn("__xc", F.col(value_col) - F.col("__mean"))
    )
    k = F.explode(F.sequence(F.lit(1), F.lit(max_k))).alias("k")
    angled = centered.select(
        key_col, "__n", "__t", "__xc", k
    ).withColumn(
        "__angle",
        F.lit(TWO_PI)
        * F.col("k").cast("double")
        * F.col("__t")
        / F.col("__n").cast("double"),
    )
    return (
        angled.groupBy(key_col, "k")
        .agg(
            F.max("__n").cast("bigint").alias("n_buckets"),
            F.sum(F.col("__xc") * F.cos("__angle")).alias("__sc"),
            F.sum(F.col("__xc") * F.sin("__angle")).alias("__ss"),
        )
        .select(
            key_col,
            F.col("k").cast("bigint").alias("k"),
            "n_buckets",
            (F.col("__sc") * F.col("__sc") + F.col("__ss") * F.col("__ss")).alias(
                "power"
            ),
        )
    )
