"""The 11-feature "Smart-DB" library as pure DataFrame → DataFrame functions.

Each function re-expresses one feature of the reference contract
(/root/reference/sql/smartdb_contract.md:16-119) Spark-first: built-in
``pyspark.sql.functions`` (JVM-side, whole-stage codegen) everywhere the
semantics allow; the single genuine recurrence (EWM) drops to an
Arrow-batched ``applyInPandas``.

Scale notes (100 TB design):
- Bucketed aggregations (`ohlc`, `vwap`, `trade_imbalance`,
  `volatility`) are plain ``groupBy`` — Catalyst plans a map-side
  partial aggregate, so the shuffle carries one row per
  (bucket, symbol), not per trade. Cardinality ≈ symbols × buckets —
  tiny relative to input even at 100 TB.
- Window features (`sma`, `ewm`) shuffle once on ``symbol`` and sort
  within partitions. Symbols parallelize; a single hyper-liquid symbol
  is the skew limit (AQE skew handling + per-day sub-windows are the
  documented scale path).
- `large_trade_flags` computes a per-symbol p95 (a few rows) and joins
  it back via **broadcast** — no second shuffle of the fact table.
- All functions accept any DataFrame with the canonical trades columns;
  they never collect to the driver.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Deterministic intra-key ordering: `time` has microsecond precision but
# ties are still possible; trade_id (unique) breaks them identically in
# Spark and in the DuckDB oracle (`ORDER BY time, trade_id`).
def _order():
    return [F.col("time").asc(), F.col("trade_id").asc()]


def time_bucket(col: Column | str, seconds: int) -> Column:
    """Epoch-aligned fixed-width bucket, matching DuckDB ``time_bucket``.

    Replaces TimescaleDB ``time_bucket('5 minutes', time)``
    (/root/reference/sql/timescaledb_schema.sql:165). Plain arithmetic —
    codegen-friendly, groupable, and identical across engines (both
    align to the Unix epoch for sub-day widths).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_seconds(F.floor(F.unix_timestamp(c) / seconds).cast("long") * seconds)


def ohlc(trades: DataFrame, bucket_seconds: int = 60) -> DataFrame:
    """A1 — per (bucket, symbol): open/high/low/close, volume, count.

    Reference: continuous aggregate ``ohlc_1m_agg``
    (/root/reference/sql/timescaledb_schema.sql:44-57). Open/close use
    ``min_by/max_by(price, (time, trade_id))`` — exact ordered-first/last
    without a sort, computed inside the hash aggregate.
    """
    # min_by/max_by need a single orderable key; pack (time, trade_id)
    # into a struct for lexicographic comparison.
    tkey = F.struct(F.col("time"), F.col("trade_id"))
    return (
        trades.groupBy(
            time_bucket("time", bucket_seconds).alias("bucket"),
            "symbol",
        )
        .agg(
            F.min_by("price", tkey).alias("open"),
            F.max("price").alias("high"),
            F.min("price").alias("low"),
            F.max_by("price", tkey).alias("close"),
            F.sum("volume").alias("volume"),
            F.count(F.lit(1)).alias("trade_count"),
        )
    )


def bar_rollup(bars: DataFrame, to_seconds: int = 300) -> DataFrame:
    """Hierarchical bar rollup: coarser OHLC bars aggregated FROM finer
    bars, not from raw trades — TimescaleDB's continuous-aggregate-on-
    continuous-aggregate pattern (reference sql/timescaledb_schema.sql's
    cagg hierarchy; 1m bars feed 5m/1h rollups without re-reading the
    hypertable).

    open/close pick the earliest/latest child bar's open/close via
    ``min_by/max_by(col, bucket)`` (child buckets are unique per symbol,
    so no tiebreak needed); high/low/volume/trade_count compose
    associatively.

    Scale: this is THE way to maintain multi-resolution bars at 100 TB —
    the 5m rollup reads |1m bars| rows (~1/60th of trades), and each
    coarser level reads the level below. One hash aggregate, partial
    aggregation map-side; no window, no sort.
    """
    return (
        bars.groupBy(
            time_bucket("bucket", to_seconds).alias("bucket"),
            "symbol",
        )
        .agg(
            F.min_by("open", "bucket").alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", "bucket").alias("close"),
            F.sum("volume").alias("volume"),
            F.sum("trade_count").alias("trade_count"),
        )
    )


def sma(trades: DataFrame, n: int = 20) -> DataFrame:
    """A2 — n-row trailing mean of price per symbol, ordered by time.

    Canonical semantics = the reference's Spark batch job
    (/root/reference/spark/batch_feature_calculation.py:43-49,
    ``rowsBetween(-19, 0)``); the contract's own oracle is "vs Spark
    offline calculation" (/root/reference/sql/smartdb_contract.md:47).
    """
    w = Window.partitionBy("symbol").orderBy(*_order()).rowsBetween(-(n - 1), 0)
    return trades.select(
        "time",
        "symbol",
        "trade_id",
        "price",
        F.avg("price").over(w).alias(f"sma_{n}"),
    )


def _ewm_fn(alpha: float, out_col: str):
    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["time", "trade_id"]).reset_index(drop=True)
        # Explicit recurrence acc = α·x + (1−α)·acc (seed = first price):
        # bit-identical to the DuckDB list_reduce oracle fold, unlike
        # pandas .ewm() whose internal weighting can differ in ulps.
        acc = None
        out = []
        for x in pdf["price"].to_numpy():
            acc = float(x) if acc is None else alpha * float(x) + (1.0 - alpha) * acc
            out.append(acc)
        pdf[out_col] = out
        return pdf[["time", "symbol", "trade_id", "price", out_col]]

    return compute


def ewm(trades: DataFrame, span: int = 12, alpha: float | None = None) -> DataFrame:
    """A3 — exponential moving average per symbol (α = 2/(span+1) ≈ 0.15).

    Reference: plpgsql ``calculate_ewm_12``
    (/root/reference/sql/timescaledb_schema.sql:103-138) — which is a
    one-step approximation; per SURVEY §7 we implement the standard
    recurrence y_t = α·x_t + (1−α)·y_{t−1}, seeded with the first price.

    A recurrence cannot be expressed with Spark's built-in window frames,
    so this is the one deliberate ``applyInPandas``: one shuffle on
    symbol, Arrow-batched, sequential only *within* a symbol (symbols
    parallelize; that is the same parallelism limit the reference has).
    """
    a = alpha if alpha is not None else 2.0 / (span + 1)
    out_col = f"ewm_{span}"
    out_schema = (
        "time timestamp, symbol string, trade_id string, price double, "
        f"{out_col} double"
    )
    return trades.select("time", "symbol", "trade_id", "price").groupBy(
        "symbol"
    ).applyInPandas(_ewm_fn(a, out_col), schema=out_schema)


def volatility(trades: DataFrame, bucket_seconds: int = 3600) -> DataFrame:
    """A4 — stddev of log returns per (hour, symbol) + sample count.

    Canonical semantics = the reference Spark job
    (/root/reference/spark/batch_feature_calculation.py:70-107): the lag
    runs over the whole symbol partition (so an hour's first return uses
    the prior hour's last price) and a null lag (first trade of a
    symbol) contributes a 0.0 return.
    """
    w = Window.partitionBy("symbol").orderBy(*_order())
    prev = F.lag("price").over(w)
    # Guard non-positive prices explicitly (engine-independent: DuckDB
    # raises on ln(0), Spark returns NULL) — a zero-priced tick
    # contributes a 0.0 return, like the reference's null-lag rule.
    with_ret = trades.withColumn(
        "log_return",
        F.when(
            (prev > 0) & (F.col("price") > 0), F.log(F.col("price") / prev)
        ).otherwise(F.lit(0.0)),
    )
    return with_ret.groupBy(
        time_bucket("time", bucket_seconds).alias("bucket"), "symbol"
    ).agg(
        F.stddev_samp("log_return").alias("volatility"),
        F.count(F.lit(1)).alias("sample_count"),
    )


def vwap(trades: DataFrame, bucket_seconds: int = 300) -> DataFrame:
    """A5 — volume-weighted average price per (5-min bucket, symbol).

    Reference: ``vwap_5m_agg``
    (/root/reference/sql/timescaledb_schema.sql:162-171):
    sum(price·volume)/nullif(sum(volume), 0) + total_volume.
    """
    return trades.groupBy(
        time_bucket("time", bucket_seconds).alias("bucket"), "symbol"
    ).agg(
        (
            F.sum(F.col("price") * F.col("volume"))
            / F.nullif(F.sum("volume"), F.lit(0.0))
        ).alias("vwap"),
        F.sum("volume").alias("total_volume"),
    )


def large_trade_flags(trades: DataFrame, quantile: float = 0.95) -> DataFrame:
    """A6 — flag trades with volume above the per-symbol p95.

    Reference: ``large_trade_flags`` table + contract test method
    (/root/reference/sql/timescaledb_schema.sql:182-196,
    sql/smartdb_contract.md:73-79). Exact linear-interpolation
    percentile (matches DuckDB ``quantile_cont``); the thresholds table
    is a handful of rows, so the join back is a **broadcast** — the
    trades side is never re-shuffled. At 100 TB swap in
    ``percentile_approx`` for a single-pass sketch.
    """
    thresholds = trades.groupBy("symbol").agg(
        F.expr(f"percentile(volume, {quantile})").alias("percentile_95")
    )
    return trades.join(F.broadcast(thresholds), "symbol").select(
        "time",
        "symbol",
        "trade_id",
        (F.col("volume") > F.col("percentile_95")).alias("large_trade_flag"),
        "volume",
        "percentile_95",
    )


def bidask_spreads(trades: DataFrame) -> DataFrame:
    """A7 — ask − bid per quote event, null-guarded.

    Reference: generated column + Flink monitor
    (/root/reference/sql/timescaledb_schema.sql:199-215,
    flink-jobs/market-realtime/anomaly_detection.py:195).
    """
    return trades.filter(
        F.col("bid").isNotNull() & F.col("ask").isNotNull()
    ).select(
        "time",
        "symbol",
        "trade_id",
        "bid",
        "ask",
        (F.col("ask") - F.col("bid")).alias("bidask_spread"),
    )


def trade_imbalance(trades: DataFrame, bucket_seconds: int = 300) -> DataFrame:
    """A8 — (buy−sell)/total volume per (5-min bucket, symbol), side-filtered.

    Reference: ``trade_imbalance_5m_agg``
    (/root/reference/sql/timescaledb_schema.sql:218-231). Invariant:
    result ∈ [−1, 1] (tests/test_smartdb_correctness.py:136-154).
    """
    buy = F.sum(F.when(F.col("side") == "buy", F.col("volume")).otherwise(F.lit(0.0)))
    sell = F.sum(F.when(F.col("side") == "sell", F.col("volume")).otherwise(F.lit(0.0)))
    return (
        trades.filter(F.col("side").isNotNull())
        .groupBy(time_bucket("time", bucket_seconds).alias("bucket"), "symbol")
        .agg(
            buy.alias("buy_volume"),
            sell.alias("sell_volume"),
            (
                (buy - sell) / F.nullif(buy + sell, F.lit(0.0))
            ).alias("trade_imbalance"),
        )
    )


def regime_tags(trades: DataFrame, n: int = 20) -> DataFrame:
    """A9 — 'up' / 'down' / 'neutral' vs the SMA-n.

    Reference: generated-column CASE
    (/root/reference/sql/timescaledb_schema.sql:241-265). Built directly
    on `sma` — one window pass, then a codegen'd CASE; no join needed
    because price and sma live on the same row.
    """
    sma_col = f"sma_{n}"
    return sma(trades, n).withColumn(
        "regime_tag",
        F.when(F.col("price") > F.col(sma_col), F.lit("up"))
        .when(F.col("price") < F.col(sma_col), F.lit("down"))
        .otherwise(F.lit("neutral")),
    )


def _ewm_series_fn(alpha: float, value_col: str, out_col: str, order_col: str):
    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([order_col]).reset_index(drop=True)
        acc = None
        out = []
        for x in pdf[value_col].to_numpy():
            acc = float(x) if acc is None else alpha * float(x) + (1.0 - alpha) * acc
            out.append(acc)
        pdf[out_col] = out
        return pdf

    return compute


def ewm_series(
    df: DataFrame,
    alpha: float,
    value_col: str,
    out_col: str,
    key_col: str = "symbol",
    order_col: str = "bucket",
) -> DataFrame:
    """Generic keyed EWM recurrence y_t = α·x_t + (1−α)·y_{t−1} (seed =
    first value) over any (key, order, value) series — the
    column-agnostic generalization of A3's ``ewm``, bit-identical to a
    DuckDB ``list_reduce`` fold with the same constants. One shuffle on
    the key; sequential only within a key (the same parallelism bound
    every recurrence has). ``value_col`` must be non-null."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )
    return df.groupBy(key_col).applyInPandas(
        _ewm_series_fn(alpha, value_col, out_col, order_col), schema=schema
    )
