"""Driver contract: entry / queries / oracle_sql.

Each `queries()` entry is a Spark implementation of one operator from
SURVEY.md §2; the matching `oracle_sql()` entry is the ANSI-SQL DuckDB
recomputation the driver hash-compares against at sf0.01.

Conventions shared by both sides (hash stability):
- the events→trades mapping is defined once: `schema.trades_from_events`
  (Spark) ≡ `schema.TRADES_CTE` (DuckDB);
- every computed float column is ROUND(x, 6) on both sides;
- intra-key ordering ties broken by (time, trade_id) on both sides;
- every computed column carries the same explicit alias on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark import functions as FX
from open_source_financial_time_series_data_pipeline_architecture_spark import operators as OPS
from open_source_financial_time_series_data_pipeline_architecture_spark.schema import (
    oracle,
    trades_from_events,
)
from open_source_financial_time_series_data_pipeline_architecture_spark.sources import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def q(name: str, oracle_sql_text: str | None = None):
    def register(fn):
        QUERIES[name] = fn
        if oracle_sql_text is not None:
            ORACLES[name] = oracle_sql_text
        return fn

    return register


def _trades(spark: SparkSession, sf_dir: str) -> DataFrame:
    return trades_from_events(load_table(spark, sf_dir, "events"))


def _r6(df: DataFrame, *cols: str) -> DataFrame:
    out = df
    for c in cols:
        out = out.withColumn(c, F.round(F.col(c), 6))
    return out


# --------------------------------------------------------------------------
# A1 ohlc_1m — SURVEY §2.4 A1 (reference sql/timescaledb_schema.sql:44-57)
# --------------------------------------------------------------------------
@q(
    "ohlc_1m",
    oracle(
        """
SELECT * FROM (
  SELECT
    to_timestamp(CAST(floor(epoch(time) / 60) * 60 AS BIGINT))::TIMESTAMP AS bucket,
    symbol,
    ROUND(first(price ORDER BY time, trade_id), 6) AS open,
    ROUND(max(price), 6) AS high,
    ROUND(min(price), 6) AS low,
    ROUND(last(price ORDER BY time, trade_id), 6) AS close,
    ROUND(sum(volume), 6) AS volume,
    count(*) AS trade_count
  FROM trades
  GROUP BY 1, 2
)
"""
    ),
)
def ohlc_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _r6(
        FX.ohlc(_trades(spark, sf_dir), bucket_seconds=60),
        "open",
        "high",
        "low",
        "close",
        "volume",
    )


# --------------------------------------------------------------------------
# A2 sma_20 — 20-row trailing mean (reference spark/batch_feature_calculation.py:43-49)
# --------------------------------------------------------------------------
@q(
    "sma_20",
    oracle(
        """
SELECT time, symbol, trade_id, price,
       ROUND(avg(price) OVER (
           PARTITION BY symbol ORDER BY time, trade_id
           ROWS BETWEEN 19 PRECEDING AND CURRENT ROW), 6) AS sma_20
FROM trades
"""
    ),
)
def sma_20(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _r6(FX.sma(_trades(spark, sf_dir), n=20), "sma_20")


# --------------------------------------------------------------------------
# A3 ewm_12 — exponential moving average recurrence, α=0.15
# (reference sql/timescaledb_schema.sql:103-138; standard recurrence per
# SURVEY §7 hard part 1). Oracle: DuckDB prefix-list fold — the same
# sequential acc = 0.15·x + 0.85·acc double arithmetic as the Pandas UDF.
# --------------------------------------------------------------------------
@q(
    "ewm_12",
    oracle(
        """
SELECT time, symbol, trade_id, price,
       ROUND(list_reduce(
           list(price) OVER (
               PARTITION BY symbol ORDER BY time, trade_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           (acc, x) -> 0.15 * x + 0.85 * acc), 6) AS ewm_12
FROM trades
"""
    ),
)
def ewm_12(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _r6(FX.ewm(_trades(spark, sf_dir), span=12, alpha=0.15), "ewm_12")


# --------------------------------------------------------------------------
# A4 volatility_1h — stddev of log returns per (hour, symbol)
# (reference spark/batch_feature_calculation.py:70-107)
# --------------------------------------------------------------------------
@q(
    "volatility_1h",
    oracle(
        """
WITH rets AS (
  SELECT time, symbol, trade_id,
         COALESCE(ln(price / lag(price) OVER (
             PARTITION BY symbol ORDER BY time, trade_id)), 0.0) AS log_return
  FROM trades
)
SELECT
  to_timestamp(CAST(floor(epoch(time) / 3600) * 3600 AS BIGINT))::TIMESTAMP AS bucket,
  symbol,
  ROUND(stddev_samp(log_return), 6) AS volatility,
  count(*) AS sample_count
FROM rets
GROUP BY 1, 2
"""
    ),
)
def volatility_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _r6(FX.volatility(_trades(spark, sf_dir), bucket_seconds=3600), "volatility")


# --------------------------------------------------------------------------
# A5 vwap_5m — sum(price·volume)/nullif(sum(volume),0)
# (reference sql/timescaledb_schema.sql:162-171)
# --------------------------------------------------------------------------
@q(
    "vwap_5m",
    oracle(
        """
SELECT
  to_timestamp(CAST(floor(epoch(time) / 300) * 300 AS BIGINT))::TIMESTAMP AS bucket,
  symbol,
  ROUND(sum(price * volume) / nullif(sum(volume), 0.0), 6) AS vwap,
  ROUND(sum(volume), 6) AS total_volume
FROM trades
GROUP BY 1, 2
"""
    ),
)
def vwap_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _r6(FX.vwap(_trades(spark, sf_dir), bucket_seconds=300), "vwap", "total_volume")


# --------------------------------------------------------------------------
# A6 large_trade_flags — volume > per-symbol exact p95
# (reference sql/timescaledb_schema.sql:182-196; Spark `percentile` and
# DuckDB `quantile_cont` share the linear-interpolation definition)
# --------------------------------------------------------------------------
@q(
    "large_trade_flags",
    oracle(
        """
WITH thresholds AS (
  SELECT symbol, quantile_cont(volume, 0.95) AS percentile_95
  FROM trades GROUP BY symbol
)
SELECT t.time, t.symbol, t.trade_id,
       t.volume > th.percentile_95 AS large_trade_flag,
       t.volume,
       ROUND(th.percentile_95, 6) AS percentile_95
FROM trades t JOIN thresholds th USING (symbol)
"""
    ),
)
def large_trade_flags_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _r6(
        FX.large_trade_flags(_trades(spark, sf_dir), quantile=0.95), "percentile_95"
    )


# --------------------------------------------------------------------------
# A7 bidask_spreads — ask − bid, null-guarded
# (reference sql/timescaledb_schema.sql:199-215)
# --------------------------------------------------------------------------
@q(
    "bidask_spreads",
    oracle(
        """
SELECT time, symbol, trade_id, bid, ask,
       ROUND(ask - bid, 6) AS bidask_spread
FROM trades
WHERE bid IS NOT NULL AND ask IS NOT NULL
"""
    ),
)
def bidask_spreads_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _r6(FX.bidask_spreads(_trades(spark, sf_dir)), "bidask_spread")


# --------------------------------------------------------------------------
# A8 trade_imbalance_5m — (buy−sell)/total per (5-min, symbol), side-filtered
# (reference sql/timescaledb_schema.sql:218-231)
# --------------------------------------------------------------------------
@q(
    "trade_imbalance_5m",
    oracle(
        """
SELECT
  to_timestamp(CAST(floor(epoch(time) / 300) * 300 AS BIGINT))::TIMESTAMP AS bucket,
  symbol,
  ROUND(sum(CASE WHEN side = 'buy' THEN volume ELSE 0.0 END), 6) AS buy_volume,
  ROUND(sum(CASE WHEN side = 'sell' THEN volume ELSE 0.0 END), 6) AS sell_volume,
  ROUND((sum(CASE WHEN side = 'buy' THEN volume ELSE 0.0 END)
       - sum(CASE WHEN side = 'sell' THEN volume ELSE 0.0 END))
      / nullif(sum(CASE WHEN side = 'buy' THEN volume ELSE 0.0 END)
             + sum(CASE WHEN side = 'sell' THEN volume ELSE 0.0 END), 0.0), 6)
      AS trade_imbalance
FROM trades
WHERE side IS NOT NULL
GROUP BY 1, 2
"""
    ),
)
def trade_imbalance_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _r6(
        FX.trade_imbalance(_trades(spark, sf_dir), bucket_seconds=300),
        "buy_volume",
        "sell_volume",
        "trade_imbalance",
    )


# --------------------------------------------------------------------------
# A9 regime_tags — up/down/neutral vs SMA-20
# (reference sql/timescaledb_schema.sql:241-265)
# --------------------------------------------------------------------------
@q(
    "regime_tags",
    oracle(
        """
WITH s AS (
  SELECT time, symbol, trade_id, price,
         avg(price) OVER (
             PARTITION BY symbol ORDER BY time, trade_id
             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS sma_20
  FROM trades
)
SELECT time, symbol, trade_id, price, ROUND(sma_20, 6) AS sma_20,
       CASE WHEN price > sma_20 THEN 'up'
            WHEN price < sma_20 THEN 'down'
            ELSE 'neutral' END AS regime_tag
FROM s
"""
    ),
)
def regime_tags_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _r6(FX.regime_tags(_trades(spark, sf_dir), n=20), "sma_20")


# --------------------------------------------------------------------------
# J2 pit_features_asof — vectorized Feast-style PIT retrieval.
# Entity probes = every trade with trade_id % 97 == 0 (deterministic,
# ~1% of rows, includes exact-boundary timestamps). Features: 1-min OHLC
# close and 5-min VWAP, each as-of joined on (symbol, ts<=event_ts).
# Reference: feast get_historical_features
# (tests/test_feast_pit_correctness.py:42-151). Oracle: DuckDB ASOF JOIN.
# --------------------------------------------------------------------------
@q(
    "pit_features_asof",
    oracle(
        """
ohlc AS (
  SELECT
    to_timestamp(CAST(floor(epoch(time) / 60) * 60 AS BIGINT))::TIMESTAMP AS bucket,
    symbol,
    ROUND(last(price ORDER BY time, trade_id), 6) AS ohlc_close
  FROM trades GROUP BY 1, 2
),
vw AS (
  SELECT
    to_timestamp(CAST(floor(epoch(time) / 300) * 300 AS BIGINT))::TIMESTAMP AS bucket,
    symbol,
    ROUND(sum(price * volume) / nullif(sum(volume), 0.0), 6) AS vwap
  FROM trades GROUP BY 1, 2
),
entity AS (
  SELECT symbol, time AS event_timestamp, trade_id
  FROM trades WHERE CAST(trade_id AS BIGINT) % 97 = 0
)
SELECT e.symbol, e.event_timestamp, e.trade_id, o.ohlc_close, v.vwap
FROM entity e
ASOF LEFT JOIN ohlc o ON e.symbol = o.symbol AND o.bucket <= e.event_timestamp
ASOF LEFT JOIN vw   v ON e.symbol = v.symbol AND v.bucket <= e.event_timestamp
"""
    ),
)
def pit_features_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    trades = _trades(spark, sf_dir)
    entity = trades.filter(
        F.col("trade_id").cast("bigint") % 97 == 0
    ).select("symbol", F.col("time").alias("event_timestamp"), "trade_id")
    ohlc = _r6(FX.ohlc(trades, 60), "close").select(
        "symbol", "bucket", F.col("close").alias("ohlc_close")
    )
    vw = _r6(FX.vwap(trades, 300), "vwap").select("symbol", "bucket", "vwap")
    return OPS.get_historical_features(
        entity,
        {"ohlc": (ohlc, "bucket"), "vwap": (vw, "bucket")},
        key="symbol",
        entity_time="event_timestamp",
    )


# --------------------------------------------------------------------------
# A11/J1 pit_snapshot — scalar wide-row snapshot for (symbol, as_of).
# symbol = 'purchase'; as_of = max trade time (deterministic). Reference:
# feature_pit_snapshot (sql/timescaledb_schema.sql:292-411).
# --------------------------------------------------------------------------
@q(
    "pit_snapshot",
    oracle(
        """
params AS (SELECT 'purchase' AS symbol, max(time) AS as_of FROM trades),
ohlc AS (
  SELECT
    to_timestamp(CAST(floor(epoch(time) / 60) * 60 AS BIGINT))::TIMESTAMP AS bucket,
    symbol,
    ROUND(first(price ORDER BY time, trade_id), 6) AS ohlc_open,
    ROUND(max(price), 6) AS ohlc_high,
    ROUND(min(price), 6) AS ohlc_low,
    ROUND(last(price ORDER BY time, trade_id), 6) AS ohlc_close,
    ROUND(sum(volume), 6) AS ohlc_volume
  FROM trades GROUP BY 1, 2
),
ohlc_latest AS (
  SELECT o.ohlc_open, o.ohlc_high, o.ohlc_low, o.ohlc_close, o.ohlc_volume
  FROM ohlc o, params p WHERE o.symbol = p.symbol AND o.bucket <= p.as_of
  ORDER BY o.bucket DESC LIMIT 1
),
sma AS (
  SELECT time, symbol, trade_id,
         ROUND(avg(price) OVER (
             PARTITION BY symbol ORDER BY time, trade_id
             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW), 6) AS sma_20
  FROM trades
),
sma_latest AS (
  SELECT s.sma_20 FROM sma s, params p
  WHERE s.symbol = p.symbol AND s.time <= p.as_of
  ORDER BY s.time DESC, s.trade_id DESC LIMIT 1
),
vw AS (
  SELECT
    to_timestamp(CAST(floor(epoch(time) / 300) * 300 AS BIGINT))::TIMESTAMP AS bucket,
    symbol,
    ROUND(sum(price * volume) / nullif(sum(volume), 0.0), 6) AS vwap_5m
  FROM trades GROUP BY 1, 2
),
vwap_latest AS (
  SELECT v.vwap_5m FROM vw v, params p
  WHERE v.symbol = p.symbol AND v.bucket <= p.as_of
  ORDER BY v.bucket DESC LIMIT 1
),
vol AS (
  SELECT
    to_timestamp(CAST(floor(epoch(time) / 3600) * 3600 AS BIGINT))::TIMESTAMP AS bucket,
    symbol,
    ROUND(stddev_samp(COALESCE(lr, 0.0)), 6) AS volatility_1h
  FROM (
    SELECT time, symbol,
           ln(price / lag(price) OVER (PARTITION BY symbol ORDER BY time, trade_id)) AS lr
    FROM trades
  ) GROUP BY 1, 2
),
vol_latest AS (
  SELECT v.volatility_1h FROM vol v, params p
  WHERE v.symbol = p.symbol AND v.bucket <= p.as_of
  ORDER BY v.bucket DESC LIMIT 1
),
imb AS (
  SELECT
    to_timestamp(CAST(floor(epoch(time) / 300) * 300 AS BIGINT))::TIMESTAMP AS bucket,
    symbol,
    ROUND((sum(CASE WHEN side = 'buy' THEN volume ELSE 0.0 END)
         - sum(CASE WHEN side = 'sell' THEN volume ELSE 0.0 END))
        / nullif(sum(volume), 0.0), 6) AS trade_imbalance
  FROM trades WHERE side IS NOT NULL GROUP BY 1, 2
),
imb_latest AS (
  SELECT i.trade_imbalance FROM imb i, params p
  WHERE i.symbol = p.symbol AND i.bucket <= p.as_of
  ORDER BY i.bucket DESC LIMIT 1
)
SELECT p.symbol, p.as_of AS snapshot_time,
       o.ohlc_open, o.ohlc_high, o.ohlc_low, o.ohlc_close, o.ohlc_volume,
       s.sma_20, v.vwap_5m, vl.volatility_1h, i.trade_imbalance
FROM params p
LEFT JOIN ohlc_latest o ON TRUE
LEFT JOIN sma_latest s ON TRUE
LEFT JOIN vwap_latest v ON TRUE
LEFT JOIN vol_latest vl ON TRUE
LEFT JOIN imb_latest i ON TRUE
"""
    ),
)
def pit_snapshot_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    trades = _trades(spark, sf_dir)
    as_of = trades.agg(F.max("time")).collect()[0][0]

    ohlc = _r6(FX.ohlc(trades, 60), "open", "high", "low", "close", "volume").select(
        "symbol",
        "bucket",
        F.col("open").alias("ohlc_open"),
        F.col("high").alias("ohlc_high"),
        F.col("low").alias("ohlc_low"),
        F.col("close").alias("ohlc_close"),
        F.col("volume").alias("ohlc_volume"),
    )
    sma = _r6(FX.sma(trades, 20), "sma_20")
    vw = _r6(FX.vwap(trades, 300), "vwap").select(
        "symbol", "bucket", F.col("vwap").alias("vwap_5m")
    )
    vol = _r6(FX.volatility(trades, 3600), "volatility").select(
        "symbol", "bucket", F.col("volatility").alias("volatility_1h")
    )
    imb = _r6(FX.trade_imbalance(trades, 300), "trade_imbalance").select(
        "symbol", "bucket", "trade_imbalance"
    )
    return OPS.pit_snapshot(
        spark,
        {
            "ohlc": (ohlc, "bucket", ["ohlc_open", "ohlc_high", "ohlc_low", "ohlc_close", "ohlc_volume"]),
            "sma": (sma, "time", ["sma_20"]),
            "vwap": (vw, "bucket", ["vwap_5m"]),
            "vol": (vol, "bucket", ["volatility_1h"]),
            "imb": (imb, "bucket", ["trade_imbalance"]),
        },
        symbol="purchase",
        as_of=as_of,
        now=as_of,
        tiebreak_cols={"sma": ["trade_id"]},
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the vectorized PIT as-of retrieval at sf0.001."""
    return QUERIES["pit_features_asof"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
