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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: OHLC over sf0.001 (will graduate to the PIT snapshot)."""
    return QUERIES["ohlc_1m"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
