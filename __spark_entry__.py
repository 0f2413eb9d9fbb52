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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: OHLC over sf0.001 (will graduate to the PIT snapshot)."""
    return QUERIES["ohlc_1m"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
