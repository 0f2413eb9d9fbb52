"""Canonical trades schema and the events→trades mapping.

The reference's raw table is ``market_data_raw(time, symbol, price,
volume, trade_id, side, bid, ask, source)`` (hypertable DDL at
/root/reference/sql/timescaledb_schema.sql:14-31; Avro contract at
/root/reference/schemas/market_data.v1.avsc). The driver's testdata has
no market-data table, so per FIXTURES.md §5 the ``events`` table plays
the role of trades through a fixed, deterministic mapping:

    time     = ts
    symbol   = event_type              (5 values ≈ 5 tickers)
    price    = value
    volume   = 1 + props.k             (k ∈ [0, 99] → volume ∈ [1, 100])
    trade_id = cast(event_id as string)  (unique — the dedup anchor)
    side     = user_id % 3 → buy / sell / NULL   (NULL slice feeds the
               side-IS-NOT-NULL imbalance filter, schema.sql:229)
    bid/ask  = price ∓ (1 + k % 10)/200, NULL when k % 7 = 0
               (NULL slice feeds the bid/ask null-guard,
               anomaly_detection.py:195)

The SAME mapping exists twice: ``trades_from_events`` (Spark) and
``TRADES_CTE`` (DuckDB SQL for the correctness oracle). Keep them in
lockstep — tests/test_trades_mapping.py pins their equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRADES_SCHEMA = T.StructType(
    [
        T.StructField("time", T.TimestampType(), False),
        T.StructField("symbol", T.StringType(), False),
        T.StructField("price", T.DoubleType(), False),
        T.StructField("volume", T.DoubleType(), False),
        T.StructField("trade_id", T.StringType(), False),
        T.StructField("side", T.StringType(), True),
        T.StructField("bid", T.DoubleType(), True),
        T.StructField("ask", T.DoubleType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def trades_from_events(events: DataFrame, decimal_price: bool = False) -> DataFrame:
    """Map the driver's ``events`` table onto the canonical trades schema.

    Pure column expressions — stays inside whole-stage codegen, and
    Catalyst pushes any downstream filter through this projection to the
    parquet scan.

    ``decimal_price=True`` switches ``price`` to DECIMAL(20,8) — the
    Avro wire contract's fixed-point price mode (reference
    schemas/market_data.v1.avsc:20-28 carries decimals as strings
    precisely so consumers ingest at fixed precision): aggregation is
    then exact, with no FP summation order to reconcile.
    """
    k = F.get_json_object("props", "$.k").cast("int")
    half_spread = (1 + k % 10) / F.lit(200.0)
    mod3 = F.col("user_id") % 3
    price = (
        F.col("value").cast("decimal(20,8)")
        if decimal_price
        else F.col("value")
    )
    return events.select(
        F.col("ts").alias("time"),
        F.col("event_type").alias("symbol"),
        price.alias("price"),
        (1 + k.cast("double")).alias("volume"),
        F.col("event_id").cast("string").alias("trade_id"),
        F.when(mod3 == 0, F.lit("buy"))
        .when(mod3 == 1, F.lit("sell"))
        .alias("side"),
        F.when(k % 7 != 0, F.col("value") - half_spread).alias("bid"),
        F.when(k % 7 != 0, F.col("value") + half_spread).alias("ask"),
        F.lit("events").alias("source"),
    )


# DuckDB equivalent of trades_from_events, used as the leading CTE of
# every oracle query. `events` is pre-registered as a view by the driver.
TRADES_CTE = """
trades AS (
    SELECT
        -- ns -> us: Spark's load_table truncates TIMESTAMP(NANOS) via
        -- `ts DIV 1000`; the driver's DuckDB view preserves TIMESTAMP_NS,
        -- so truncate here or raw `time` values hash-mismatch.
        CAST(ts AS TIMESTAMP) AS time,
        event_type AS symbol,
        value AS price,
        1 + CAST(CAST(json_extract_string(props, '$.k') AS INT) AS DOUBLE) AS volume,
        CAST(event_id AS VARCHAR) AS trade_id,
        CASE WHEN user_id % 3 = 0 THEN 'buy'
             WHEN user_id % 3 = 1 THEN 'sell'
             ELSE NULL END AS side,
        CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) % 7 <> 0
             THEN value - (1 + CAST(json_extract_string(props, '$.k') AS INT) % 10) / 200.0
             ELSE NULL END AS bid,
        CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) % 7 <> 0
             THEN value + (1 + CAST(json_extract_string(props, '$.k') AS INT) % 10) / 200.0
             ELSE NULL END AS ask,
        'events' AS source
    FROM events
)
""".strip()


def oracle(body: str) -> str:
    """Wrap an oracle query body with the trades CTE.

    A body that opens with its own WITH clause is merged into a single
    CTE list.
    """
    body = body.strip()
    if body[:5].upper() == "WITH ":
        return f"WITH {TRADES_CTE},\n{body[5:]}"
    if body[:6].upper() != "SELECT":
        # body opens with its own CTE definitions ("name AS (...") —
        # continue the CTE list.
        return f"WITH {TRADES_CTE},\n{body}"
    return f"WITH {TRADES_CTE}\n{body}"
