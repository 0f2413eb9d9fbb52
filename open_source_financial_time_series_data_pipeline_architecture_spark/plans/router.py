"""Aggregate navigator: route bar queries to materialized rollups.

TimescaleDB answers OHLC queries from the continuous aggregate and
transparently merges the not-yet-materialized raw tail ("real-time
aggregation", reference sql/timescaledb_schema.sql:44-65 — the cagg +
refresh-policy pair). Catalyst has no materialized-view rewrite, so the
routing decision lives here, one level above the DataFrame API:

- a request for `bucket_seconds` that is a multiple of the stored
  granularity is served by ROLLING UP the materialized bar table
  (|bars| rows ≈ |trades|/60 — a 60× scan reduction at any scale);
- rows past the store's high-water mark are aggregated from raw trades
  and unioned in (complete buckets only, so the two sources never
  overlap and bar values are identical to a full recompute);
- any granularity the store can't serve falls back to raw trades.

Together with `streaming/refresh.py` (incremental maintenance of the
store) this closes the cagg loop: refresh keeps the store near-fresh,
the router hides the remaining lag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.functions.features import (
    bar_rollup,
    ohlc,
)

BAR_COLS = ["bucket", "symbol", "open", "high", "low", "close", "volume", "trade_count"]


class AggregateRouter:
    """Serve OHLC bars from a materialized 1m-bar store when possible.

    ``store_path`` holds the materialized bars (parquet, written by
    :meth:`materialize` or by the incremental refresher).
    """

    def __init__(
        self, spark: SparkSession, store_path: str, granularity_seconds: int = 60
    ):
        self.spark = spark
        self.store_path = store_path
        self.granularity = granularity_seconds
        self._has_store = False

    def materialize(self, trades: DataFrame) -> None:
        """(Re)build the bar store at the configured granularity.

        Callers must pass bucket-COMPLETE data (cut history on a
        granule boundary, the way refresh policies do —
        streaming/refresh.py aligns its window the same way); a partial
        trailing bucket would be served with understated values."""
        bars = ohlc(trades, bucket_seconds=self.granularity)
        bars.write.mode("overwrite").parquet(self.store_path)
        self._has_store = True

    def _store(self) -> DataFrame:
        return self.spark.read.parquet(self.store_path).select(*BAR_COLS)

    def high_water_mark(self):
        """End of materialized coverage: max stored bucket + one
        granule (buckets at/after this must come from raw trades)."""
        row = self._store().agg(F.max("bucket").alias("mx")).collect()[0]
        if row["mx"] is None:
            return None
        return row["mx"]

    def bars(
        self, trades: DataFrame, bucket_seconds: int, realtime: bool = False
    ) -> DataFrame:
        """Bars at `bucket_seconds`, served from the cheapest source.

        ``realtime=False`` assumes the store is fully refreshed (the
        refresh-policy steady state). ``realtime=True`` additionally
        aggregates trades PAST the store's high-water mark from raw
        data and unions them in — TimescaleDB real-time aggregation.
        The requested granularity must contain whole store granules;
        otherwise raw trades are used directly (correct, just not
        accelerated).
        """
        if not self._has_store or bucket_seconds % self.granularity != 0:
            return ohlc(trades, bucket_seconds=bucket_seconds)
        stored = self._store()
        if realtime:
            hwm = self.high_water_mark()
            if hwm is not None:
                # complete materialized buckets only: the tail starts at
                # the first granule the store does NOT cover
                cutoff = F.lit(hwm) + F.expr(
                    f"INTERVAL {self.granularity} SECONDS"
                )
                tail_trades = trades.filter(F.col("time") >= cutoff)
                tail_bars = ohlc(tail_trades, bucket_seconds=self.granularity)
                stored = stored.unionByName(tail_bars.select(*BAR_COLS))
        if bucket_seconds == self.granularity:
            return stored
        return bar_rollup(stored, to_seconds=bucket_seconds)
