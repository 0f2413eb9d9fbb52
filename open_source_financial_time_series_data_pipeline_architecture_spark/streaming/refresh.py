"""Incremental continuous-aggregate refresh (the TimescaleDB CA policy
equivalent).

The reference keeps its bucketed features fresh with continuous
aggregates + refresh policies (`refresh ohlc every 1 min over
(now−1h, now−1min)`, /root/reference/sql/timescaledb_schema.sql:60-65,
154-159, 173-178, 233-238). Catalyst has no incremental-view planner;
SURVEY §4 maps this to a job-orchestration pattern, implemented here:

1. read the materialized feature table's high-water mark (max bucket);
2. recompute ONLY source rows in [hwm − lookback, ∞) — bucket-aligned,
   so every recomputed bucket is complete;
3. overwrite just the affected date partitions (dynamic partition
   overwrite), leaving history untouched.

Scale: a refresh touches `lookback + new data` source rows and
rewrites only the date partitions those buckets fall in — O(recent),
not O(history), exactly like a CA bucket refresh. With Delta the
partition overwrite becomes `replaceWhere`/`MERGE`.

Only *bucketed* features (OHLC/VWAP/imbalance/volatility buckets) can
refresh incrementally this way; features whose rows depend on unbounded
history per symbol (SMA/EWM row windows) need the streaming/stateful
path or full recompute — `validate_spec` enforces that.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# bucketed (safe) features: name → bucket seconds
BUCKETED: dict[str, int] = {
    "ohlc_1m": 60,
    "vwap_5m": 300,
    "trade_imbalance_5m": 300,
}


def validate_spec(feature_name: str) -> int:
    if feature_name not in BUCKETED:
        raise ValueError(
            f"{feature_name} is not incrementally refreshable (row-window "
            "or cross-bucket dependency); use streaming or full recompute"
        )
    return BUCKETED[feature_name]


def _target_exists(target_dir: str) -> bool:
    # partition dirs are named "__date=..." — only marker files
    # (_SUCCESS, .crc) mean "no data yet"
    return os.path.isdir(target_dir) and any(
        f.startswith("__date=") or not (f.startswith("_") or f.startswith("."))
        for f in os.listdir(target_dir)
    )


def incremental_refresh(
    spark: SparkSession,
    trades: DataFrame,
    feature_name: str,
    target_dir: str,
    lookback_seconds: int = 3600,
) -> dict:
    """One refresh cycle. Returns {'mode', 'hwm', 'rows_written'}."""
    from ..functions import registry as REG

    bucket_sec = validate_spec(feature_name)
    builder = REG.get_feature(feature_name).builder

    hwm = None
    if _target_exists(target_dir):
        hwm = (
            spark.read.parquet(target_dir).agg(F.max("bucket")).collect()[0][0]
        )

    src = trades
    if hwm is not None:
        # The write replaces whole DATE partitions (dynamic overwrite),
        # so the recompute slice must start at the midnight of the
        # earliest date the lookback window touches — otherwise the
        # rewritten partition would lose its earlier buckets.
        cutoff = (hwm - dt.timedelta(seconds=lookback_seconds)).replace(
            hour=0, minute=0, second=0, microsecond=0
        )
        src = trades.filter(F.col("time") >= F.lit(cutoff))

    fresh = builder(src).withColumn("__date", F.to_date("bucket"))
    n = fresh.count()

    with_dynamic_overwrite(spark)
    (
        fresh.write.mode("overwrite")
        .partitionBy("__date")
        .parquet(target_dir)
    )
    return {
        "mode": "incremental" if hwm is not None else "initial",
        "hwm": hwm,
        "rows_written": n,
    }


def with_dynamic_overwrite(spark: SparkSession) -> None:
    """`overwrite` + partitionBy replaces ONLY the partitions present in
    the written frame (Hive dynamic overwrite), i.e. the refresh window
    — not the whole table."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
