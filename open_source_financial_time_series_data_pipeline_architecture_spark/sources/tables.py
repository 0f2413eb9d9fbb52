"""Batch table loaders for the driver-generated parquet star schema.

Replaces the reference's scan surface (Delta batch scans,
/root/reference/spark/batch_feature_calculation.py:38) with plain parquet
reads. Reads stay fully declarative so Catalyst keeps predicate pushdown
and column pruning; the only special case is `events.ts`, stored as
parquet TIMESTAMP(NANOS) which Spark maps to LongType under
``spark.sql.legacy.parquet.nanosAsLong`` — we convert to a proper
TimestampType column (microsecond truncation, matching DuckDB's own
ns→us cast) right after the scan. The conversion is a cheap projection;
pushdown on other columns is unaffected.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table; normalizes nanosecond timestamps."""
    apply_runtime_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts is parquet TIMESTAMP(NANOS). Depending on the Spark
    # build it arrives as LongType (nanosAsLong) or TIMESTAMP_NTZ
    # (Spark 4.1+ native read, already µs-truncated). Normalize both to
    # session-zone TimestampType so every downstream epoch cast
    # (`ts.cast("double")`, `unix_micros`) stays legal and the output
    # type matches the DuckDB oracle's ns→µs CAST convention. The
    # session zone is pinned to UTC (session.py), so the NTZ→LTZ cast
    # is a pure re-tag, not a wall-clock shift.
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (SQL entry point)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist hash-bucketed (and optionally sorted) — Spark's answer to
    co-located joins: two tables bucketed the same way join with ZERO
    exchange (verified in tests/test_plans.py), and bucket pruning
    serves point lookups. This is the 100 TB layout for the raw trades
    and every per-symbol feature table: bucket by symbol, sort by time,
    and the as-of/window pipeline starts pre-partitioned.

    Uses saveAsTable (bucket metadata lives in the session catalog —
    with a real metastore/Delta it persists across sessions).
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)  # external bucketed table
    writer.saveAsTable(table_name)


def write_time_partitioned(
    df: DataFrame,
    target_dir: str,
    time_col: str = "time",
    mode: str = "overwrite",
) -> None:
    """S14 — hypertable-chunk equivalent: persist partitioned by
    `to_date(time)` (reference uses 1-day chunks,
    /root/reference/sql/timescaledb_schema.sql:28-31). Time-range
    predicates then prune whole date directories at plan time — the
    100 TB scan never opens out-of-range files."""
    (
        df.withColumn("__date", F.to_date(F.col(time_col)))
        .write.mode(mode)
        .partitionBy("__date")
        .parquet(target_dir)
    )


def write_clustered(
    df: DataFrame,
    target_dir: str,
    cluster_cols: list[str],
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Range-cluster + sort-within-partitions write — the data-skipping
    layout (Delta OPTIMIZE ZORDER's single-dimension analog, and the
    TimescaleDB segment-by ordering the reference's chunk layout gets
    implicitly): `repartitionByRange(cluster_cols)` gives each output
    file a DISJOINT value range, and the in-file sort tightens parquet
    row-group min/max stats, so a point or range predicate on the
    cluster key prunes to one file (and within it, few row groups) at
    scan time — no partition-column directory explosion needed.

    Use for the high-cardinality keys where `partitionBy` would create
    millions of directories (symbol, doc_id, user_id); combine with
    `write_time_partitioned` for date dirs × clustered files. For a
    SINGLE cluster key this strictly beats `zorder.write_zordered`
    (no bit-interleave dilution); use Z-order only when two+ dimensions
    must both prune. Verified by footer min/max disjointness in
    tests/test_storage_pnl.py.
    """
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in cluster_cols])
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(target_dir)
    )
