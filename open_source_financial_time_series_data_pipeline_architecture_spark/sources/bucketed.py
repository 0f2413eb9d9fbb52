"""Bucketed (pre-shuffled) tables — shuffle-free co-located joins.

The reference co-locates trade and feature rows by hypertable chunk +
symbol index (sql/timescaledb_schema.sql:16-42) so point and join
queries never re-sort. The Spark-native equivalent is bucketing:
`bucketBy(n, key)` writes each table pre-hash-partitioned on the join
key, and a join between two tables bucketed the same way reads both
sides already co-partitioned — NO shuffle exchange at query time.

At 100 TB this is the difference between re-shuffling the fact table on
every join and shuffling it exactly once at ingest: the classic
write-time-amortized layout. AQE is irrelevant here — the exchange is
simply absent from the plan (asserted in tests/test_bucketed.py).

Bucketed tables require the session catalog (`saveAsTable`, parquet
format, local spark-warehouse dir — no Hive metastore needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` hash-bucketed on `bucket_cols` (optionally
    sort-ordered within buckets, which also makes merge-joins sortless).
    `n_buckets` should match the downstream shuffle parallelism at the
    target scale — each bucket becomes one join task per side."""
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With
    `spark.sql.sources.bucketing.enabled` (default true) and matching
    bucket counts, the plan contains no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
