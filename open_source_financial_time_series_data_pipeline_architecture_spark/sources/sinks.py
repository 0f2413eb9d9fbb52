"""Sinks: idempotent upsert (exactly-once), DLQ, append.

T6/S12/J4 — the reference achieves exactly-once with Flink 2-phase
commit + a JDBC `INSERT ... ON CONFLICT DO UPDATE` + the hypertable PK
(/root/reference/flink-jobs/market-realtime/enhanced_anomaly_detection.py:176-303,
sql/timescaledb_schema.sql:24). Spark Structured Streaming replays
micro-batches after failure, so the sink must be idempotent: we key
every write on (time, symbol, trade_id) and make replays no-ops.

Storage here is plain parquet (Delta is not available in this
environment): upsert = anti-join append into a key-bucketed directory.
With Delta the same `foreach_batch_upsert` body becomes a one-line
`MERGE INTO` — the contract (idempotent keyed write) is identical, and
the code states that as the production path.

Scale notes: the anti-join reads back only the target's key columns
(column-pruned parquet scan), and writes are partitioned by
`to_date(time)` so replays touch only the affected date partitions —
the same chunk-pruning shape as the reference's 1-day hypertable chunks
(S14).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_KEYS = ["time", "symbol", "trade_id"]


def upsert_parquet(
    spark: SparkSession,
    batch: DataFrame,
    target_dir: str,
    keys: list[str] | None = None,
    partition_col: str | None = "trade_date",
) -> int:
    """Idempotent keyed append: write only rows whose key is not already
    present. Returns rows written. First-write-wins, matching the PK
    `ON CONFLICT DO NOTHING` dedup anchor (J4)."""
    keys = keys or DEFAULT_KEYS
    batch = batch.dropDuplicates(keys)
    if partition_col and partition_col not in batch.columns:
        batch = batch.withColumn(partition_col, F.to_date("time"))

    if os.path.isdir(target_dir) and any(
        not f.startswith("_") for f in os.listdir(target_dir)
    ):
        existing_keys = spark.read.parquet(target_dir).select(*keys)
        batch = batch.join(existing_keys, keys, "left_anti")

    batch = batch.cache()
    n = batch.count()
    if n > 0:
        writer = batch.write.mode("append")
        if partition_col:
            writer = writer.partitionBy(partition_col)
        writer.parquet(target_dir)
    batch.unpersist()
    return n


def foreach_batch_upsert(
    target_dir: str, keys: list[str] | None = None
):
    """`writeStream.foreachBatch` handler wrapping `upsert_parquet` —
    the exactly-once sink: micro-batch replay rewrites the same keys,
    the anti-join drops them, zero duplicates land (chaos-tested in
    tests/test_streaming.py). With Delta this is `MERGE INTO target ON
    keys WHEN NOT MATCHED THEN INSERT *`."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        upsert_parquet(batch_df.sparkSession, batch_df, target_dir, keys)

    return handle


def foreach_batch_versioned(
    table_dir: str,
    app_id: str,
    keys: list[str] | None = None,
    when_matched: str = "update",
):
    """`writeStream.foreachBatch` handler committing each micro-batch
    into the VERSIONED table (sources/versioned.py) with Delta's `txn`
    idempotence: the manifest records (app_id, batch_id), so a replayed
    batch — crash after commit, before checkpoint — is a provable no-op
    instead of a duplicate append. Without ``keys`` each batch is an
    append commit; with ``keys`` it is a pruned MERGE (exactly-once
    upsert, the transactional form of `foreach_batch_upsert`)."""
    from open_source_financial_time_series_data_pipeline_architecture_spark.sources import (
        versioned as V,
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        import os as _os

        if keys:  # keyed sinks dedup EVERY batch — including the one
            # that creates the table, or batch 0's intra-batch
            # duplicates would violate the one-row-per-key contract
            batch_df = batch_df.dropDuplicates(keys)
        if not _os.path.isdir(_os.path.join(table_dir, "_versions")):
            V.commit(batch_df, table_dir, mode="append", txn=(app_id, batch_id))
        elif keys:
            V.merge(
                spark,
                table_dir,
                batch_df,
                keys,
                when_matched=when_matched,
                txn=(app_id, batch_id),
            )
        else:
            V.commit(batch_df, table_dir, mode="append", txn=(app_id, batch_id))

    return handle


def append_dlq(dlq_df: DataFrame, target_dir: str, checkpoint: str):
    """S13 — dead-letter side output as an append-only stream."""
    return (
        dlq_df.writeStream.format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )


def merge_parquet(
    spark: SparkSession,
    source: DataFrame,
    target_dir: str,
    keys: list[str] | None = None,
    when_matched: str = "update",
    partition_col: str | None = "trade_date",
) -> dict[str, int]:
    """Full MERGE INTO semantics on a parquet table without a
    transaction log — the Delta-less analog of
    reference spark/batch_feature_calculation.py:61-65:

      MERGE INTO target USING source ON keys
        WHEN MATCHED THEN UPDATE SET *   (when_matched='update')
        WHEN MATCHED THEN DELETE         (when_matched='delete')
        WHEN MATCHED THEN <nothing>      (when_matched='ignore')
        WHEN NOT MATCHED THEN INSERT *

    Scale strategy: only partitions PRESENT IN THE SOURCE batch are
    rewritten — the target is filtered to the affected partition values
    (partition pruning serves this from the dir listing), survivors are
    anti-joined against the source keys, and the union is written back
    with DYNAMIC partition overwrite, so a 10-row merge into a 100 TB
    table rewrites one day's partition, not the table. The affected
    partition-value collect is bounded by the source batch's distinct
    days. Caveat (documented): if a merge deletes a partition's LAST
    row, dynamic overwrite leaves the now-stale partition in place —
    a tombstone write or manifest is needed for that edge, which is
    exactly the bookkeeping a Delta log automates.

    Returns {"inserted": n, "updated"|"deleted": m}.
    """
    if when_matched not in ("update", "delete", "ignore"):
        raise ValueError(f"when_matched: {when_matched!r}")
    keys = keys or DEFAULT_KEYS
    source = source.dropDuplicates(keys)
    if partition_col and partition_col not in source.columns:
        source = source.withColumn(partition_col, F.to_date("time"))

    empty_target = not (
        os.path.isdir(target_dir)
        and any(not f.startswith("_") for f in os.listdir(target_dir))
    )
    if empty_target:
        n = source.count()
        writer = source.write.mode("overwrite")
        if partition_col:
            writer = writer.partitionBy(partition_col)
        writer.parquet(target_dir)
        return {"inserted": n, "updated": 0, "deleted": 0}

    target = spark.read.parquet(target_dir)
    if partition_col:
        parts = [r[0] for r in source.select(partition_col).distinct().collect()]
        affected = target.filter(F.col(partition_col).isin(parts))
    else:
        affected = target
    src_keys = source.select(*keys)
    n_matched = affected.join(src_keys, keys, "left_semi").count()
    survivors = affected.join(src_keys, keys, "left_anti")
    if when_matched == "update":
        merged = survivors.unionByName(source.select(*affected.columns))
        counts = {"inserted": source.count() - n_matched, "updated": n_matched, "deleted": 0}
    elif when_matched == "delete":
        unmatched_src = source.join(
            affected.select(*keys), keys, "left_anti"
        )
        merged = survivors.unionByName(unmatched_src.select(*affected.columns))
        counts = {"inserted": source.count() - n_matched, "updated": 0, "deleted": n_matched}
    else:  # ignore — first-write-wins upsert
        unmatched_src = source.join(
            affected.select(*keys), keys, "left_anti"
        )
        merged = affected.unionByName(unmatched_src.select(*affected.columns))
        counts = {"inserted": source.count() - n_matched, "updated": 0, "deleted": 0}

    # the merged plan READS target_dir and the write OVERWRITES it —
    # materialize (cut lineage) first or Spark rejects the self-overwrite.
    # The checkpoint's working set is the affected partitions only, i.e.
    # exactly the rewrite granularity.
    merged = merged.localCheckpoint()
    writer = merged.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    )
    if partition_col:
        writer = writer.partitionBy(partition_col)
    writer.parquet(target_dir)
    return counts


def compact_parquet_dir(
    spark: SparkSession,
    target_dir: str,
    max_records_per_file: int = 1_000_000,
    partition_col: str | None = None,
) -> dict[str, int]:
    """Small-file compaction — the maintenance job every streaming sink
    needs: micro-batch appends leave thousands of KB-sized files whose
    open/footer cost eventually dominates scans (the reference relies on
    TimescaleDB chunk management + S3 lifecycle for the same hygiene,
    src/cost/s3_lifecycle.py; a lakehouse runs OPTIMIZE).

    Strategy: read the table, write it back ATOMICALLY VIA A SIDE DIR
    (write to `<dir>.__compact__`, then swap) with
    ``maxRecordsPerFile`` bounding file size. Partitioned layouts pass
    ``partition_col`` to preserve the directory scheme (each partition
    compacts to ⌈rows/max⌉ files). Row data is byte-identical — only
    the file layout changes. Returns before/after file counts.

    At 100 TB: run per-partition on recent partitions only (older ones
    are already compacted); this whole-table form is the building
    block the scheduler calls with a partition predicate.
    """
    def _count_files(d: str) -> int:
        n = 0
        for root, _dirs, files in os.walk(d):
            n += sum(
                1
                for f in files
                if f.endswith(".parquet") and not f.startswith(("_", "."))
            )
        return n

    before = _count_files(target_dir)
    df = spark.read.parquet(target_dir)
    tmp_dir = target_dir.rstrip("/") + ".__compact__"
    writer = (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
    )
    if partition_col:
        writer = writer.partitionBy(partition_col)
    writer.parquet(tmp_dir)
    old_dir = target_dir.rstrip("/") + ".__old__"
    os.rename(target_dir, old_dir)
    os.rename(tmp_dir, target_dir)
    shutil.rmtree(old_dir)
    return {"files_before": before, "files_after": _count_files(target_dir)}
