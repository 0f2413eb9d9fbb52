"""Batch-checkable streaming: run a Structured Streaming job to
completion with `availableNow` and hand back the materialized result.

This gives the streaming plane a correctness surface an external
batch-vs-SQL gate can grade: the same events parquet is consumed as a
STREAM (file source → watermark/stateful ops → memory sink), the query
drains with Trigger.AvailableNow, and the sink table is returned as a
plain DataFrame to compare against a DuckDB oracle over the identical
input. Reference behavior being mirrored:
/root/reference/spark/streaming_feature_updates.py:96-126 (windowed
feature upserts) and src/monitoring/anomaly_detection.py:40-102.

At production scale the memory sink is replaced by the foreachBatch
upsert in `streaming/pipeline.py`; `availableNow` is unchanged — it is
exactly Spark's catch-up-then-stop processing mode, so one code path
serves both continuous and backfill runs.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import apply_runtime_confs


def load_stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Streaming read of ``<sf_dir>/<name>.parquet``, whichever shape
    it has: a single committed fixture FILE (the file stream source
    needs a directory base path, so the listing is glob-filtered down
    to it) or a DIRECTORY of part files (any real multi-file
    deployment, and the bench scaling probe's generated corpus).
    Without the directory branch the single-file glob silently matched
    NOTHING — an empty stream that looked like a very fast query
    (round-6 finding). Schema comes from a footer-only batch peek
    (stream sources cannot infer)."""
    apply_runtime_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema).format("parquet")
    if os.path.isdir(path):
        return reader.option("pathGlobFilter", "*.parquet").load(path)
    return reader.option("pathGlobFilter", f"{name}.parquet").load(sf_dir)


def load_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming read of the events table (file source, explicit schema
    — streaming sources cannot infer). Applies the same nanos→micros
    normalization as the batch `sources.load_table`."""
    apply_runtime_confs(spark)
    df = load_stream_table(spark, sf_dir, "events")
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif isinstance(ts_type, T.TimestampNTZType):
        # Spark 4.1 reads parquet TIMESTAMP(NANOS) as NTZ; watermarks
        # require TIMESTAMP. Session zone is UTC, so this is a re-tag.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def run_available_now(
    df: DataFrame, output_mode: str = "append"
) -> DataFrame:
    """Drain a streaming DataFrame into a memory sink with
    Trigger.AvailableNow and return the sink table (batch DataFrame).

    A fresh query name + checkpoint per call keeps repeated invocations
    in one session independent (the driver may call a query twice)."""
    name = "snk_" + uuid.uuid4().hex[:12]
    ckpt = tempfile.mkdtemp(prefix="spark_ckpt_")
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)
