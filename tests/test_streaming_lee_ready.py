"""Streaming Lee–Ready (prevailing-quote) vs the batch window plan:
row-exact parity across micro-batch boundaries — the carried state
(last price, last mid, tick direction) must reproduce the batch
growing-window semantics exactly."""

from __future__ import annotations

import os
import time as _time

from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.functions import (
    microstructure as MS,
)
from open_source_financial_time_series_data_pipeline_architecture_spark.schema import (
    TRADES_SCHEMA,
    trades_from_events,
)
from open_source_financial_time_series_data_pipeline_architecture_spark.sources import load_table
from open_source_financial_time_series_data_pipeline_architecture_spark.streaming.cep import (
    streaming_lee_ready,
)

SF = "/root/testdata/sf0.001"


def test_streaming_matches_batch_across_batches(spark, tmp_path):
    trades = trades_from_events(load_table(spark, SF, "events"))
    cut = trades.agg(
        F.percentile_approx("time", 0.5).alias("c")
    ).first()["c"]

    topic = tmp_path / "topic"
    topic.mkdir()
    now = _time.time()
    for i, part in enumerate(
        (trades.filter(F.col("time") <= cut), trades.filter(F.col("time") > cut))
    ):
        p = str(topic / f"b{i}.parquet")
        part.coalesce(1).write.mode("overwrite").parquet(p + ".d")
        f = next(x for x in os.listdir(p + ".d") if x.endswith(".parquet"))
        os.rename(os.path.join(p + ".d", f), p)
        os.utime(p, (now - 20 + 10 * i,) * 2)  # mtime orders the batches

    stream = (
        spark.readStream.schema(TRADES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet")
        .parquet(str(topic))
    )
    q = (
        streaming_lee_ready(stream)
        .writeStream.format("memory")
        .queryName("lr_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["symbol"], r["trade_id"]): r["cls"]
        for r in spark.sql("select * from lr_stream").collect()
    }
    exp = {
        (r["symbol"], r["trade_id"]): r["cls"]
        for r in MS.lee_ready_prevailing_labels(trades).collect()
    }
    assert len(got) == trades.count()
    assert got == exp  # row-exact, including rows right at the batch cut
