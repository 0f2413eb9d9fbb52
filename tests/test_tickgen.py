"""Custom Python Data Source (`tickgen`): batch + streaming synthetic
trades generated on executors, deterministic under replay.

Mirrors the reference generator's distributional contract
(scripts/generate_test_data.py): random-walk prices, volume U(10,1000),
spread U(0.01,0.10), ~1% injected large trades, occasional NULL side.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.sources.tickgen import (
    TickGenDataSource,
)


@pytest.fixture(scope="module", autouse=True)
def register(spark):
    spark.dataSource.register(TickGenDataSource)


def _read(spark, **opts):
    r = spark.read.format("tickgen")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_schema_and_counts(spark):
    df = _read(spark, rows_per_symbol=200, seed=7)
    assert df.columns == [
        "time", "symbol", "price", "volume", "trade_id", "side", "bid", "ask", "source",
    ]
    by_sym = {r["symbol"]: r["n"] for r in df.groupBy("symbol").agg(F.count("*").alias("n")).collect()}
    assert set(by_sym) == {"AAPL", "GOOGL", "MSFT", "AMZN", "TSLA"}
    assert all(n == 200 for n in by_sym.values())


def test_batch_deterministic_across_reads(spark):
    a = sorted(map(tuple, _read(spark, rows_per_symbol=150, seed=11).collect()))
    b = sorted(map(tuple, _read(spark, rows_per_symbol=150, seed=11).collect()))
    assert a == b
    c = sorted(map(tuple, _read(spark, rows_per_symbol=150, seed=12).collect()))
    assert a != c


def test_slices_partition_without_changing_rows(spark):
    whole = sorted(map(tuple, _read(spark, rows_per_symbol=120, seed=3).collect()))
    sliced_df = _read(spark, rows_per_symbol=120, seed=3, slices_per_symbol=4)
    assert sliced_df.rdd.getNumPartitions() == 20  # 5 symbols x 4 slices
    assert sorted(map(tuple, sliced_df.collect())) == whole


def test_distributional_contract(spark):
    df = _read(spark, rows_per_symbol=2000, seed=42).cache()
    stats = df.agg(
        F.min("price").alias("minp"),
        F.avg((F.col("ask") - F.col("bid"))).alias("avg_spread"),
        F.avg(F.col("side").isNull().cast("int")).alias("null_side_rate"),
        F.avg((F.col("volume") > 5000).cast("int")).alias("large_rate"),
    ).collect()[0]
    assert stats["minp"] >= 1.0
    assert 0.01 <= stats["avg_spread"] <= 0.10
    assert 0.05 <= stats["null_side_rate"] <= 0.15
    assert 0.0 < stats["large_rate"] <= 0.03
    # bid < price < ask always
    assert df.filter(~((F.col("bid") < F.col("price")) & (F.col("price") < F.col("ask")))).count() == 0
    df.unpersist()


def test_streaming_batches_deterministic(spark, tmp_path):
    stream = (
        spark.readStream.format("tickgen")
        .option("rows_per_batch", 50)
        .option("seed", 5)
        .option("symbols", "AAPL,MSFT")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("tickstream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) c FROM tickstream").collect()[0]["c"]
            if n >= 200:
                break
            time.sleep(1)
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM tickstream").collect()
    assert len(got) >= 200
    # the stream's first rows == the batch generator's first rows
    batch = {
        tuple(r)
        for r in _read(spark, rows_per_symbol=50, seed=5, symbols="AAPL,MSFT").collect()
    }
    first_batch = {tuple(r) for r in got if tuple(r) in batch}
    assert first_batch == batch
