"""Scale smoke: the core pipeline on 1M synthetic trades (10× the sf0.1
events volume) — no collect-bottlenecks, plans stay shuffle-lean, and
row counts land exactly where the generator math says they must."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark import functions as FX
from open_source_financial_time_series_data_pipeline_architecture_spark import operators as OPS

N = 1_000_000
SYMBOLS = 20


def _synth_trades(spark):
    # 1M trades across 20 symbols, one trade per symbol per 10s slot
    return spark.range(N).select(
        F.timestamp_seconds(
            F.lit(1_700_000_000) + (F.col("id") / SYMBOLS).cast("long") * 10
        ).alias("time"),
        F.concat(F.lit("SYM"), (F.col("id") % SYMBOLS).cast("string")).alias("symbol"),
        (100 + F.pmod(F.xxhash64("id"), 1000) / 100.0).alias("price"),
        (1 + F.pmod(F.xxhash64("id", F.lit(1)), 100).cast("double")).alias("volume"),
        F.col("id").cast("string").alias("trade_id"),
    )


def test_core_pipeline_at_1m_rows(spark):
    trades = _synth_trades(spark)
    # 50k slots of 10s → 500k (minute, symbol) groups of exactly 6 trades
    ohlc = FX.ohlc(trades, 60)
    stats = ohlc.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("trade_count").alias("mn"),
        F.max("trade_count").alias("mx"),
    ).collect()[0]
    expected_buckets = (N // SYMBOLS // 6) * SYMBOLS  # 6 trades per minute
    assert abs(stats["n"] - expected_buckets) <= SYMBOLS  # boundary minutes
    assert stats["mx"] == 6

    vw = FX.vwap(trades, 300)
    assert vw.filter(F.col("vwap").isNull()).count() == 0

    # as-of join: 10k probes against the 1M-row OHLC table, zero leakage
    probes = trades.filter(F.col("trade_id").cast("long") % 100 == 0).select(
        "symbol", F.col("time").alias("event_timestamp")
    )
    joined = OPS.asof_join(
        probes,
        ohlc.select("symbol", "bucket", F.col("close").alias("ohlc_close")),
        entity_time="event_timestamp",
        feature_time="bucket",
        matched_time_col="mt",
    )
    agg = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("mt") > F.col("event_timestamp"), 1)).alias("leaks"),
        F.count(F.when(F.col("ohlc_close").isNull(), 1)).alias("nulls"),
    ).collect()[0]
    assert agg["n"] == N // 100
    assert agg["leaks"] == 0
    assert agg["nulls"] == 0  # every probe time has a current bucket


def test_range_frame_window_at_1m_rows(spark):
    """Trailing-5-minute RANGE frame over 1M rows: one shuffle, and the
    generator's fixed 10s spacing makes the frame size exactly
    predictable (31 rows once warmed up: 300s/10s + current)."""
    from pyspark.sql import Window

    trades = _synth_trades(spark)
    w = (
        Window.partitionBy("symbol")
        .orderBy(F.unix_micros(F.col("time")))
        .rangeBetween(-300_000_000, 0)
    )
    framed = trades.select(
        "symbol", F.count(F.lit(1)).over(w).alias("n_5m")
    )
    stats = framed.agg(
        F.count(F.lit(1)).alias("n"), F.max("n_5m").alias("mx"), F.min("n_5m").alias("mn")
    ).collect()[0]
    assert stats["n"] == N
    assert stats["mx"] == 31  # 30 preceding 10s slots + current
    assert stats["mn"] == 1


def test_vectorized_knn_at_100k_corpus(spark):
    """Arrow-batched kNN against a 100k-vector synthetic corpus: corpus
    scanned once, 8 queries, top-5 each — checks the scoring path at
    20x the sf0.1 embeddings volume."""
    from open_source_financial_time_series_data_pipeline_architecture_spark.operators import (
        similarity as SIM,
    )

    corpus = spark.range(100_000).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda i: F.pmod(F.xxhash64(F.col("id"), i), 1000) / 1000.0,
        ).alias("embedding"),
    )
    qs = corpus.filter(F.col("vec_id") % 12347 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = SIM.knn_join_vectorized(qs, corpus, k=5)
    rows = out.groupBy("query_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert len(rows) == 9 and all(r["n"] == 5 for r in rows)
    # every query's own vector must rank #1 with cosine 1.0
    self_hits = out.filter(
        (F.col("query_id") == F.col("vec_id")) & (F.col("rank") == 1)
    ).count()
    assert self_hits == 9


def test_versioned_merge_prune_at_1m_rows(spark, tmp_path):
    """Storage plane at 10× sf0.1 volume: a clustered 1M-row versioned
    table takes a 1k-row merge by rewriting ONLY the envelope-matching
    files, and a point-range pruned read plans a strict file subset."""
    from open_source_financial_time_series_data_pipeline_architecture_spark.sources import (
        versioned as V,
    )

    t = str(tmp_path / "big")
    trades = _synth_trades(spark).withColumn(
        "tid", F.col("trade_id").cast("long")
    )
    V.commit(trades.repartitionByRange(16, "tid"), t)

    # pruned read: a 1%-of-keyspace range touches ~1/16th of the files
    rep: dict = {}
    got = V.read_version(
        spark, t, predicates=[("tid", ">=", 990_000)], prune_report=rep
    )
    assert got.count() == 10_000
    assert rep["files_kept"] <= 2 and rep["files_total"] == 16

    # merge 1000 updated rows clustered in one range: ≤2 files rewritten
    src = trades.filter(
        (F.col("tid") >= 500_000) & (F.col("tid") < 501_000)
    ).withColumn("price", F.col("price") + 1.0)
    mrep: dict = {}
    V.merge(spark, t, src, keys=["tid"], report=mrep)
    assert mrep["files_rewritten"] <= 2 and mrep["files_total"] == 16
    assert V.read_version(spark, t).count() == N
    # the updated band really changed, everything else untouched
    chk = (
        V.read_version(
            spark,
            t,
            predicates=[("tid", ">=", 499_999), ("tid", "<=", 501_000)],
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )
    assert chk["n"] == 1_002


def test_100k_file_commit_log_planning_is_bounded(spark, tmp_path):
    """The round-5 incremental log at six-figure file counts: a
    fabricated 100k-file snapshot (stats checkpoint + segments) takes a
    real append whose COMMIT BYTES are O(touched), and a selective
    pruned read plans via the distributed stats-parquet path — the
    driver collects only the kept names, never 100k envelopes."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from open_source_financial_time_series_data_pipeline_architecture_spark.sources import (
        versioned as V,
    )

    t = str(tmp_path / "big_log")
    os.makedirs(os.path.join(t, V._VERSIONS))
    os.makedirs(os.path.join(t, V._DATA))
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
    )
    n_files = 100_000
    names = [f"v1-{i:08x}-part-{i}.parquet" for i in range(n_files)]
    stats = {
        n: {"rows": 10, "cols": {"id": {"min": 10 * i, "max": 10 * i + 9, "nulls": 0}}}
        for i, n in enumerate(names)
    }
    seg = V._segment(
        1,
        "overwrite",
        add=names,
        stats=stats,
        reset=True,
        schema_json=schema.json(),
        txn={},
        constraints={},
        bloom_cols=None,
        n_files=n_files,
    )
    V._publish(t, seg)
    V._write_checkpoint(t, V._snapshot(t, 1, with_stats=True))
    # real bytes only for the one file the selective predicate keeps
    pq.write_table(
        pa.table(
            {
                "id": pa.array(range(999_990, 1_000_000), pa.int64()),
                "v": pa.array([1] * 10, pa.int64()),
            }
        ),
        os.path.join(t, V._DATA, names[-1]),
    )

    # a real append on the 100k-file table: segment is O(touched)
    m2 = V.commit(
        spark.createDataFrame([(2_000_000, 1)], "id long, v long").coalesce(1),
        t,
        mode="append",
    )
    assert m2["n_files"] == n_files + 1
    seg2_bytes = os.path.getsize(os.path.join(t, V._VERSIONS, "00000002.json"))
    assert seg2_bytes < 10_000  # round-4 format: ~10 MB (full file list)

    # pruned read plans through the checkpoint stats parquet
    rep: dict = {}
    t0 = time.monotonic()
    got = V.read_version(
        spark,
        t,
        predicates=[("id", ">=", 999_990), ("id", "<=", 999_999)],
        prune_report=rep,
    )
    n = got.count()
    plan_s = time.monotonic() - t0
    assert rep == {"files_total": n_files + 1, "files_kept": 1}
    assert n == 10
    assert plan_s < 60  # a Spark job over 100k stats rows, not 100k
    # driver-python envelope loops (generous bound for a loaded box)
