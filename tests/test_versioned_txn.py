"""Transaction-identifier idempotence on the versioned table (Delta's
`txn` action): replayed streaming micro-batches are provable no-ops,
through commit(), merge(), and the foreachBatch sink — including a real
checkpointed stream restarted mid-topic."""

from __future__ import annotations

import os
import time as _time

from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.sources import versioned as V
from open_source_financial_time_series_data_pipeline_architecture_spark.sources.sinks import (
    foreach_batch_versioned,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumn("v", F.col("id") * 10.0)


def test_commit_txn_replay_is_noop(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10), t, mode="append", txn=("app", 0))
    m = V.commit(_df(spark, 0, 10), t, mode="append", txn=("app", 0))
    assert m["version"] == 1  # replay skipped
    assert V.read_version(spark, t).count() == 10
    m2 = V.commit(_df(spark, 10, 20), t, mode="append", txn=("app", 1))
    assert m2["version"] == 2 and m2["txn"] == {"app": 1}
    assert V.last_txn_version(t, "app") == 1
    assert V.last_txn_version(t, "other") is None
    # an OLDER txn version replaying after a newer one is also skipped
    m3 = V.commit(_df(spark, 0, 10), t, mode="append", txn=("app", 0))
    assert m3["version"] == 2
    assert V.read_version(spark, t).count() == 20


def test_txn_is_per_application(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 5), t, mode="append", txn=("a", 0))
    V.commit(_df(spark, 5, 10), t, mode="append", txn=("b", 0))
    m = V._read_manifest(t, 2)
    assert m["txn"] == {"a": 0, "b": 0}  # high-water marks merge forward
    assert V.read_version(spark, t).count() == 10


def test_merge_txn_replay_is_noop(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10), t)
    V.merge(spark, t, _df(spark, 3, 4), keys=["id"], txn=("app", 7))
    rep: dict = {}
    m = V.merge(spark, t, _df(spark, 3, 4), keys=["id"], txn=("app", 7), report=rep)
    assert rep.get("replayed") and m["version"] == 2
    assert V.read_version(spark, t).count() == 10


def test_foreach_batch_versioned_replay(spark, tmp_path):
    t = str(tmp_path / "tbl")
    handle = foreach_batch_versioned(t, app_id="job1")
    handle(_df(spark, 0, 10), 0)
    handle(_df(spark, 0, 10), 0)  # foreachBatch replay after a crash
    handle(_df(spark, 10, 20), 1)
    got = V.read_version(spark, t)
    assert got.count() == 20
    assert {r["id"] for r in got.collect()} == set(range(20))


def test_foreach_batch_versioned_merge_mode(spark, tmp_path):
    t = str(tmp_path / "tbl")
    handle = foreach_batch_versioned(t, app_id="job1", keys=["id"])
    # the TABLE-CREATING batch dedups on keys too (late+corrected event
    # in batch 0 must not land twice)
    first = _df(spark, 0, 10).unionByName(_df(spark, 9, 10))
    handle(first, 0)
    from open_source_financial_time_series_data_pipeline_architecture_spark.sources import (
        versioned as V,
    )

    assert V.read_version(spark, t).count() == 10
    upd = spark.range(5, 15).withColumn("v", F.col("id") * 100.0)
    handle(upd, 1)
    handle(upd, 1)  # replayed merge batch
    got = {(r["id"], r["v"]) for r in V.read_version(spark, t).collect()}
    assert len(got) == 15
    assert (5, 500.0) in got and (5, 50.0) not in got
    assert (14, 1400.0) in got


def test_stream_restart_exactly_once(spark, tmp_path):
    """A real checkpointed stream into the versioned sink, killed and
    restarted with more data: every source row lands exactly once."""
    topic = tmp_path / "topic"
    topic.mkdir()
    t = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    def _emit(name: str, lo: int, hi: int, mtime: float):
        p = str(topic / name)
        _df(spark, lo, hi).coalesce(1).write.mode("overwrite").parquet(p + ".tmp")
        part = next(
            f for f in os.listdir(p + ".tmp") if f.endswith(".parquet")
        )
        os.rename(os.path.join(p + ".tmp", part), p)
        os.utime(p, (mtime, mtime))  # FileStreamSource orders by mtime

    now = _time.time()
    _emit("a.parquet", 0, 10, now - 30)
    _emit("b.parquet", 10, 20, now - 20)

    def _run():
        q = (
            spark.readStream.schema("id long, v double")
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "*.parquet")
            .parquet(str(topic))
            .writeStream.foreachBatch(foreach_batch_versioned(t, app_id="s1"))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _run()
    assert V.read_version(spark, t).count() == 20
    _emit("c.parquet", 20, 30, now - 10)
    _run()  # restart from the checkpoint
    got = V.read_version(spark, t)
    assert got.count() == 30
    assert {r["id"] for r in got.collect()} == set(range(30))
    # batch ids advanced monotonically in the manifest txn map
    assert V.last_txn_version(t, "s1") == 2
