"""Round-4 versioned-table extensions: put-if-absent commits
(optimistic concurrency), schema enforcement/evolution on append,
change data feed, compaction (plain + Z-ordered), and the streaming
tail source over the commit log."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from open_source_financial_time_series_data_pipeline_architecture_spark.sources import versioned as V
from open_source_financial_time_series_data_pipeline_architecture_spark.sources.versioned_stream import (
    VersionedTailDataSource,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumn("v", F.col("id") * 10)


# ---------------------------------------------------------------- concurrency


def test_publish_is_put_if_absent(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10), t)
    # a second manifest for an existing version must NOT silently
    # replace the first (the os.rename lost-update hazard)
    with pytest.raises(V.ConcurrentCommitError):
        V._publish(t, {"version": 1, "mode": "overwrite", "files": [], "schema": "{}"})
    assert V.read_version(spark, t).count() == 10  # winner untouched


def test_append_retries_past_concurrent_writer(spark, tmp_path, monkeypatch):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10), t)

    orig = V._stage_files
    state = {"raced": False}

    def racy(df, table_dir, next_v, bloom_cols=None):
        files = orig(df, table_dir, next_v, bloom_cols)
        if not state["raced"]:
            state["raced"] = True
            # a competing writer lands version 2 while we are staging
            monkeypatch.setattr(V, "_stage_files", orig)
            V.commit(_df(spark, 100, 105), t, mode="append")
            monkeypatch.setattr(V, "_stage_files", racy)
        return files

    monkeypatch.setattr(V, "_stage_files", racy)
    m = V.commit(_df(spark, 200, 203), t, mode="append")
    # the loser retried at version 3 carrying the WINNER's files forward
    assert m["version"] == 3
    got = {r["id"] for r in V.read_version(spark, t).collect()}
    assert got == set(range(10)) | set(range(100, 105)) | set(range(200, 203))


def test_expected_base_is_compare_and_swap(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10), t)
    with pytest.raises(V.ConcurrentCommitError):
        V.commit(_df(spark, 0, 5), t, expected_base=0)  # head moved to 1
    V.commit(_df(spark, 0, 5), t, expected_base=1)  # CAS against the head


# ------------------------------------------------------- schema enforcement


def test_append_schema_mismatch_rejected(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10), t)
    widened = _df(spark, 10, 20).withColumn(
        "extra", F.when(F.col("id") >= 0, F.col("id") * 1.0)
    )
    with pytest.raises(V.SchemaMismatchError):
        V.commit(widened, t, mode="append")
    assert [h["version"] for h in V.history(t)] == [1]


def test_append_schema_evolution_adds_nullable_column(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10), t)
    widened = _df(spark, 10, 20).withColumn(
        "extra", F.when(F.col("id") >= 0, F.col("id") * 1.0)
    )
    V.commit(widened, t, mode="append", allow_evolution=True)
    out = V.read_version(spark, t)
    assert "extra" in out.columns and out.count() == 20
    # old files surface NULL for the evolved column
    assert out.filter(F.col("extra").isNull()).count() == 10
    # non-nullable addition stays rejected
    bad = _df(spark, 20, 30).withColumn("req", F.lit(1))
    with pytest.raises(V.SchemaMismatchError):
        V.commit(bad, t, mode="append", allow_evolution=True)


# ------------------------------------------------------------ change data feed


def test_read_changes_append_is_insert_only(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10), t)
    V.commit(_df(spark, 10, 15), t, mode="append")
    ch = V.read_changes(spark, t, 1)
    rows = ch.collect()
    assert {r["_change_type"] for r in rows} == {"insert"}
    assert {r["_commit_version"] for r in rows} == {2}
    assert {r["id"] for r in rows} == set(range(10, 15))


def test_read_changes_overwrite_diffs_content(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10), t)
    # v2 rewrites: drops ids 0-4, adds 10-12, keeps 5-9 byte-identical
    V.commit(_df(spark, 5, 13), t)
    ch = V.read_changes(spark, t, 1).collect()
    ins = {r["id"] for r in ch if r["_change_type"] == "insert"}
    dels = {r["id"] for r in ch if r["_change_type"] == "delete"}
    assert ins == {10, 11, 12}
    assert dels == {0, 1, 2, 3, 4}


def test_read_changes_empty_range_and_optimize_skipped(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10), t)
    assert V.read_changes(spark, t, 1).count() == 0
    V.compact(spark, t, n_files=1)
    ch = V.read_changes(spark, t, 1)
    assert ch.count() == 0  # compaction is logically invisible
    assert "_change_type" in ch.columns


def test_read_changes_across_evolution_uses_end_schema(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 5), t)
    widened = _df(spark, 5, 8).withColumn(
        "extra", F.when(F.col("id") >= 0, F.col("id") * 1.0)
    )
    V.commit(widened, t, mode="append", allow_evolution=True)
    ch = V.read_changes(spark, t, 1)
    assert set(ch.columns) == {"id", "v", "extra", "_change_type", "_commit_version"}
    assert ch.count() == 3


# ----------------------------------------------------------------- compaction


def _n_data_files(t):
    return len([f for f in os.listdir(os.path.join(t, "data")) if f.endswith(".parquet")])


def test_compact_preserves_content_reduces_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 40).repartition(4), t)
    V.commit(_df(spark, 40, 80).repartition(4), t, mode="append")
    before = V.read_version(spark, t)
    assert len(V._read_manifest(t, 2)["files"]) == 8
    m = V.compact(spark, t, n_files=2)
    assert m["mode"] == "optimize" and len(m["files"]) <= 2
    after = V.read_version(spark, t)
    assert after.count() == 80
    assert before.exceptAll(after).count() == 0
    assert after.exceptAll(before).count() == 0
    # vacuum reclaims the pre-compaction files; head stays readable
    deleted = V.vacuum(t, keep_last=1)
    assert deleted >= 8
    assert V.read_version(spark, t).count() == 80


def test_compact_zorder_clusters_and_preserves(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.range(0, 400).select(
        F.col("id"),
        (F.col("id") % 20).alias("x"),
        (F.col("id") % 17).alias("y"),
    )
    V.commit(df.repartition(8), t)
    V.compact(spark, t, n_files=4, zorder_cols=["x", "y"])
    out = V.read_version(spark, t)
    assert out.count() == 400
    assert out.exceptAll(df).count() == 0


# ------------------------------------------------------------- streaming tail


def _register_tail(spark):
    try:
        spark.dataSource.register(VersionedTailDataSource)
    except Exception:
        pass  # already registered in this session


def test_streaming_tail_follows_appends(spark, tmp_path):
    _register_tail(spark)
    t = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    V.commit(_df(spark, 0, 10), t, mode="append")

    def run():
        # memory sinks cannot recover a checkpoint across restarts;
        # foreachBatch can — and is the production sink shape anyway
        got: list[int] = []

        def sink(batch_df, _bid):
            got.extend(r["id"] for r in batch_df.select("id").collect())

        q = (
            spark.readStream.format("versioned_tail")
            .option("path", t)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return got

    assert set(run()) == set(range(10))

    V.commit(_df(spark, 10, 14), t, mode="append")
    V.compact(spark, t, n_files=1)  # must NOT re-emit
    assert set(run()) == set(range(10, 14))  # same checkpoint → new rows only


def test_streaming_tail_overwrite_policies(spark, tmp_path):
    _register_tail(spark)
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 6), t, mode="append")
    V.commit(_df(spark, 100, 103), t)  # overwrite

    def run(policy, name, ckpt):
        q = (
            spark.readStream.format("versioned_tail")
            .option("path", t)
            .option("on_overwrite", policy)
            .load()
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.sql(f"select id from {name}")

    from pyspark.errors import StreamingQueryException

    with pytest.raises(StreamingQueryException):
        run("fail", "vtail_f", "c1")
    snap = run("snapshot", "vtail_s", "c2")
    # first-batch range spans append(6 rows) + overwrite snapshot(3)
    assert {r["id"] for r in snap.collect()} == set(range(6)) | {100, 101, 102}
    skip = run("skip", "vtail_k", "c3")
    assert {r["id"] for r in skip.collect()} == set(range(6))


def test_streaming_tail_reads_evolved_table(spark, tmp_path):
    _register_tail(spark)
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 5), t, mode="append")
    widened = _df(spark, 5, 8).withColumn(
        "extra", F.when(F.col("id") >= 0, F.col("id") * 1.0)
    )
    V.commit(widened, t, mode="append", allow_evolution=True)
    q = (
        spark.readStream.format("versioned_tail")
        .option("path", t)
        .load()
        .writeStream.format("memory")
        .queryName("vtail_evo")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select id, extra from vtail_evo").collect()
    assert len(rows) == 8
    # pre-evolution files surface NULL for the evolved column
    assert {r["id"] for r in rows if r["extra"] is None} == set(range(5))
    assert {r["id"] for r in rows if r["extra"] is not None} == {5, 6, 7}


def test_streaming_cdf_matches_batch_feed(spark, tmp_path):
    """The versioned_cdf stream must reconstruct exactly what the batch
    change feed reports across append + merge + delete + overwrite
    commits (optimize/metadata silent)."""
    from open_source_financial_time_series_data_pipeline_architecture_spark.sources.versioned_stream import (
        VersionedCDFDataSource,
    )

    try:
        spark.dataSource.register(VersionedCDFDataSource)
    except Exception:
        pass
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 6), t)                                  # v1 snapshot
    V.commit(_df(spark, 6, 9), t, mode="append")                   # v2 inserts
    V.merge(                                                       # v3 update
        spark,
        t,
        spark.range(2, 3).withColumn("v", F.col("id") * 100),
        keys=["id"],
    )
    V.compact(spark, t, n_files=1)                                 # v4 silent
    V.delete_where(spark, t, [("id", "=", 7)])                     # v5 delete
    V.commit(_df(spark, 0, 2), t)                                  # v6 rewrite

    q = (
        spark.readStream.format("versioned_cdf")
        .option("path", t)
        .load()
        .writeStream.format("memory")
        .queryName("vcdf")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["_commit_version"], r["_change_type"], r["id"], r["v"])
        for r in spark.sql("select * from vcdf").collect()
    }
    exp = {
        (r["_commit_version"], r["_change_type"], r["id"], r["v"])
        for r in V.read_changes(spark, t, 0).collect()
    }
    assert got == exp
    assert {v for (v, *_rest) in got} == {1, 2, 3, 5, 6}  # 4 is silent
    assert (3, "delete", 2, 20) in got and (3, "insert", 2, 200) in got
    assert (5, "delete", 7, 70) in got


def test_streaming_tail_schema_from_manifest(spark, tmp_path):
    _register_tail(spark)
    t = str(tmp_path / "tbl")
    V.commit(
        spark.range(0, 3).select(
            F.col("id"), F.col("id").cast("string").alias("s")
        ),
        t,
    )
    df = (
        spark.readStream.format("versioned_tail").option("path", t).load()
    )
    assert [(f.name, f.dataType) for f in df.schema.fields] == [
        ("id", T.LongType()),
        ("s", T.StringType()),
    ]
