"""Versioned parquet table (Delta-lite): snapshots, time travel,
append commits, vacuum, and reader isolation from staged writes."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.sources import versioned as V


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumn("v", F.col("id") * 10)


def test_overwrite_commits_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 100), t)
    V.commit(_df(spark, 0, 50), t)  # snapshot 2 shrinks the table

    assert V.read_version(spark, t).count() == 50  # latest
    assert V.read_version(spark, t, version=1).count() == 100  # time travel
    assert [h["version"] for h in V.history(t)] == [1, 2]


def test_append_commit_unions_files_without_rewrite(spark, tmp_path):
    t = str(tmp_path / "tbl")
    m1 = V.commit(_df(spark, 0, 100), t)
    m2 = V.commit(_df(spark, 100, 150), t, mode="append")
    assert set(m1["files"]) <= set(m2["files"])  # old files carried forward
    assert V.read_version(spark, t).count() == 150
    assert V.read_version(spark, t, version=1).count() == 100
    got = {r["id"] for r in V.read_version(spark, t).collect()}
    assert got == set(range(150))


def test_vacuum_drops_unreferenced_files_keeps_latest(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 100), t)
    V.commit(_df(spark, 0, 10), t)  # overwrite → v1 files now orphanable
    deleted = V.vacuum(t, keep_last=1)
    assert deleted >= 1
    assert V.read_version(spark, t).count() == 10  # latest intact
    assert [h["version"] for h in V.history(t)] == [2]


def test_killed_writer_leaves_readers_unaffected(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 100), t)
    # simulate a writer dying after staging data but before the
    # manifest rename: drop an orphan parquet into data/
    orphan = os.path.join(t, "data", "v9-deadbeef-orphan.parquet")
    _df(spark, 0, 5).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orphan_src")
    )
    src = next(
        f
        for f in os.listdir(tmp_path / "orphan_src")
        if f.endswith(".parquet")
    )
    os.rename(str(tmp_path / "orphan_src" / src), orphan)
    # readers resolve manifests only — the orphan is invisible
    assert V.read_version(spark, t).count() == 100
    # a FRESH future-version file might be a live in-flight commit —
    # vacuum must spare it until the in-flight grace window passes
    assert V.vacuum(t, keep_last=1) == 0
    assert os.path.exists(orphan)
    # age the orphan past the grace window (writer provably dead)
    past = os.path.getmtime(orphan) - V.INFLIGHT_GRACE_S - 60
    os.utime(orphan, (past, past))
    assert V.vacuum(t, keep_last=1) == 1
