"""Predicate DML on the versioned table (DELETE/UPDATE WHERE with
file-level pruning) and TIMESTAMP AS OF time travel."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.sources import versioned as V


def _seed(spark, t, n=100, files=4):
    df = spark.range(0, n).withColumn("v", F.col("id") * 10.0)
    V.commit(df.repartitionByRange(files, "id"), t)


def test_delete_where_prunes_and_removes(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _seed(spark, t)
    rep: dict = {}
    m = V.delete_where(spark, t, [("id", ">=", 90)], report=rep)
    assert m["mode"] == "merge" and m["version"] == 2
    assert rep["files_rewritten"] < rep["files_total"] == 4
    ids = {r["id"] for r in V.read_version(spark, t).collect()}
    assert ids == set(range(90))
    # CDC sees exactly the deleted rows
    ch = V.read_changes(spark, t, 1, 2)
    dels = {r["id"] for r in ch.filter("_change_type = 'delete'").collect()}
    assert dels == set(range(90, 100))
    assert ch.filter("_change_type = 'insert'").count() == 0


def test_delete_where_null_predicate_rows_survive(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.range(0, 10).withColumn(
        "v", F.when(F.col("id") % 2 == 0, F.col("id") * 1.0)
    )
    V.commit(df.coalesce(1), t)
    V.delete_where(spark, t, [("v", ">=", 4.0)])
    got = {(r["id"], r["v"]) for r in V.read_version(spark, t).collect()}
    # odd ids have NULL v: predicate NULL -> row survives (SQL DELETE)
    assert got == {(0, 0.0), (2, 2.0)} | {(i, None) for i in (1, 3, 5, 7, 9)}


def test_delete_where_noop_when_nothing_matches(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _seed(spark, t, n=10, files=1)
    rep: dict = {}
    m = V.delete_where(spark, t, [("id", ">", 999)], report=rep)
    assert m["version"] == 1 and rep["files_rewritten"] == 0


def test_update_where(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _seed(spark, t)
    rep: dict = {}
    V.update_where(
        spark,
        t,
        [("id", ">=", 10), ("id", "<", 20)],
        {"v": F.col("v") + 0.5},
        report=rep,
    )
    assert rep["files_rewritten"] < rep["files_total"]
    got = {r["id"]: r["v"] for r in V.read_version(spark, t).collect()}
    assert got[9] == 90.0 and got[10] == 100.5 and got[19] == 190.5
    assert got[20] == 200.0 and len(got) == 100


def test_timestamp_as_of(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _seed(spark, t, n=10, files=1)
    ts1 = V.history(t)[-1]["ts"]
    _seed_more = spark.range(10, 20).withColumn("v", F.col("id") * 10.0)
    V.commit(_seed_more, t, mode="append")
    ts2 = V.history(t)[-1]["ts"]
    assert ts2 >= ts1
    assert V.read_version(spark, t, as_of_timestamp=ts1).count() == 10
    assert V.read_version(spark, t, as_of_timestamp=ts2 + 1).count() == 20
    with pytest.raises(ValueError, match="no version committed"):
        V.read_version(spark, t, as_of_timestamp=ts1 - 10)
    with pytest.raises(ValueError, match="not both"):
        V.read_version(spark, t, version=1, as_of_timestamp=ts1)
