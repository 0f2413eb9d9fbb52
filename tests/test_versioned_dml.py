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


def test_update_where_multi_column_sees_original_row(spark, tmp_path):
    """SQL UPDATE semantics: every SET expression evaluates against the
    ORIGINAL row — a SET that rewrites a predicate column must not stop
    the other SET columns from updating."""
    t = str(tmp_path / "tbl")
    df = spark.range(0, 20).select(
        F.col("id"),
        (F.col("id") * 1.0).alias("price"),
        (F.col("id") * 10.0).alias("volume"),
    )
    V.commit(df.coalesce(1), t)
    V.update_where(
        spark,
        t,
        [("price", ">", 10.0)],
        {"price": F.lit(0.0), "volume": F.lit(-1.0)},
    )
    got = {r["id"]: (r["price"], r["volume"]) for r in V.read_version(spark, t).collect()}
    assert got[11] == (0.0, -1.0)  # BOTH columns updated
    assert got[10] == (10.0, 100.0)  # boundary row untouched
    # swap-style update: both SETs read the pre-update values
    V.update_where(
        spark,
        t,
        [("id", "=", 5)],
        {"price": F.col("volume"), "volume": F.col("price")},
    )
    got = {r["id"]: (r["price"], r["volume"]) for r in V.read_version(spark, t).collect()}
    assert got[5] == (50.0, 5.0)


def test_merge_all_null_key_rows_insert(spark, tmp_path):
    """An all-NULL key column is not an empty source: its rows never
    match and still insert under when_not_matched='insert'."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double")
    V.commit(df, t)
    src = spark.createDataFrame(
        [(None, 99.0), (None, 98.0)], "id long, v double"
    )
    rep: dict = {}
    V.merge(spark, t, src, keys=["id"], report=rep)
    got = V.read_version(spark, t)
    assert got.count() == 4
    assert got.filter(F.col("id").isNull()).count() == 2


def test_restore_re_references_old_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _seed(spark, t, n=20, files=2)
    V.delete_where(spark, t, [("id", ">=", 10)])
    assert V.read_version(spark, t).count() == 10
    m = V.restore(t, 1)
    assert m["version"] == 3 and m["mode"] == "overwrite"
    assert m["files"] == V._read_manifest(t, 1)["files"]  # no data copied
    assert V.read_version(spark, t).count() == 20
    # the restore is an honest overwrite: CDF reports the resurrection
    ch = V.read_changes(spark, t, 2, 3)
    ins = {r["id"] for r in ch.filter("_change_type = 'insert'").collect()}
    assert ins == set(range(10, 20))
    # vacuum keeps files referenced by the kept (restored) head
    V.vacuum(t, keep_last=1)
    assert V.read_version(spark, t).count() == 20


def test_versioned_table_handle_end_to_end(spark, tmp_path):
    """The Engine-facing OO handle drives the whole lifecycle."""
    from open_source_financial_time_series_data_pipeline_architecture_spark.api import Engine

    t = Engine(spark, "/root/testdata/sf0.001").versioned_table(
        str(tmp_path / "tbl")
    )
    df = spark.range(0, 100).withColumn("v", F.col("id") * 10.0)
    t.overwrite(df.repartitionByRange(4, "id"))
    t.append(spark.range(100, 110).withColumn("v", F.col("id") * 10.0))
    t.add_constraint("v_nonneg", "v >= 0")
    t.merge(
        spark.createDataFrame([(5, 555.0)], "id long, v double"), keys=["id"]
    )
    t.update_where([("id", "=", 6)], {"v": F.lit(66.6)})
    t.delete_where([("id", ">=", 100)])
    t.compact(n_files=2, zorder_cols=["id", "v"])
    got = {r["id"]: r["v"] for r in t.read().collect()}
    assert len(got) == 100 and got[5] == 555.0 and got[6] == 66.6
    rep: dict = {}
    pruned = t.read(predicates=[("id", "<", 10)], prune_report=rep)
    assert pruned.count() == 10 and rep["files_total"] == 2
    # (strict files_kept < files_total layout assertions live in
    # test_versioned_skipping — here the v=555 outlier may straddle
    # both Z-range files, which is correct behavior)
    assert t.read(version=1).count() == 100  # time travel
    ch = t.changes(1, 2)
    assert ch.count() == 10  # the append's inserts
    assert [h["version"] for h in t.history()][-1] == 7
    t.restore(1)
    assert t.read().count() == 100 and t.read().collect()[0] is not None
    sink = t.stream_sink(app_id="job")
    sink(spark.range(200, 205).withColumn("v", F.col("id") * 10.0), 0)
    sink(spark.range(200, 205).withColumn("v", F.col("id") * 10.0), 0)  # replay
    assert t.read().count() == 105
    assert t.last_txn_version("job") == 0
    assert t.vacuum(keep_last=2) > 0


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
