"""MERGE INTO on the versioned table: matched/not-matched branches,
file-level merge pruning (only envelope-overlapping files rewritten),
CDC over merge commits, and the determinism / schema guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.sources import versioned as V


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v double")


def _seed(spark, t, n=100, files=4):
    V.commit(
        _df(spark, [(i, float(i)) for i in range(n)]).repartitionByRange(
            files, "id"
        ),
        t,
    )


def _snapshot(spark, t):
    return {
        (r["id"], r["v"]) for r in V.read_version(spark, t).collect()
    }


def test_merge_update_and_insert(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _seed(spark, t)
    rep: dict = {}
    src = _df(spark, [(5, 500.0), (7, 700.0)])
    m = V.merge(spark, t, src, keys=["id"], report=rep)
    assert m["mode"] == "merge" and m["version"] == 2
    got = _snapshot(spark, t)
    assert (5, 500.0) in got and (7, 700.0) in got
    assert (5, 5.0) not in got
    assert len(got) == 100
    # keys 5..7 live in one of the 4 range-partitioned files; the rest
    # carried forward without a rewrite
    assert rep["files_rewritten"] < rep["files_total"] == 4
    assert set(m.get("replaced")) <= set(
        V._read_manifest(t, 1)["files"]
    )
    carried = set(m["files"]) & set(V._read_manifest(t, 1)["files"])
    assert carried  # untouched files shared between versions
    assert set(m["stats"]) == set(m["files"])  # stats carried + collected
    # an out-of-range key inserts (envelope overlaps nothing beyond max)
    rep2: dict = {}
    V.merge(spark, t, _df(spark, [(200, 2000.0)]), keys=["id"], report=rep2)
    got = _snapshot(spark, t)
    assert (200, 2000.0) in got and len(got) == 101
    assert rep2["files_rewritten"] == 0  # pure insert: no file touched


def test_merge_prunes_to_single_file(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _seed(spark, t, n=1000, files=8)
    rep: dict = {}
    V.merge(spark, t, _df(spark, [(3, -3.0)]), keys=["id"], report=rep)
    assert rep == {
        "files_total": 8,
        "files_rewritten": 1,
        "rows_written": 125,
        "rebases": 0,  # uncontended publish (round 6: rebase counter)
    }
    got = _snapshot(spark, t)
    assert (3, -3.0) in got and len(got) == 1000


def test_merge_delete_and_matched_ignore(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _seed(spark, t, n=20, files=2)
    V.merge(
        spark,
        t,
        _df(spark, [(0, 0.0), (19, 0.0)]),
        keys=["id"],
        when_matched="delete",
        when_not_matched="ignore",
    )
    ids = {r["id"] for r in V.read_version(spark, t).collect()}
    assert ids == set(range(1, 19))
    # matched-ignore + insert: existing rows untouched, new row lands
    V.merge(
        spark,
        t,
        _df(spark, [(1, 111.0), (50, 50.0)]),
        keys=["id"],
        when_matched="ignore",
    )
    got = _snapshot(spark, t)
    assert (1, 1.0) in got and (1, 111.0) not in got and (50, 50.0) in got


def test_merge_noop_paths(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _seed(spark, t, n=10, files=1)
    head = V._list_versions(t)[-1]
    rep: dict = {}
    m = V.merge(spark, t, _df(spark, []), keys=["id"], report=rep)
    assert m["version"] == head and rep["files_rewritten"] == 0
    m2 = V.merge(
        spark,
        t,
        _df(spark, [(99, 9.9)]),
        keys=["id"],
        when_matched="ignore",
        when_not_matched="ignore",
    )
    assert m2["version"] == head  # nothing to do → no commit


def test_merge_guards(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _seed(spark, t, n=10, files=1)
    with pytest.raises(ValueError, match="duplicate key"):
        V.merge(spark, t, _df(spark, [(1, 1.0), (1, 2.0)]), keys=["id"])
    with pytest.raises(V.SchemaMismatchError):
        V.merge(
            spark,
            t,
            spark.createDataFrame([(1, "x")], "id long, v string"),
            keys=["id"],
        )


def test_cdc_over_merge_diffs_touched_content_only(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _seed(spark, t, n=100, files=4)
    V.merge(spark, t, _df(spark, [(5, 500.0), (200, 2000.0)]), keys=["id"])
    ch = V.read_changes(spark, t, 1, 2)
    rows = {
        (r["_change_type"], r["id"], r["v"]) for r in ch.collect()
    }
    assert ("delete", 5, 5.0) in rows
    assert ("insert", 5, 500.0) in rows
    assert ("insert", 200, 2000.0) in rows
    # rows from untouched files never enter the diff
    assert not any(i == 99 for (_, i, _v) in rows)


def test_merge_prunes_on_zordered_trades(spark, tmp_path):
    """The driver query's exact build at sf0.001: after OPTIMIZE
    ZORDER on (symbol, price), a merge keyed on (symbol, trade_id)
    whose source is one symbol touches a strict subset of files."""
    from open_source_financial_time_series_data_pipeline_architecture_spark.schema import (
        trades_from_events,
    )
    from open_source_financial_time_series_data_pipeline_architecture_spark.sources import (
        load_table,
    )

    t = str(tmp_path / "tbl")
    tr = trades_from_events(load_table(spark, "/root/testdata/sf0.001", "events"))
    V.commit(tr.repartition(8), t)
    V.compact(spark, t, n_files=8, zorder_cols=["symbol", "price"])
    clicks = tr.filter(F.col("symbol") == "click").withColumn(
        "price", F.col("price") * 2
    )
    rep: dict = {}
    V.merge(spark, t, clicks, keys=["symbol", "trade_id"], report=rep)
    assert rep["files_rewritten"] < rep["files_total"] == 8
    got = V.read_version(spark, t)
    assert got.count() == tr.count()
    doubled = got.filter(F.col("symbol") == "click").agg(
        F.round(F.sum("price"), 6)
    ).first()[0]
    want = clicks.agg(F.round(F.sum("price"), 6)).first()[0]
    assert doubled == want


def test_merge_then_time_travel_and_vacuum(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _seed(spark, t, n=50, files=2)
    V.merge(spark, t, _df(spark, [(0, -1.0)]), keys=["id"])
    assert (0, 1.0) not in _snapshot(spark, t)
    old = {
        (r["id"], r["v"])
        for r in V.read_version(spark, t, version=1).collect()
    }
    assert (0, 0.0) in old and len(old) == 50  # pre-merge snapshot intact
    V.vacuum(t, keep_last=1)
    assert len(_snapshot(spark, t)) == 50  # head unaffected by vacuum
