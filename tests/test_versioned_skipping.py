"""Manifest data skipping on the versioned table: per-file min/max
envelopes from parquet footers, file pruning under conjunctive
predicates, exactness of the residual filter, and the Z-order
composition (clustered commits → tight envelopes → real pruning)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.sources import versioned as V


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumn("v", F.col("id") * 10)


def test_commit_records_footer_stats(spark, tmp_path):
    t = str(tmp_path / "tbl")
    m = V.commit(_df(spark, 0, 100).repartitionByRange(4, "id"), t)
    assert set(m["stats"]) == set(m["files"])
    ids = [s["cols"]["id"] for s in m["stats"].values()]
    # range-partitioned on id → disjoint envelopes covering 0..99
    assert min(s["min"] for s in ids) == 0
    assert max(s["max"] for s in ids) == 99
    assert all(s["nulls"] == 0 for s in ids)
    spans = sorted((s["min"], s["max"]) for s in ids)
    assert all(a[1] < b[0] for a, b in zip(spans, spans[1:]))


def test_pruned_read_is_exact_and_skips_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 1000).repartitionByRange(8, "id"), t)
    rep: dict = {}
    got = V.read_version(
        spark, t, predicates=[("id", ">=", 900)], prune_report=rep
    )
    assert {r["id"] for r in got.collect()} == set(range(900, 1000))
    assert rep["files_total"] == 8
    assert rep["files_kept"] <= 2  # envelope prune really happened
    # empty-result predicate prunes everything without touching Spark IO
    rep2: dict = {}
    empty = V.read_version(
        spark, t, predicates=[("id", ">", 10_000)], prune_report=rep2
    )
    assert empty.count() == 0 and rep2["files_kept"] == 0
    assert empty.schema == V.read_version(spark, t).schema


def test_prune_ops_and_conjunction(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 100).repartitionByRange(4, "id"), t)
    m = V._read_manifest(t, 1)
    for preds, want_nonempty in [
        ([("id", "=", 5)], True),
        ([("id", "<", 1)], True),
        ([("id", "<=", 0)], True),
        ([("id", "in", [3, 7])], True),
        ([("id", ">=", 50), ("id", "<", 75)], True),
    ]:
        kept, rep = V.prune_files(m, preds)
        assert kept and rep["files_kept"] < rep["files_total"]
        got = V.read_version(spark, t, predicates=preds)
        exp = V._apply_predicates(V.read_version(spark, t), preds)
        assert sorted(r["id"] for r in got.collect()) == sorted(
            r["id"] for r in exp.collect()
        )


def test_all_null_file_pruned_missing_stats_kept(spark, tmp_path):
    t = str(tmp_path / "tbl")
    nulls = spark.range(0, 10).withColumn(
        "v", F.when(F.col("id") < 0, F.col("id")).cast("long")
    )
    vals = spark.range(0, 10).withColumn(
        "v", F.when(F.col("id") >= 0, F.col("id") * 10).cast("long")
    )
    V.commit(nulls.coalesce(1), t)
    V.commit(vals.coalesce(1), t, mode="append")
    rep: dict = {}
    got = V.read_version(spark, t, predicates=[("v", ">=", 0)], prune_report=rep)
    assert got.count() == 10  # only the non-null file's rows
    assert rep == {"files_total": 2, "files_kept": 1}
    # a column with no stats entry never prunes
    m = V._read_manifest(t, 2)
    for s in m["stats"].values():
        s["cols"].pop("v", None)
    kept, _ = V.prune_files(m, [("v", ">=", 0)])
    assert kept == m["files"]


def test_timestamp_predicates_prune(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.range(0, 96).select(
        F.col("id"),
        (F.to_timestamp(F.lit("2024-03-01 00:00:00")) + F.make_interval(hours=F.col("id"))).alias("ts"),
    )
    V.commit(df.repartitionByRange(4, "ts"), t)
    cut = dt.datetime(2024, 3, 4, 0, 0, tzinfo=dt.timezone.utc)
    rep: dict = {}
    got = V.read_version(spark, t, predicates=[("ts", ">=", cut)], prune_report=rep)
    assert got.count() == 24  # the last day
    assert rep["files_kept"] < rep["files_total"]


def test_zorder_compaction_tightens_envelopes(spark, tmp_path):
    t = str(tmp_path / "tbl")
    # write unclustered: every file spans the whole id range
    V.commit(_df(spark, 0, 4096).repartition(8), t)
    m1 = V._read_manifest(t, 1)
    _, rep_before = V.prune_files(m1, [("id", "<", 64)])
    V.compact(spark, t, n_files=8, zorder_cols=["id", "v"])
    m2 = V._read_manifest(t, 2)
    _, rep_after = V.prune_files(m2, [("id", "<", 64)])
    assert rep_before["files_kept"] == 8  # unclustered: nothing prunes
    assert rep_after["files_kept"] <= 2  # clustered: almost everything does
    got = V.read_version(spark, t, predicates=[("id", "<", 64)])
    assert {r["id"] for r in got.collect()} == set(range(64))


def test_bloom_filter_table_config(spark, tmp_path):
    """parquet-native bloom filters: opt in once at commit, every later
    commit keeps writing them (manifest-carried table config), and the
    bloom-bearing files measurably grow vs a no-bloom control."""
    import os

    def _data_bytes(table):
        d = os.path.join(table, "data")
        return sum(os.path.getsize(os.path.join(d, f)) for f in os.listdir(d))

    df = spark.range(0, 50_000).select(
        F.concat(F.lit("t-"), F.col("id").cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloomed")
    V.commit(df.coalesce(1), plain)
    m = V.commit(df.coalesce(1), bloomed, bloom_cols=["k"])
    assert m["bloom_cols"] == ["k"]
    assert _data_bytes(bloomed) > _data_bytes(plain) * 1.05
    # appends inherit the config without re-asking
    m2 = V.commit(df.coalesce(1), bloomed, mode="append")
    assert m2["bloom_cols"] == ["k"]
    # reads (incl. the point predicate the bloom serves) stay exact
    got = V.read_version(spark, bloomed, predicates=[("k", "=", "t-123")])
    assert [r["v"] for r in got.collect()] == [123, 123]
    # merge commits keep writing blooms on rewritten files
    src = spark.createDataFrame([("t-123", -1)], "k string, v long")
    m3 = V.merge(spark, bloomed, src, keys=["k"])
    assert m3["bloom_cols"] == ["k"]


def test_stats_survive_append_and_evolution(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10).coalesce(1), t)
    widened = (
        _df(spark, 10, 20)
        .withColumn("extra", F.when(F.col("id") >= 0, F.col("id") * 1.0))
        .coalesce(1)
    )
    m = V.commit(widened, t, mode="append", allow_evolution=True)
    assert set(m["stats"]) == set(m["files"])  # old file's stats carried
    # predicate on the evolved column: the pre-evolution file has no
    # 'extra' stats → kept; residual filter still gives the exact answer
    got = V.read_version(spark, t, predicates=[("extra", ">=", 15.0)])
    assert sorted(r["id"] for r in got.collect()) == list(range(15, 20))
