"""Incrementally-maintained IVF index (round 9): inverted-list
assignment as a versioned table fed by the base table's change feed —
create/refresh convergence vs full rebuild, exactly-once replay,
file-pruned probe reads, policy-writer composition."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.sources import versioned as V
from open_source_financial_time_series_data_pipeline_architecture_spark.sources.annindex import IVFIndex
from open_source_financial_time_series_data_pipeline_architecture_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return load_table(spark, SF, "embeddings")


def _centroids(spark, k=8):
    rows = (
        _emb(spark)
        .select(
            F.col("embedding").cast("array<double>").alias("v"),
            F.md5(F.col("vec_id").cast("string")).alias("h"),
        )
        .orderBy("h")
        .limit(k)
        .collect()
    )
    return [list(r["v"]) for r in rows]


def _norm(df):
    return sorted(
        (r["vec_id"], r["list_id"])
        for r in df.select("vec_id", "list_id").collect()
    )


def test_incremental_refresh_equals_full_rebuild(spark, tmp_path):
    base = str(tmp_path / "base")
    idx = str(tmp_path / "idx")
    cents = _centroids(spark)
    emb = _emb(spark)
    V.commit(emb.filter(F.col("vec_id") % 2 == 0).repartition(4), base)
    ix = IVFIndex(spark, base, idx, centroids=cents)
    ix.create()
    # append the other half, delete a slice, refresh incrementally
    V.commit(
        emb.filter(F.col("vec_id") % 2 == 1).repartition(4),
        base,
        mode="append",
    )
    V.delete_where(spark, base, [("label", "=", 2)])
    rep: dict = {}
    ix.refresh(report=rep)
    assert rep["refreshed"] and rep["n_inserted"] > 0 and rep["n_deleted"] > 0
    # full rebuild over the surviving base == the maintained index
    full = str(tmp_path / "full")
    ix_full = IVFIndex(spark, base, full, centroids=cents)
    ix_full.create()
    assert _norm(ix.read()) == _norm(ix_full.read())
    # replayed refresh at the same head: provable no-op
    head = V._list_versions(idx)[-1]
    rep2: dict = {}
    ix.refresh(report=rep2)
    assert rep2["refreshed"] is False
    assert V._list_versions(idx)[-1] == head


def test_metadata_only_base_commit_advances_cursor(spark, tmp_path):
    base = str(tmp_path / "base")
    idx = str(tmp_path / "idx")
    cents = _centroids(spark)
    V.commit(_emb(spark).repartition(4), base)
    ix = IVFIndex(spark, base, idx, centroids=cents)
    ix.create()
    V.compact(spark, base, n_files=2)  # logical no-op commit
    rep: dict = {}
    ix.refresh(report=rep)
    assert rep["refreshed"] and rep["n_inserted"] == 0 and rep["n_deleted"] == 0
    assert ix.last_indexed_version() == V._list_versions(base)[-1]


def test_search_prunes_to_probed_lists(spark, tmp_path):
    base = str(tmp_path / "base")
    idx = str(tmp_path / "idx")
    cents = _centroids(spark)
    V.commit(_emb(spark).repartition(4), base)
    ix = IVFIndex(spark, base, idx, centroids=cents, n_files=8)
    ix.create()
    queries = (
        _emb(spark)
        .filter(F.col("vec_id") % 251 == 0)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    pr: dict = {}
    got = ix.search(queries, k=5, n_probe=2, prune_report=pr)
    # correctness: identical to the batch ivf_topk over the same corpus
    from open_source_financial_time_series_data_pipeline_architecture_spark.operators import similarity as SIM

    want = SIM.ivf_topk(
        queries, _emb(spark), cents, k=5, n_probe=2
    )
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(
        (r["query_id"], r["rank"], r["vec_id"], r["cosine"])
        for r in got.collect()
    ) == sorted(
        (r["query_id"], r["rank"], r["vec_id"], r["cosine"])
        for r in want.collect()
    )
    # the probe read is file-pruned: with 8 range-clustered files and
    # a bounded probe set, provably-non-matching files are dropped
    assert pr["files_total"] == 8
    assert pr["files_kept"] < pr["files_total"]


def test_refresh_policy_writer_follows_ticks(spark, tmp_path):
    base = str(tmp_path / "base")
    idx = str(tmp_path / "idx")
    ck = str(tmp_path / "ck")
    cents = _centroids(spark)
    emb = _emb(spark)
    V.commit(emb.filter(F.col("vec_id") < 250).repartition(2), base)
    ix = IVFIndex(spark, base, idx, centroids=cents)
    ix.create()
    V.commit(
        emb.filter(F.col("vec_id") >= 250).repartition(2),
        base,
        mode="append",
    )
    q = ix.refresh_policy_writer(ck).trigger(availableNow=True).start()
    q.awaitTermination()
    assert ix.last_indexed_version() == V._list_versions(base)[-1]
    assert ix.read().count() == emb.count()
