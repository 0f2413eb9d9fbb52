"""COLUMN MAPPING on the versioned table (round 6): rename/drop/add
columns as metadata-only commits — NO file rewrite at any table size
(Delta's name-mode column mapping; the reference's Delta tables,
spark/batch_feature_calculation.py:61-65, get the same ALTERs from
Delta ≥ 2.x). Files keep immutable PHYSICAL column names; the schema
maps logical names onto them, so renames time-travel, predicates
prune, and a re-added dropped column never resurrects old data."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from open_source_financial_time_series_data_pipeline_architecture_spark.sources import versioned as V


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumn("v", F.col("id") * 10)


def _data_files(t: str) -> set[str]:
    d = os.path.join(t, "data")
    return {f for f in os.listdir(d) if f.endswith(".parquet")}


def test_rename_is_metadata_only_and_time_travels(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 100), t)
    before = _data_files(t)
    snap = V.rename_column(t, "v", "value")
    assert snap["mode"] == "metadata"
    assert _data_files(t) == before  # zero files written
    df = V.read_version(spark, t)
    assert df.columns == ["id", "value"]
    assert {r["id"]: r["value"] for r in df.collect()} == {
        i: i * 10 for i in range(100)
    }
    # time travel to the pre-rename version shows the OLD logical name
    old = V.read_version(spark, t, version=1)
    assert old.columns == ["id", "v"]


def test_rename_then_append_unifies_old_and_new_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 50), t)
    V.rename_column(t, "v", "value")
    newer = spark.range(50, 80).withColumn("value", F.col("id") * 10)
    V.commit(newer, t, mode="append")
    got = {r["id"]: r["value"] for r in V.read_version(spark, t).collect()}
    assert got == {i: i * 10 for i in range(80)}
    # appending under the OLD logical name is a schema mismatch now
    with pytest.raises(V.SchemaMismatchError):
        V.commit(_df(spark, 80, 90), t, mode="append")


def test_predicates_prune_on_renamed_column(spark, tmp_path):
    t = str(tmp_path / "tbl")
    # two files with disjoint v-envelopes
    V.commit(_df(spark, 0, 10).coalesce(1), t)
    V.commit(_df(spark, 1000, 1010).coalesce(1), t, mode="append")
    V.rename_column(t, "v", "value")
    rep: dict = {}
    df = V.read_version(
        spark, t, predicates=[("value", ">=", 10000)], prune_report=rep
    )
    assert rep == {"files_total": 2, "files_kept": 1}
    assert {r["id"] for r in df.collect()} == set(range(1000, 1010))


def test_drop_then_readd_does_not_resurrect(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10), t)
    V.drop_column(t, "v")
    assert V.read_version(spark, t).columns == ["id"]
    V.add_column(t, "v", "bigint")
    # old rows read NULL — the minted physical name exists in no old file
    vals = {r["id"]: r["v"] for r in V.read_version(spark, t).collect()}
    assert vals == {i: None for i in range(10)}
    # new appends carry real values for the re-added column
    V.commit(_df(spark, 10, 15), t, mode="append")
    vals = {r["id"]: r["v"] for r in V.read_version(spark, t).collect()}
    assert vals[12] == 120 and vals[3] is None


def test_constraint_blocks_rename_and_drop(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 1, 10), t)
    V.add_constraint(spark, t, "v_pos", "v > 0")
    with pytest.raises(ValueError, match="v_pos"):
        V.rename_column(t, "v", "value")
    with pytest.raises(ValueError, match="v_pos"):
        V.drop_column(t, "v")
    V.drop_constraint(t, "v_pos")
    V.rename_column(t, "v", "value")  # now fine
    assert V.read_version(spark, t).columns == ["id", "value"]


def test_merge_and_dml_after_rename(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10).coalesce(1), t)
    V.rename_column(t, "v", "value")
    src = spark.range(5, 8).withColumn("value", F.lit(-1).cast("long"))
    rep: dict = {}
    V.merge(spark, t, src, keys=["id"], report=rep)
    V.update_where(
        spark, t, [("id", "=", 0)], {"value": F.lit(7).cast("long")}
    )
    V.delete_where(spark, t, [("id", "=", 9)])
    got = {r["id"]: r["value"] for r in V.read_version(spark, t).collect()}
    assert got[5] == got[6] == got[7] == -1
    assert got[0] == 7 and 9 not in got
    assert got[3] == 30


def test_cdf_across_rename_reads_end_schema(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 5), t)
    V.rename_column(t, "v", "value")
    V.commit(
        spark.range(5, 8).withColumn("value", F.col("id") * 10),
        t,
        mode="append",
    )
    ch = V.read_changes(spark, t, 0)
    assert set(ch.columns) == {"id", "value", "_change_type", "_commit_version"}
    ins = {r["id"]: r["value"] for r in ch.collect()}
    assert ins == {i: i * 10 for i in range(8)}


def test_compact_zorder_after_rename_row_identical(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 100).repartition(4), t)
    V.rename_column(t, "v", "value")
    V.compact(spark, t, n_files=2, zorder_cols=["value", "id"])
    got = {r["id"]: r["value"] for r in V.read_version(spark, t).collect()}
    assert got == {i: i * 10 for i in range(100)}
    # and the compacted files prune on the renamed column
    rep: dict = {}
    V.read_version(spark, t, predicates=[("value", "<", 0)], prune_report=rep)
    assert rep["files_kept"] == 0


def test_restore_across_rename_restores_old_names(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10), t)  # v1: (id, v)
    V.rename_column(t, "v", "value")  # v2
    V.restore(t, 1)  # v3 = v1's files + schema + mapping
    df = V.read_version(spark, t)
    assert df.columns == ["id", "v"]
    assert {r["id"]: r["v"] for r in df.collect()} == {
        i: i * 10 for i in range(10)
    }


def test_clone_carries_mapping(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    V.commit(_df(spark, 0, 10), src)
    V.rename_column(src, "v", "value")
    V.clone(src, dst)
    df = V.read_version(spark, dst)
    assert df.columns == ["id", "value"]
    assert df.count() == 10


def test_mapping_survives_checkpoint_replay(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 5).coalesce(1), t)
    V.rename_column(t, "v", "value")
    for k in range(12):  # cross a CHECKPOINT_EVERY boundary
        V.commit(
            spark.range(5 + k, 6 + k)
            .withColumn("value", F.col("id") * 10)
            .coalesce(1),
            t,
            mode="append",
        )
    assert V._list_checkpoints(t)  # a checkpoint actually rolled
    head = V._snapshot(t, V._list_versions(t)[-1], with_stats=False)
    assert head["colmap"] == {"id": "id", "value": "v"}
    got = {r["id"]: r["value"] for r in V.read_version(spark, t).collect()}
    assert got == {i: i * 10 for i in range(17)}


def test_enable_is_idempotent_and_new_columns_minted(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 5), t)
    s1 = V.enable_column_mapping(t)
    s2 = V.enable_column_mapping(t)
    assert s1["colmap"] == s2["colmap"] == {"id": "id", "v": "v"}
    V.add_column(t, "tag", T.StringType())
    head = V._snapshot(t, V._list_versions(t)[-1], with_stats=False)
    assert head["colmap"]["tag"].startswith("col_")  # minted, collision-proof


def test_add_column_without_mapping_reads_null(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 5), t)
    V.add_column(t, "w", "double")
    df = V.read_version(spark, t)
    assert df.columns == ["id", "v", "w"]
    assert all(r["w"] is None for r in df.collect())


def test_bloom_config_follows_rename(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10), t, bloom_cols=["v"])
    V.rename_column(t, "v", "value")
    head = V._snapshot(t, V._list_versions(t)[-1], with_stats=False)
    assert head["bloom_cols"] == ["value"]
    # an append writes blooms for the renamed column's PHYSICAL name
    V.commit(
        spark.range(10, 12).withColumn("value", F.col("id") * 10),
        t,
        mode="append",
    )
    assert V.read_version(spark, t).count() == 12


def test_concurrent_mapping_change_fails_append_safely(
    spark, tmp_path, monkeypatch
):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10), t)
    orig = V._publish
    state = {"armed": True}

    def patched(table_dir, seg, publisher=None):
        if state["armed"] and seg.get("mode") == "append":
            state["armed"] = False
            V.rename_column(t, "v", "value")  # the racing winner
        return orig(table_dir, seg, publisher)

    monkeypatch.setattr(V, "_publish", patched)
    with pytest.raises(V.ConcurrentCommitError, match="column mapping"):
        V.commit(_df(spark, 10, 20), t, mode="append")
    # table unharmed: the rename won, the append never half-landed
    df = V.read_version(spark, t)
    assert df.columns == ["id", "value"]
    assert df.count() == 10


def test_streaming_tail_reads_physical_names(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 3).coalesce(1), t)
    V.rename_column(t, "v", "value")
    V.commit(
        spark.range(3, 5).withColumn("value", F.col("id") * 10).coalesce(1),
        t,
        mode="append",
    )
    from open_source_financial_time_series_data_pipeline_architecture_spark.streaming.bridge import (
        run_available_now,
    )

    tbl = V.VersionedTable(spark, t)
    out = run_available_now(
        tbl.stream_tail(on_overwrite="snapshot"), output_mode="append"
    )
    got = {r["id"]: r["value"] for r in out.collect()}
    assert got == {i: i * 10 for i in range(5)}


def test_constraint_alters_preserve_column_mapping(spark, tmp_path):
    """Regression: add_constraint/drop_constraint publish metadata
    segments — omitting the colmap there silently WIPED the mapping and
    every renamed column read NULL afterwards (config is carried whole
    per segment; a metadata commit must re-state all of it)."""
    t = str(tmp_path / "tbl")
    V.commit(
        spark.range(0, 5).withColumn("v", F.col("id") * 10).coalesce(1), t
    )
    V.rename_column(t, "v", "value")
    V.add_constraint(spark, t, "v_ok", "value >= 0")
    got = {r["id"]: r["value"] for r in V.read_version(spark, t).collect()}
    assert got == {i: i * 10 for i in range(5)}
    V.drop_constraint(t, "v_ok")
    got = {r["id"]: r["value"] for r in V.read_version(spark, t).collect()}
    assert got == {i: i * 10 for i in range(5)}
