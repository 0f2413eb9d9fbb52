"""DELETION VECTORS (round 6): merge-on-read DELETE — the commit
writes a sidecar of deleted (file, position) pairs instead of
rewriting the matched files (Delta's ``deletionVectors`` feature +
``REORG TABLE ... APPLY (PURGE)``). At 100 TB a GDPR point-delete
costs a few KB of sidecar, not a multi-GB file rewrite per matched
row; reads stay exact via a (broadcast) anti-join on row identity."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.sources import versioned as V


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumn("v", F.col("id") * 10)


def _data_files(t: str) -> set[str]:
    d = os.path.join(t, "data")
    return {f for f in os.listdir(d) if f.endswith(".parquet")}


def _two_file_table(spark, tmp_path) -> str:
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10).coalesce(1), t)
    V.commit(_df(spark, 100, 110).coalesce(1), t, mode="append")
    return t


def test_dv_delete_no_rewrite_and_exact_reads(spark, tmp_path):
    t = _two_file_table(spark, tmp_path)
    before = _data_files(t)
    rep: dict = {}
    snap = V.delete_where(
        spark, t, [("id", "<", 5)], merge_on_read=True, report=rep
    )
    assert snap["mode"] == "dv"
    assert rep["rows_deleted"] == 5
    assert rep["files_covered"] == 1  # envelope pruning still applies
    # the ONLY new files are sidecars; every original data file survives
    assert before <= _data_files(t)
    assert set(snap["files"]) == set(
        V._snapshot(t, 2, with_stats=False)["files"]
    )
    got = {r["id"] for r in V.read_version(spark, t).collect()}
    assert got == set(range(5, 10)) | set(range(100, 110))
    # time travel to the pre-delete version still sees everything
    assert V.read_version(spark, t, version=2).count() == 20


def test_dv_stacking_and_idempotent_redelete(spark, tmp_path):
    t = _two_file_table(spark, tmp_path)
    V.delete_where(spark, t, [("id", "<", 3)], merge_on_read=True)
    rep: dict = {}
    V.delete_where(
        spark, t, [("id", "<", 5)], merge_on_read=True, report=rep
    )
    # the second delete records ONLY newly-dead rows (3, 4)
    assert rep["rows_deleted"] == 2
    got = {r["id"] for r in V.read_version(spark, t).collect()}
    assert got == set(range(5, 10)) | set(range(100, 110))
    # deleting already-dead rows is a provable no-op: no new commit
    head = V._list_versions(t)[-1]
    rep2: dict = {}
    V.delete_where(
        spark, t, [("id", "<", 5)], merge_on_read=True, report=rep2
    )
    assert rep2["rows_deleted"] == 0
    assert V._list_versions(t)[-1] == head


def test_dv_predicated_read_prunes_and_filters(spark, tmp_path):
    t = _two_file_table(spark, tmp_path)
    V.delete_where(spark, t, [("id", "=", 102)], merge_on_read=True)
    rep: dict = {}
    df = V.read_version(
        spark, t, predicates=[("id", ">=", 100)], prune_report=rep
    )
    assert rep == {"files_total": 2, "files_kept": 1}
    assert {r["id"] for r in df.collect()} == set(range(100, 110)) - {102}


def test_purge_rewrites_only_covered_files(spark, tmp_path):
    t = _two_file_table(spark, tmp_path)
    V.delete_where(spark, t, [("id", "<", 5)], merge_on_read=True)
    rep: dict = {}
    snap = V.purge_dv(spark, t, report=rep)
    assert rep["files_rewritten"] == 1  # only the covered file
    assert "dv" not in snap or not snap["dv"]
    got = {r["id"] for r in V.read_version(spark, t).collect()}
    assert got == set(range(5, 10)) | set(range(100, 110))
    # purge is logically a no-op: the change feed emits nothing for it
    head = V._list_versions(t)[-1]
    assert V.read_changes(spark, t, head - 1, head).count() == 0
    # purging a vector-free table is a no-op without a commit
    assert V.purge_dv(spark, t)["version"] == head


def test_compact_applies_and_drops_vectors(spark, tmp_path):
    t = _two_file_table(spark, tmp_path)
    V.delete_where(spark, t, [("id", "<", 5)], merge_on_read=True)
    snap = V.compact(spark, t, n_files=1)
    assert not snap.get("dv")
    got = {r["id"] for r in V.read_version(spark, t).collect()}
    assert got == set(range(5, 10)) | set(range(100, 110))


def test_merge_and_copy_on_write_dml_respect_vectors(spark, tmp_path):
    t = _two_file_table(spark, tmp_path)
    V.delete_where(spark, t, [("id", "<", 5)], merge_on_read=True)
    # a merge rewriting the covered file must NOT resurrect dv'd rows
    src = spark.range(7, 8).withColumn("v", F.lit(-1).cast("long"))
    V.merge(spark, t, src, keys=["id"])
    got = {r["id"]: r["v"] for r in V.read_version(spark, t).collect()}
    assert got[7] == -1 and 0 not in got and len(got) == 15
    # ...and the rewrite dropped the file's dv entries with it
    head = V._snapshot(t, V._list_versions(t)[-1], with_stats=False)
    assert not head.get("dv")
    # copy-on-write UPDATE over a vectored file: same contract
    t2 = _two_file_table(spark, tmp_path / "b")
    V.delete_where(spark, t2, [("id", "<", 5)], merge_on_read=True)
    V.update_where(
        spark, t2, [("id", "=", 6)], {"v": F.lit(0).cast("long")}
    )
    got2 = {r["id"]: r["v"] for r in V.read_version(spark, t2).collect()}
    assert got2[6] == 0 and 0 not in set(got2) - {6} and len(got2) == 15


def test_cdf_batch_emits_dv_deletes(spark, tmp_path):
    t = _two_file_table(spark, tmp_path)
    V.delete_where(spark, t, [("id", "<", 3)], merge_on_read=True)
    ch = V.read_changes(spark, t, 2).collect()
    assert {(r["id"], r["_change_type"], r["_commit_version"]) for r in ch} == {
        (0, "delete", 3),
        (1, "delete", 3),
        (2, "delete", 3),
    }
    # an overwrite AFTER a dv delete diffs against the dv-applied view:
    # already-deleted rows must not re-report as deletes
    V.commit(_df(spark, 5, 10).coalesce(1), t)  # keeps live rows 5..9
    ch2 = V.read_changes(spark, t, 3).collect()
    dels = {r["id"] for r in ch2 if r["_change_type"] == "delete"}
    # 0..2 were ALREADY dv-deleted (must not re-report); 5..9 identical
    assert dels == {3, 4} | set(range(100, 110))


def test_streaming_cdf_and_tail_with_vectors(spark, tmp_path):
    from open_source_financial_time_series_data_pipeline_architecture_spark.streaming.bridge import (
        run_available_now,
    )

    t = _two_file_table(spark, tmp_path)
    V.delete_where(spark, t, [("id", "<", 3)], merge_on_read=True)
    tbl = V.VersionedTable(spark, t)
    cdf = run_available_now(tbl.stream_cdf(), output_mode="append")
    rows = {
        (r["id"], r["_change_type"], r["_commit_version"])
        for r in cdf.collect()
    }
    assert (0, "delete", 3) in rows and (1, "delete", 3) in rows
    assert (105, "insert", 2) in rows
    # tail: dv commit is not append-only — snapshot mode re-emits the
    # dv-APPLIED table
    out = run_available_now(
        tbl.stream_tail(on_overwrite="snapshot"), output_mode="append"
    )
    ids = [r["id"] for r in out.collect()]
    # batch 1: appends (v1, v2) = 20 rows; dv commit re-emits 17
    assert ids.count(0) == 1 and ids.count(5) == 2


def test_dv_survives_checkpoint_restore_and_clone(spark, tmp_path):
    t = _two_file_table(spark, tmp_path)
    V.delete_where(spark, t, [("id", "<", 5)], merge_on_read=True)  # v3
    for k in range(10):  # roll a checkpoint past the dv commit
        V.commit(_df(spark, 200 + k, 201 + k).coalesce(1), t, mode="append")
    assert V._list_checkpoints(t)
    got = {r["id"] for r in V.read_version(spark, t).collect()}
    assert not got & set(range(5))
    # restore to the dv version re-references sidecar + data files
    V.restore(t, 3)
    assert {r["id"] for r in V.read_version(spark, t).collect()} == (
        set(range(5, 10)) | set(range(100, 110))
    )
    # clone carries the vectors (re-pointed references)
    dst = str(tmp_path / "fork")
    V.clone(t, dst)
    assert {r["id"] for r in V.read_version(spark, dst).collect()} == (
        set(range(5, 10)) | set(range(100, 110))
    )


def test_vacuum_keeps_live_sidecars(spark, tmp_path):
    t = _two_file_table(spark, tmp_path)
    V.delete_where(spark, t, [("id", "<", 5)], merge_on_read=True)
    V.commit(_df(spark, 200, 205).coalesce(1), t, mode="append")
    V.vacuum(t, keep_last=2)  # keeps v3 (dv) + v4
    got = {r["id"] for r in V.read_version(spark, t).collect()}
    assert got == set(range(5, 10)) | set(range(100, 110)) | set(range(200, 205))


def test_dv_delete_rebases_over_disjoint_append(spark, tmp_path, monkeypatch):
    t = _two_file_table(spark, tmp_path)
    orig = V._publish
    state = {"armed": True}

    def patched(table_dir, seg, publisher=None):
        if state["armed"] and seg.get("mode") == "dv":
            state["armed"] = False
            V.commit(_df(spark, 500, 505).coalesce(1), t, mode="append")
        return orig(table_dir, seg, publisher)

    monkeypatch.setattr(V, "_publish", patched)
    rep: dict = {}
    snap = V.delete_where(
        spark, t, [("id", "<", 5)], merge_on_read=True, report=rep
    )
    assert rep["rebases"] == 1 and snap["mode"] == "dv"
    got = {r["id"] for r in V.read_version(spark, t).collect()}
    assert got == set(range(5, 10)) | set(range(100, 110)) | set(range(500, 505))


def test_dv_loser_conflicts_with_rewrite_of_covered_file(
    spark, tmp_path, monkeypatch
):
    t = _two_file_table(spark, tmp_path)
    orig = V._publish
    state = {"armed": True}

    def patched(table_dir, seg, publisher=None):
        if state["armed"] and seg.get("mode") == "dv":
            state["armed"] = False
            # winner rewrites the very file the dv covers
            V.delete_where(spark, t, [("id", "=", 7)])
        return orig(table_dir, seg, publisher)

    monkeypatch.setattr(V, "_publish", patched)
    with pytest.raises(V.RebaseConflictError):
        V.delete_where(spark, t, [("id", "<", 5)], merge_on_read=True)


def test_rewrite_loser_conflicts_with_winner_dv(spark, tmp_path, monkeypatch):
    t = _two_file_table(spark, tmp_path)
    orig = V._publish
    state = {"armed": True}

    def patched(table_dir, seg, publisher=None):
        if state["armed"] and seg.get("mode") == "merge":
            state["armed"] = False
            # winner dv-deletes rows in the file the merge rewrites
            V.delete_where(spark, t, [("id", "=", 3)], merge_on_read=True)
        return orig(table_dir, seg, publisher)

    monkeypatch.setattr(V, "_publish", patched)
    src = spark.range(7, 8).withColumn("v", F.lit(-1).cast("long"))
    with pytest.raises(V.RebaseConflictError):
        V.merge(spark, t, src, keys=["id"])


def test_dv_with_column_mapping(spark, tmp_path):
    t = _two_file_table(spark, tmp_path)
    V.rename_column(t, "v", "value")
    V.delete_where(spark, t, [("value", "<", 50)], merge_on_read=True)
    got = {r["id"]: r["value"] for r in V.read_version(spark, t).collect()}
    assert set(got) == set(range(5, 10)) | set(range(100, 110))
    V.purge_dv(spark, t)
    assert {r["id"] for r in V.read_version(spark, t).collect()} == set(got)


def test_tail_rate_limit_bounds_batches(spark, tmp_path):
    """max_commits_per_batch (Delta's maxFilesPerTrigger analog at our
    commit-offset granularity): each read() call advances at most the
    cap, the batches tile the log with no gap or overlap, and their
    union is exactly the unlimited read. Tested at the reader contract
    level — the trigger loop above it (processingTime/availableNow)
    just calls read() repeatedly."""
    from open_source_financial_time_series_data_pipeline_architecture_spark.sources.versioned_stream import (
        VersionedCDFStreamReader,
        VersionedTailStreamReader,
    )

    t = str(tmp_path / "tbl")
    for k in range(6):
        V.commit(
            _df(spark, k * 10, k * 10 + 10).coalesce(1), t, mode="append"
        )

    def drain(reader):
        off, batches = reader.initialOffset(), []
        while True:
            rows, nxt = reader.read(off)
            if nxt == off:
                return batches
            batches.append((nxt["v"] - off["v"], rows))
            off = nxt

    tail = VersionedTailStreamReader(
        {"path": t, "max_commits_per_batch": "2"}, ["id", "v"]
    )
    batches = drain(tail)
    assert [s for s, _ in batches] == [2, 2, 2]  # bounded, tiling
    ids = [r[0] for _, rows in batches for r in rows]
    assert sorted(ids) == list(range(60))

    cdf = VersionedCDFStreamReader(
        {"path": t, "max_commits_per_batch": "4"}, ["id", "v"]
    )
    batches = drain(cdf)
    assert [s for s, _ in batches] == [4, 2]
    ids = [r[0] for _, rows in batches for r in rows]
    assert sorted(ids) == list(range(60))
    # unlimited reader agrees with the tiled union
    full = VersionedTailStreamReader({"path": t}, ["id", "v"])
    assert len(drain(full)) == 1


# ---------------------------------------------------------------------------
# merge-on-read UPDATE: one commit = deletion vector over the old rows
# + an append of their rewritten copies (Delta's DV-backed UPDATE)


def test_dv_update_no_rewrite_and_exact_reads(spark, tmp_path):
    t = _two_file_table(spark, tmp_path)
    before = _data_files(t)
    rep: dict = {}
    snap = V.update_where(
        spark,
        t,
        [("id", "<", 3)],
        {"v": F.col("v") + 1},
        merge_on_read=True,
        report=rep,
    )
    assert snap["mode"] == "dv"
    assert rep["rows_updated"] == 3
    assert rep["files_covered"] == 1  # envelope pruning still applies
    # every original data file survives untouched
    assert before <= _data_files(t)
    got = {r["id"]: r["v"] for r in V.read_version(spark, t).collect()}
    assert len(got) == 20
    assert {got[i] for i in range(3)} == {1, 11, 21}
    assert got[5] == 50 and got[105] == 1050
    # dtype preserved (cast back to the table type)
    assert dict(V.read_version(spark, t).dtypes)["v"] == "bigint"
    # time travel to the pre-update version sees the original values
    old = {r["id"]: r["v"] for r in V.read_version(spark, t, version=2).collect()}
    assert old[0] == 0 and old[2] == 20


def test_dv_update_set_sees_original_row(spark, tmp_path):
    # both SET expressions must evaluate against the ORIGINAL row —
    # chained application would let the second read the first's output
    t = str(tmp_path / "tbl")
    df = spark.range(0, 4).select(
        F.col("id"), F.col("id").alias("a"), (F.col("id") * 100).alias("b")
    )
    V.commit(df.coalesce(1), t)
    V.update_where(
        spark,
        t,
        [("id", ">=", 2)],
        {"a": F.col("b"), "b": F.col("a")},  # swap
        merge_on_read=True,
    )
    got = {r["id"]: (r["a"], r["b"]) for r in V.read_version(spark, t).collect()}
    assert got[2] == (200, 2) and got[3] == (300, 3)
    assert got[0] == (0, 0) and got[1] == (1, 100)


def test_dv_update_respects_prior_vectors(spark, tmp_path):
    t = _two_file_table(spark, tmp_path)
    V.delete_where(spark, t, [("id", "<", 2)], merge_on_read=True)
    rep: dict = {}
    V.update_where(
        spark,
        t,
        [("id", "<", 5)],
        {"v": F.lit(-1)},
        merge_on_read=True,
        report=rep,
    )
    # rows 0,1 are already dead: only 2,3,4 update — never resurrected
    assert rep["rows_updated"] == 3
    got = {r["id"]: r["v"] for r in V.read_version(spark, t).collect()}
    assert len(got) == 18 and 0 not in got and 1 not in got
    assert got[2] == got[4] == -1 and got[5] == 50


def test_dv_update_cdf_batch_and_stream(spark, tmp_path):
    from open_source_financial_time_series_data_pipeline_architecture_spark.streaming.bridge import (
        run_available_now,
    )

    t = _two_file_table(spark, tmp_path)
    V.update_where(
        spark, t, [("id", "=", 7)], {"v": F.lit(-7)}, merge_on_read=True
    )
    ch = V.read_changes(spark, t, 2).collect()
    assert {(r["id"], r["v"], r["_change_type"], r["_commit_version"]) for r in ch} == {
        (7, 70, "delete", 3),
        (7, -7, "insert", 3),
    }
    tbl = V.VersionedTable(spark, t)
    cdf = run_available_now(tbl.stream_cdf(start_version=2), output_mode="append")
    rows = {
        (r["id"], r["v"], r["_change_type"], r["_commit_version"])
        for r in cdf.collect()
    }
    assert rows == {(7, 70, "delete", 3), (7, -7, "insert", 3)}


def test_dv_update_purge_and_compact_fold_vectors(spark, tmp_path):
    t = _two_file_table(spark, tmp_path)
    V.update_where(
        spark, t, [("id", "<", 3)], {"v": F.lit(-1)}, merge_on_read=True
    )
    rep: dict = {}
    snap = V.purge_dv(spark, t, report=rep)
    assert not snap.get("dv")
    got = {r["id"]: r["v"] for r in V.read_version(spark, t).collect()}
    assert len(got) == 20 and got[0] == got[2] == -1 and got[5] == 50
    t2 = _two_file_table(spark, tmp_path / "b")
    V.update_where(
        spark, t2, [("id", "<", 3)], {"v": F.lit(-1)}, merge_on_read=True
    )
    snap2 = V.compact(spark, t2, n_files=1)
    assert not snap2.get("dv")
    got2 = {r["id"]: r["v"] for r in V.read_version(spark, t2).collect()}
    assert len(got2) == 20 and got2[1] == -1 and got2[105] == 1050


def test_dv_update_noop_paths(spark, tmp_path):
    t = _two_file_table(spark, tmp_path)
    head = V._list_versions(t)[-1]
    rep: dict = {}
    # provably nothing matches: pruned to zero files, no commit
    V.update_where(
        spark, t, [("id", ">", 10**6)], {"v": F.lit(0)},
        merge_on_read=True, report=rep,
    )
    assert rep["rows_updated"] == 0 and rep["files_covered"] == 0
    assert V._list_versions(t)[-1] == head
    # stats said maybe, rows said no: still no commit
    rep2: dict = {}
    V.update_where(
        spark, t, [("id", "=", 55)], {"v": F.lit(0)},
        merge_on_read=True, report=rep2,
    )
    assert rep2["rows_updated"] == 0
    assert V._list_versions(t)[-1] == head


def test_dv_update_rebases_over_disjoint_append(spark, tmp_path, monkeypatch):
    t = _two_file_table(spark, tmp_path)
    orig = V._publish
    state = {"armed": True}

    def patched(table_dir, seg, publisher=None):
        if state["armed"] and seg.get("mode") == "dv":
            state["armed"] = False
            V.commit(_df(spark, 500, 505).coalesce(1), t, mode="append")
        return orig(table_dir, seg, publisher)

    monkeypatch.setattr(V, "_publish", patched)
    rep: dict = {}
    snap = V.update_where(
        spark, t, [("id", "<", 3)], {"v": F.lit(-1)},
        merge_on_read=True, report=rep,
    )
    assert rep["rebases"] == 1 and snap["mode"] == "dv"
    got = {r["id"]: r["v"] for r in V.read_version(spark, t).collect()}
    assert set(got) == set(range(10)) | set(range(100, 110)) | set(range(500, 505))
    assert got[0] == -1 and got[500] == 5000


def test_dv_update_loser_conflicts_with_winner_dv(spark, tmp_path, monkeypatch):
    # an UPDATE loser may NOT stack on a winner's deletion vector over
    # its covered files: its rewritten copies were computed from rows
    # the winner may have deleted since (resurrection risk)
    t = _two_file_table(spark, tmp_path)
    orig = V._publish
    state = {"armed": True}

    def patched(table_dir, seg, publisher=None):
        if state["armed"] and seg.get("mode") == "dv" and seg.get("add"):
            state["armed"] = False
            V.delete_where(spark, t, [("id", "=", 7)], merge_on_read=True)
        return orig(table_dir, seg, publisher)

    monkeypatch.setattr(V, "_publish", patched)
    with pytest.raises(V.RebaseConflictError):
        V.update_where(
            spark, t, [("id", "<", 5)], {"v": F.lit(-1)}, merge_on_read=True
        )


def test_dv_update_constraints_enforced(spark, tmp_path):
    t = _two_file_table(spark, tmp_path)
    V.add_constraint(spark, t, "v_nonneg", "v >= 0")
    head = V._list_versions(t)[-1]
    with pytest.raises(V.ConstraintViolationError):
        V.update_where(
            spark, t, [("id", "<", 3)], {"v": F.lit(-1)}, merge_on_read=True
        )
    assert V._list_versions(t)[-1] == head
    assert V.read_version(spark, t).count() == 20


def test_dv_update_with_column_mapping(spark, tmp_path):
    t = _two_file_table(spark, tmp_path)
    V.rename_column(t, "v", "value")
    V.update_where(
        spark,
        t,
        [("value", "<", 30)],
        {"value": F.col("value") * -1},
        merge_on_read=True,
    )
    got = {r["id"]: r["value"] for r in V.read_version(spark, t).collect()}
    assert len(got) == 20 and got[1] == -10 and got[2] == -20 and got[5] == 50
    V.purge_dv(spark, t)
    assert {
        r["id"]: r["value"] for r in V.read_version(spark, t).collect()
    } == got


def test_dv_update_rebases_over_disjoint_winner_dv(spark, tmp_path, monkeypatch):
    """The permissive side of the UPDATE-loser rule: a winner's
    deletion vector over files the update did NOT touch is no
    conflict — the rebase republishes and both effects land."""
    t = _two_file_table(spark, tmp_path)  # file A: ids 0-9, file B: 100-109
    orig = V._publish
    state = {"armed": True}

    def patched(table_dir, seg, publisher=None):
        if state["armed"] and seg.get("mode") == "dv" and seg.get("add"):
            state["armed"] = False
            # winner dv-deletes in file B; the update covers file A only
            V.delete_where(spark, t, [("id", "=", 105)], merge_on_read=True)
        return orig(table_dir, seg, publisher)

    monkeypatch.setattr(V, "_publish", patched)
    rep: dict = {}
    V.update_where(
        spark, t, [("id", "<", 3)], {"v": F.lit(-1)},
        merge_on_read=True, report=rep,
    )
    assert rep["rebases"] == 1
    got = {r["id"]: r["v"] for r in V.read_version(spark, t).collect()}
    assert len(got) == 19 and 105 not in got
    assert got[0] == got[2] == -1 and got[5] == 50
