"""Rebase-on-conflict for rewrite commits (round 6, VERDICT r5 #2):
a MERGE/DELETE/UPDATE that loses the publish CAS to a FILE-DISJOINT
winner republishes its already-staged output against the new head
(no recomputation); a genuine read/write overlap raises
``RebaseConflictError``. Reference analog: the dual Flink+Spark writer
topology (reference ARCHITECTURE.md:12-15), where a lost optimistic
commit must not surface as a spurious whole-job failure."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.sources import versioned as V


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumn("v", F.col("id") * 10)


def _two_file_table(spark, tmp_path) -> str:
    """v1: ids 0..9 (one file), v2: ids 100..109 appended (one file) —
    two files with DISJOINT id envelopes."""
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10).coalesce(1), t)
    V.commit(_df(spark, 100, 110).coalesce(1), t, mode="append")
    return t


def _inject_once(monkeypatch, action, mode="merge"):
    """Patch V._publish so the FIRST publish of a ``mode``-mode segment
    first lets ``action`` (the racing winner) commit — a deterministic
    lost CAS for the caller underway."""
    orig = V._publish
    state = {"armed": True}

    def patched(table_dir, seg, publisher=None):
        if state["armed"] and seg.get("mode") == mode:
            state["armed"] = False
            action()
        return orig(table_dir, seg, publisher)

    monkeypatch.setattr(V, "_publish", patched)


def test_disjoint_merges_both_land_via_rebase(spark, tmp_path, monkeypatch):
    t = _two_file_table(spark, tmp_path)
    winner_src = _df(spark, 100, 105).withColumn("v", F.lit(-1).cast("long"))
    loser_src = _df(spark, 0, 5).withColumn("v", F.lit(-2).cast("long"))
    _inject_once(
        monkeypatch, lambda: V.merge(spark, t, winner_src, keys=["id"])
    )
    rep: dict = {}
    snap = V.merge(spark, t, loser_src, keys=["id"], report=rep)
    assert rep["rebases"] == 1
    assert snap["version"] == 4  # v3 winner, v4 rebased loser
    got = {
        r["id"]: r["v"]
        for r in V.read_version(spark, t).collect()
    }
    assert len(got) == 20
    assert all(got[i] == -2 for i in range(5))  # loser's update landed
    assert all(got[i] == -1 for i in range(100, 105))  # winner's too
    assert all(got[i] == i * 10 for i in list(range(5, 10)) + list(range(105, 110)))
    # vacuum's in-flight invariant: every file referenced by the rebased
    # segment carries the prefix of the version it was PUBLISHED under
    seg = V._read_segment(t, 4)
    assert all(f.startswith("v4-") for f in seg["add"])
    # and the rebased log still replays / checkpoints cleanly
    assert V.read_version(spark, t, version=3).count() == 20


def test_overlapping_merges_loser_raises(spark, tmp_path, monkeypatch):
    t = _two_file_table(spark, tmp_path)
    winner_src = _df(spark, 5, 6).withColumn("v", F.lit(-1).cast("long"))
    loser_src = _df(spark, 5, 6).withColumn("v", F.lit(-2).cast("long"))
    _inject_once(
        monkeypatch, lambda: V.merge(spark, t, winner_src, keys=["id"])
    )
    with pytest.raises(V.RebaseConflictError, match="rewrote"):
        V.merge(spark, t, loser_src, keys=["id"])
    # the winner's commit is intact; the loser changed nothing
    got = {r["id"]: r["v"] for r in V.read_version(spark, t).collect()}
    assert got[5] == -1 and len(got) == 20


def test_concurrent_append_inside_read_envelope_conflicts(
    spark, tmp_path, monkeypatch
):
    """A winner APPENDING rows inside the merge's key envelope is a
    logical conflict — those rows should have joined the match — even
    though no file was rewritten."""
    t = _two_file_table(spark, tmp_path)
    loser_src = _df(spark, 0, 5).withColumn("v", F.lit(-2).cast("long"))
    _inject_once(
        monkeypatch,
        lambda: V.commit(_df(spark, 2, 4).coalesce(1), t, mode="append"),
    )
    with pytest.raises(V.RebaseConflictError, match="envelope overlaps"):
        V.merge(spark, t, loser_src, keys=["id"])


def test_concurrent_append_outside_envelope_rebases(
    spark, tmp_path, monkeypatch
):
    t = _two_file_table(spark, tmp_path)
    loser_src = _df(spark, 0, 5).withColumn("v", F.lit(-2).cast("long"))
    _inject_once(
        monkeypatch,
        lambda: V.commit(_df(spark, 500, 510).coalesce(1), t, mode="append"),
    )
    rep: dict = {}
    snap = V.merge(spark, t, loser_src, keys=["id"], report=rep)
    assert rep["rebases"] == 1 and snap["version"] == 4
    got = {r["id"]: r["v"] for r in V.read_version(spark, t).collect()}
    assert len(got) == 30  # 20 + 10 appended survive
    assert all(got[i] == -2 for i in range(5))
    assert all(got[i] == i * 10 for i in range(500, 510))


def test_concurrent_overwrite_conflicts(spark, tmp_path, monkeypatch):
    t = _two_file_table(spark, tmp_path)
    loser_src = _df(spark, 0, 5).withColumn("v", F.lit(-2).cast("long"))
    _inject_once(
        monkeypatch,
        lambda: V.commit(_df(spark, 0, 3).coalesce(1), t, mode="overwrite"),
    )
    with pytest.raises(V.RebaseConflictError, match="reset"):
        V.merge(spark, t, loser_src, keys=["id"])


def test_concurrent_constraint_add_conflicts(spark, tmp_path, monkeypatch):
    """A winner adding a CHECK constraint mid-race invalidates the
    loser's pre-validation — conflict, not a silent unvalidated
    publish."""
    t = _two_file_table(spark, tmp_path)
    loser_src = _df(spark, 0, 5).withColumn("v", F.lit(2).cast("long"))
    _inject_once(
        monkeypatch,
        lambda: V.add_constraint(spark, t, "v_nonneg", "v >= 0"),
    )
    with pytest.raises(V.RebaseConflictError, match="constraints"):
        V.merge(spark, t, loser_src, keys=["id"])


def test_delete_where_rebases_over_disjoint_append(
    spark, tmp_path, monkeypatch
):
    t = _two_file_table(spark, tmp_path)
    _inject_once(
        monkeypatch,
        lambda: V.commit(_df(spark, 500, 510).coalesce(1), t, mode="append"),
    )
    rep: dict = {}
    V.delete_where(spark, t, [("id", "<=", 4)], report=rep)
    assert rep["rebases"] == 1
    got = sorted(r["id"] for r in V.read_version(spark, t).collect())
    assert got == list(range(5, 10)) + list(range(100, 110)) + list(
        range(500, 510)
    )


def test_rebase_retries_zero_restores_fail_fast(spark, tmp_path, monkeypatch):
    """rebase_retries=0 is the pre-round-6 contract: a lost CAS raises
    immediately even when the race was disjoint."""
    t = _two_file_table(spark, tmp_path)
    winner_src = _df(spark, 100, 105).withColumn("v", F.lit(-1).cast("long"))
    loser_src = _df(spark, 0, 5).withColumn("v", F.lit(-2).cast("long"))
    _inject_once(
        monkeypatch, lambda: V.merge(spark, t, winner_src, keys=["id"])
    )
    with pytest.raises(V.ConcurrentCommitError):
        V.merge(spark, t, loser_src, keys=["id"], rebase_retries=0)


def test_rebased_merge_leaves_no_stale_staged_files(
    spark, tmp_path, monkeypatch
):
    """After a rebase, no file under data/ carries a version prefix that
    is neither referenced nor reclaimable — the restage renamed, not
    copied."""
    t = _two_file_table(spark, tmp_path)
    winner_src = _df(spark, 100, 105).withColumn("v", F.lit(-1).cast("long"))
    loser_src = _df(spark, 0, 5).withColumn("v", F.lit(-2).cast("long"))
    _inject_once(
        monkeypatch, lambda: V.merge(spark, t, winner_src, keys=["id"])
    )
    V.merge(spark, t, loser_src, keys=["id"])
    m = V._snapshot(t, 4, with_stats=False)
    live = set(m["files"])
    on_disk = {
        f
        for f in os.listdir(os.path.join(t, V._DATA))
        if f.endswith(".parquet")
    }
    # everything not live is a superseded OLD version's file (v1..v3
    # prefixes vacuum can reclaim) — never an orphaned v4 stage
    for f in on_disk - live:
        assert not f.startswith("v4-"), f


def test_optimize_rebases_over_concurrent_append(spark, tmp_path, monkeypatch):
    """Delta's OPTIMIZE contract (round 6): a compaction that loses the
    CAS to an APPEND republishes against the new head — the appended
    files carry forward uncompacted, no recomputation, no failure."""
    t = _two_file_table(spark, tmp_path)
    _inject_once(
        monkeypatch,
        lambda: V.commit(_df(spark, 500, 510).coalesce(1), t, mode="append"),
        mode="optimize",
    )
    snap = V.compact(spark, t, n_files=1)
    assert snap["version"] == 4 and snap["mode"] == "optimize"
    # compacted output (1 file) + the winner's appended file
    assert snap["n_files"] == 2
    got = sorted(r["id"] for r in V.read_version(spark, t).collect())
    assert got == list(range(0, 10)) + list(range(100, 110)) + list(
        range(500, 510)
    )
    # the optimize segment is INCREMENTAL: remove = the two files read,
    # add = the compacted file; no reset
    seg = V._read_segment(t, 4)
    assert not seg.get("reset")
    assert len(seg["remove"]) == 2 and len(seg["add"]) == 1
    # change feed across the optimize reports ONLY the append's rows
    ch = V.read_changes(spark, t, 2)
    assert ch.filter("_change_type = 'insert'").count() == 10
    assert ch.filter("_change_type = 'delete'").count() == 0
    # and time travel to the pre-race version still reconstructs
    assert V.read_version(spark, t, version=2).count() == 20


def test_optimize_conflicts_with_concurrent_merge(spark, tmp_path, monkeypatch):
    t = _two_file_table(spark, tmp_path)
    winner_src = _df(spark, 5, 6).withColumn("v", F.lit(-1).cast("long"))
    _inject_once(
        monkeypatch,
        lambda: V.merge(spark, t, winner_src, keys=["id"]),
        mode="optimize",
    )
    with pytest.raises(V.RebaseConflictError, match="rewrote"):
        V.compact(spark, t, n_files=1)
    # the winner's merge is intact
    got = {r["id"]: r["v"] for r in V.read_version(spark, t).collect()}
    assert got[5] == -1


def test_optimize_zorder_still_skips_on_reads(spark, tmp_path):
    """The incremental optimize segment keeps Z-order + data skipping
    working: stats of the compacted files land in the segment and the
    pruned read drops non-matching files."""
    t = str(tmp_path / "tbl")
    V.commit(
        _df(spark, 0, 1000).withColumn("w", F.col("id") % 7).repartition(4),
        t,
    )
    V.compact(spark, t, n_files=4, zorder_cols=["id", "w"])
    rep: dict = {}
    df = V.read_version(spark, t, predicates=[("id", "<", 10)], prune_report=rep)
    assert df.count() == 10
    assert rep["files_kept"] < rep["files_total"] == 4


def test_empty_append_race_rebases_not_conflicts(spark, tmp_path, monkeypatch):
    """A zero-row append winning the CAS must not block a rebase: its
    staged file's empty envelope PROVABLY matches nothing (the round-6
    lakehouse-tour finding — all-None stats used to read as 'may match
    anything')."""
    t = _two_file_table(spark, tmp_path)
    empty = _df(spark, 0, 10).filter("id < 0").coalesce(1)
    _inject_once(
        monkeypatch,
        lambda: V.commit(empty, t, mode="append"),
    )
    loser_src = _df(spark, 0, 5).withColumn("v", F.lit(-2).cast("long"))
    rep: dict = {}
    V.merge(spark, t, loser_src, keys=["id"], report=rep)
    assert rep["rebases"] == 1
    got = {r["id"]: r["v"] for r in V.read_version(spark, t).collect()}
    assert len(got) == 20 and got[0] == -2


def test_zero_row_files_prune_away(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 100).coalesce(1), t)
    V.commit(_df(spark, 0, 1).filter("id < 0").coalesce(1), t, mode="append")
    rep: dict = {}
    df = V.read_version(spark, t, predicates=[("id", "<", 5)], prune_report=rep)
    assert df.count() == 5
    assert rep["files_kept"] == 1  # the empty file is provably out


def test_eight_threaded_disjoint_merges_all_land(spark, tmp_path):
    """REAL contention (not injected): 8 threads merge disjoint key
    ranges concurrently. Every writer must land — losers by rebasing —
    and the final table must carry all 8 updates. This is the dual-
    writer reference topology scaled up; before round 6 all but one
    thread died with ConcurrentCommitError."""
    import threading

    t = str(tmp_path / "tbl")
    # 8 files with disjoint id envelopes, one per writer's target range
    V.commit(_df(spark, 0, 800).repartitionByRange(8, "id").sortWithinPartitions("id"), t)
    errs: list = []
    barrier = threading.Barrier(8)

    def writer(k: int):
        src = (
            spark.range(k * 100, k * 100 + 10)
            .withColumnRenamed("id", "id")
            .select("id", F.lit(-(k + 1)).cast("long").alias("v"))
        )
        barrier.wait()
        try:
            V.merge(spark, t, src, keys=["id"], rebase_retries=16)
        except Exception as exc:  # noqa: BLE001 - collected for assert
            errs.append((k, exc))

    threads = [threading.Thread(target=writer, args=(k,)) for k in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs
    got = {r["id"]: r["v"] for r in V.read_version(spark, t).collect()}
    assert len(got) == 800
    for k in range(8):
        assert all(got[i] == -(k + 1) for i in range(k * 100, k * 100 + 10)), k
    # 9 commits: base + 8 merges, every version reconstructible
    vs = [h["version"] for h in V.history(t)]
    assert vs == list(range(1, 10))
    for v in vs:
        V._snapshot(t, v, with_stats=False)


def test_optimize_where_compacts_only_matching_files(spark, tmp_path):
    """OPTIMIZE WHERE (round 6): the predicate selects FILES by stat
    envelope — compacting one key range leaves the rest of the table's
    files untouched (same names carried forward), and the result is
    row-identical."""
    t = str(tmp_path / "tbl")
    V.commit(
        _df(spark, 0, 800).repartitionByRange(8, "id").sortWithinPartitions("id"),
        t,
    )
    before = V._snapshot(t, 1, with_stats=False)["files"]
    rep: dict = {}
    snap = V.compact(
        spark, t, n_files=1, predicates=[("id", "<", 200)], report=rep
    )
    assert rep["files_total"] == 8 and rep["files_rewritten"] == 2
    assert snap["n_files"] == 7  # 6 untouched + 1 compacted
    assert len(set(snap["files"]) & set(before)) == 6
    got = sorted(r["id"] for r in V.read_version(spark, t).collect())
    assert got == list(range(800))
    # a provably-no-match predicate is a no-op without a commit
    snap2 = V.compact(spark, t, predicates=[("id", ">", 10_000)])
    assert snap2["version"] == 2 and V.history(t)[-1]["version"] == 2


def test_history_operation_metrics(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 100).coalesce(1), t)
    V.commit(_df(spark, 100, 150).coalesce(1), t, mode="append")
    V.merge(
        spark,
        t,
        _df(spark, 0, 5).withColumn("v", F.lit(0).cast("long")),
        keys=["id"],
    )
    V.add_constraint(spark, t, "id_nonneg", "id >= 0")
    h = V.history(t)
    assert [x["mode"] for x in h] == ["overwrite", "append", "merge", "metadata"]
    assert h[0]["rows_added"] == 100 and h[0]["files_added"] == 1
    assert h[1]["rows_added"] == 50 and h[1]["files_removed"] == 0
    assert h[2]["rows_added"] == 100 and h[2]["files_removed"] == 1
    assert h[3] == {**h[3], "files_added": 0, "files_removed": 0, "rows_added": 0}


def test_rebase_adopts_winner_config_not_stale_base(
    spark, tmp_path, monkeypatch
):
    """Round-6 review repro: a rebased segment must publish the
    WINNER's table config — republishing the loser's base snapshot of
    it silently resurrected a concurrently dropped CHECK constraint
    (segments carry config whole, so the latest one wins replay)."""
    t = _two_file_table(spark, tmp_path)
    V.add_constraint(spark, t, "v_nonneg", "v >= 0")  # v3
    loser_src = _df(spark, 0, 5).withColumn("v", F.lit(20).cast("long"))
    _inject_once(
        monkeypatch, lambda: V.drop_constraint(t, "v_nonneg")  # wins v4
    )
    snap = V.merge(spark, t, loser_src, keys=["id"])  # rebases to v5
    assert snap["version"] == 5
    assert snap.get("constraints", {}) == {}  # NOT resurrected
    # and the table accepts the rows the user legitimately un-constrained
    V.commit(
        _df(spark, 900, 905).withColumn("v", F.lit(-1).cast("long")).coalesce(1),
        t,
        mode="append",
    )
