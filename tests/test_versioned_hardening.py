"""Round-5 hardening of the versioned (Delta-lite) table — each test
pins one of the advisor's findings:

1. non-finite float footer stats (±inf) must NOT collapse to the
   all-NULL "empty envelope" and silently prune real rows;
2. metadata-only commits must not inherit a prior merge's ``replaced``
   file list;
3. restore() re-validates the restored snapshot against the head's
   CHECK constraints;
4. vacuum never deletes files staged by an in-flight (unpublished)
   commit, and honors a retention window;
5. duplicate-registration tolerance must not swallow real errors whose
   message merely contains "exist".
"""

from __future__ import annotations

import os
import types

import pytest
from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.sources import versioned as V


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumn("v", F.col("id") * 10)


# -- 1. ±inf footer stats ------------------------------------------------


def test_infinite_stats_do_not_prune_real_rows(tmp_path):
    """A file with row groups [1,5] and [-inf,100,inf]: the ±inf group
    has NO usable envelope, so the whole column must opt out of pruning
    — merging (None,None) with [1,5] used to leave envelope [1,5] and
    prune the file for x=100."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = str(tmp_path / "tbl")
    data_dir = os.path.join(t, V._DATA)
    os.makedirs(data_dir)
    fname = "v1-deadbeef-part.parquet"
    tbl = pa.table({"x": pa.array([1.0, 5.0, float("-inf"), 100.0, float("inf")])})
    pq.write_table(tbl, os.path.join(data_dir, fname), row_group_size=2)

    stats = V._collect_stats(t, [fname])[fname]
    # the column must carry no envelope at all (no usable stats)
    assert "x" not in stats["cols"]
    assert V._file_may_match(stats, [("x", "=", 100.0)]) is True


def test_finite_stats_still_prune(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = str(tmp_path / "tbl")
    data_dir = os.path.join(t, V._DATA)
    os.makedirs(data_dir)
    fname = "v1-cafebabe-part.parquet"
    pq.write_table(
        pa.table({"x": pa.array([1.0, 5.0, 2.0, 4.0])}),
        os.path.join(data_dir, fname),
        row_group_size=2,
    )
    stats = V._collect_stats(t, [fname])[fname]
    assert stats["cols"]["x"] == {"min": 1.0, "max": 5.0, "nulls": 0}
    assert V._file_may_match(stats, [("x", "=", 100.0)]) is False


def test_infinite_stats_end_to_end_read(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(float("-inf"),), (100.0,), (float("inf"),)], "x double"
    ).coalesce(1)
    V.commit(df, t)
    got = V.read_version(spark, t, predicates=[("x", "=", 100.0)])
    assert got.count() == 1


# -- 2. metadata commits are built from explicit fields ------------------


def test_metadata_commit_does_not_inherit_replaced(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 20), t)
    src = _df(spark, 5, 10).withColumn("v", F.col("v") + 1)
    V.merge(spark, t, src, keys=["id"])  # v2: mode=merge, has "replaced"
    m = V.add_constraint(spark, t, "v_ok", "v >= 0")  # v3: metadata
    assert m["mode"] == "metadata"
    assert "replaced" not in m
    m4 = V.drop_constraint(t, "v_ok")
    assert "replaced" not in m4 and m4.get("constraints", {}) == {}


# -- 3. restore re-validates constraints ---------------------------------


def test_restore_revalidates_constraints(spark, tmp_path):
    t = str(tmp_path / "tbl")
    bad = spark.createDataFrame([(1, -5), (2, 3)], "id long, v long")
    V.commit(bad, t)  # v1 violates the future constraint
    V.delete_where(spark, t, [("v", "<", 0)])  # v2 is clean
    V.add_constraint(spark, t, "v_pos", "v >= 0")  # v3
    with pytest.raises(V.ConstraintViolationError):
        V.restore(t, 1, spark)
    # restoring to a clean version is fine
    m = V.restore(t, 2, spark)
    assert m["version"] == 4
    # and without a session, a constrained table refuses to guess
    with pytest.raises(ValueError, match="SparkSession"):
        V.restore(t, 2)


# -- 4. vacuum in-flight + retention guards ------------------------------


def test_vacuum_spares_inflight_staged_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10), t)  # head = v1
    data_dir = os.path.join(t, V._DATA)
    # simulate a writer that staged for v2 but has not published yet
    inflight = os.path.join(data_dir, "v2-aaaaaaaa-part-00000.parquet")
    with open(inflight, "wb") as f:
        f.write(b"PAR1")
    deleted = V.vacuum(t, keep_last=1)
    assert deleted == 0
    assert os.path.exists(inflight)


def test_vacuum_retention_window_spares_young_orphans(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10), t)
    V.commit(_df(spark, 0, 5), t)  # v1's files now unreferenced
    # young orphans survive a retention-windowed vacuum...
    assert V.vacuum(t, keep_last=1, retention_s=3600) == 0
    assert V.read_version(spark, t, version=2).count() == 5
    # ...and are reclaimed once the window is waived
    assert V.vacuum(t, keep_last=1, retention_s=0) > 0
    assert V.read_version(spark, t).count() == 5


# -- 5. duplicate-registration tolerance ---------------------------------


def _vt_with_fake_register(exc: Exception) -> V.VersionedTable:
    def _register(cls):
        raise exc

    fake = types.SimpleNamespace(
        dataSource=types.SimpleNamespace(register=_register)
    )
    return V.VersionedTable(fake, "/nonexistent")


def test_register_tolerates_only_duplicates():
    vt = _vt_with_fake_register(RuntimeError("data source x already exists"))
    vt._register(object)  # tolerated
    vt = _vt_with_fake_register(
        RuntimeError("[DATA_SOURCE_ALREADY_EXISTS] x exists")
    )
    vt._register(object)  # tolerated

    vt = _vt_with_fake_register(RuntimeError("Path /foo does not exist"))
    with pytest.raises(RuntimeError, match="does not exist"):
        vt._register(object)


# -- round-5 self-review regressions --------------------------------------


def test_vacuum_spares_lost_race_writer_same_version_prefix(spark, tmp_path):
    """A writer that LOSES the CAS race for version N keeps its
    vN-named staged files and publishes them under N+1 — vacuum must
    not reclaim fresh unreferenced files whose prefix EQUALS the head,
    only provably-superseded (old-prefix) or aged ones."""
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10), t)
    V.commit(_df(spark, 10, 20), t, mode="append")  # head = v2
    loser = os.path.join(t, V._DATA, "v2-0badf00d-part-00000.parquet")
    with open(loser, "wb") as f:
        f.write(b"PAR1")
    assert V.vacuum(t, keep_last=2) == 0
    assert os.path.exists(loser)
    # aged past the grace window the dead writer's files are reclaimed
    past = os.path.getmtime(loser) - V.INFLIGHT_GRACE_S - 60
    os.utime(loser, (past, past))
    assert V.vacuum(t, keep_last=2) == 1


def test_prune_kind_mismatch_is_conservative_not_typeerror(spark, tmp_path):
    """An int predicate against a string envelope (or vice versa) must
    skip pruning — the driver path used to raise TypeError where the
    distributed path already answered conservatively."""
    stats = {
        "rows": 4,
        "cols": {"symbol": {"min": "AAPL", "max": "MSFT", "nulls": 0}},
    }
    assert V._file_may_match(stats, [("symbol", "=", 5)]) is True
    assert V._file_may_match(stats, [("symbol", "in", [1, 2])]) is True
    # end to end: the residual filter still gives the exact (empty) answer
    t = str(tmp_path / "tbl")
    V.commit(
        spark.createDataFrame([("AAPL", 1), ("MSFT", 2)], "symbol string, v long"),
        t,
    )
    got = V.read_version(spark, t, predicates=[("symbol", "=", 5)])
    assert got.count() == 0


def test_commit_returns_lazy_stats_without_loading_checkpoint(spark, tmp_path, monkeypatch):
    """Appending to a checkpointed table must not materialize the full
    stats dict (checkpoint parquet -> driver) unless the caller asks
    for m['stats'] — the O(total files) load per commit was this
    round's own anti-goal."""
    t = str(tmp_path / "tbl")
    for i in range(V.CHECKPOINT_EVERY):
        V.commit(_df(spark, 10 * i, 10 * (i + 1)).coalesce(1), t,
                 mode="append" if i else "overwrite")
    assert V._list_checkpoints(t) == [V.CHECKPOINT_EVERY]
    calls = {"n": 0}
    orig = V._stats_from_arrow

    def counting(tbl):
        calls["n"] += 1
        return orig(tbl)

    monkeypatch.setattr(V, "_stats_from_arrow", counting)
    m = V.commit(_df(spark, 100, 110).coalesce(1), t, mode="append")
    assert calls["n"] == 0  # commit never touched the stats checkpoint
    assert m["n_files"] == V.CHECKPOINT_EVERY + 1
    # ...until the caller actually asks
    assert set(m["stats"]) == set(m["files"])
    assert calls["n"] == 1


def test_lazy_snapshot_dict_operations_do_not_drop_stats(spark, tmp_path):
    """`in` says 'stats' exists, so EVERY whole-dict view must agree:
    {**m}, dict(m), items(), copy(), setdefault() — a spread that
    silently dropped stats would disable pruning downstream."""
    t = str(tmp_path / "tbl")
    m = V.commit(_df(spark, 0, 10).coalesce(1), t)
    assert "stats" in m
    assert "stats" in {**m}
    assert "stats" in dict(m)
    assert "stats" in dict(m.items())
    assert "stats" in m.copy()
    m2 = V.commit(_df(spark, 10, 20).coalesce(1), t, mode="append")
    sd = m2.setdefault("stats", {})
    assert sd and set(sd) == set(m2["files"])  # never installs empty


def test_commit_retry_restages_file_names(spark, tmp_path, monkeypatch):
    """A CAS-race loser's staged files are RENAMED to the version they
    are finally published under, so vacuum's prefix guard keeps
    protecting them for their whole in-flight life."""
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10), t)
    orig = V._stage_files
    raced = {"done": False}

    def racy(df, table_dir, next_v, bloom_cols=None):
        staged = orig(df, table_dir, next_v, bloom_cols)
        if not raced["done"]:
            raced["done"] = True
            monkeypatch.setattr(V, "_stage_files", orig)
            V.commit(_df(spark, 100, 105).coalesce(1), t, mode="append")
        return staged

    monkeypatch.setattr(V, "_stage_files", racy)
    m = V.commit(_df(spark, 10, 20).coalesce(1), t, mode="append")
    assert m["version"] == 3
    seg = V._read_segment(t, 3)
    # every file the winning retry references carries ITS version prefix
    assert all(V._file_version_prefix(f) == 3 for f in seg["add"])
    assert V.read_version(spark, t).count() == 25
    # and vacuum finds nothing stale to fear
    assert V.vacuum(t, keep_last=3) == 0
    assert V.read_version(spark, t).count() == 25


def test_vacuum_dry_run_reports_without_touching(spark, tmp_path):
    """VACUUM DRY RUN (round 6): counts what a real vacuum would delete
    — same rules, zero mutation (files, segments, checkpoints all
    untouched; even the pre-drop checkpoint roll is skipped)."""
    import os

    from pyspark.sql import functions as F

    t = str(tmp_path / "tbl")
    df = spark.range(0, 50).withColumn("v", F.col("id") * 1.0)
    V.commit(df.coalesce(1), t)
    V.commit(df.coalesce(1), t, mode="overwrite")  # v1's file is garbage
    V.commit(df.coalesce(1), t, mode="overwrite")
    before_data = sorted(os.listdir(os.path.join(t, V._DATA)))
    before_vers = V._list_versions(t)
    before_ckpts = V._list_checkpoints(t)
    n_dry = V.vacuum(t, keep_last=1, dry_run=True)
    assert n_dry == 2  # v1 + v2 overwritten files
    assert sorted(os.listdir(os.path.join(t, V._DATA))) == before_data
    assert V._list_versions(t) == before_vers
    assert V._list_checkpoints(t) == before_ckpts
    # the real pass deletes exactly what the dry run promised
    assert V.vacuum(t, keep_last=1) == n_dry
    assert V.read_version(spark, t).count() == 50


# -- 6. metadata-only commits carry EVERY config key (r7 hardening) ------
# The r6 bug class: add_constraint/drop_constraint omitted `colmap` and
# every renamed column silently read NULL after an ADD CONSTRAINT. All
# metadata-only publishers now spread `_carry_config(head)`; this test
# is parameterized over every metadata op AND asserts over the full
# `_CONFIG_KEYS` list, so a future config key added to _carry_config is
# automatically covered (and a key added to _segment but NOT to
# _carry_config fails the setup's non-vacuous guard when it's exercised
# here).


def _all_config_table(spark, tmp_path):
    """A table with EVERY config key non-trivially populated:
    constraints (a CHECK + a generated column's reserved constraint),
    bloom_cols, colmap (mapping enabled + one rename), identity."""
    t = str(tmp_path / "cfg_tbl")
    df = (
        spark.range(0, 10)
        .withColumn("v", F.col("id") * 1.0)
        .withColumn("w", F.col("id") + 1)
    )
    V.commit(
        df.coalesce(1),
        t,
        bloom_cols=["v"],
        identity={"row_id": {"start": 100, "step": 1}},
        generated={"g": "v * 2"},
    )
    V.add_constraint(spark, t, "chk_v", "v >= 0")
    V.enable_column_mapping(t)
    V.rename_column(t, "w", "w_renamed")
    return t


_META_OPS = {
    # op name -> (callable(spark, t), config keys the op MEANS to change)
    "add_constraint": (
        lambda spark, t: V.add_constraint(spark, t, "extra", "v < 1e9"),
        {"constraints"},
    ),
    "drop_constraint": (
        lambda spark, t: V.drop_constraint(t, "chk_v"),
        {"constraints"},
    ),
    "rename_column": (
        lambda spark, t: V.rename_column(t, "w_renamed", "w2"),
        {"colmap"},
    ),
    "add_column": (
        lambda spark, t: V.add_column(t, "z", "double"),
        {"colmap"},
    ),
    "enable_column_mapping": (  # idempotent re-run: nothing changes
        lambda spark, t: V.enable_column_mapping(t),
        set(),
    ),
}


@pytest.mark.parametrize("op_name", sorted(_META_OPS))
def test_metadata_commit_preserves_every_config_key(
    spark, tmp_path, op_name
):
    t = _all_config_table(spark, tmp_path)
    head = V._list_versions(t)[-1]
    before = V._snapshot(t, head, with_stats=False)
    # non-vacuous: every carried config key is actually populated
    for k in V._CONFIG_KEYS:
        assert before.get(k), f"setup left config key {k!r} empty"
    assert any(n.startswith(V._GEN_PREFIX) for n in before["constraints"])

    op, changed = _META_OPS[op_name]
    op(spark, t)
    after = V._snapshot(t, V._list_versions(t)[-1], with_stats=False)
    for k in V._CONFIG_KEYS:
        if k in changed:
            continue
        assert after.get(k) == before.get(k), (
            f"metadata op {op_name!r} silently changed config {k!r}: "
            f"{before.get(k)!r} -> {after.get(k)!r}"
        )
    # and the mapped read still resolves every logical column
    cols = set(V.read_version(spark, t).columns)
    assert {"id", "v", "g", "row_id"} <= cols
