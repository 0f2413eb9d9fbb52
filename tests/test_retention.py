"""drop_chunks / retention policy (round 7): TimescaleDB's
``drop_chunks`` + ``add_retention_policy`` rebuilt on the versioned
table — manifest-only whole-file removal, CDF-honest, and invisible to
continuous aggregates (the materialized history outlives the raw data,
TimescaleDB's data-retention-with-caggs pattern)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.sources import versioned as V
from open_source_financial_time_series_data_pipeline_architecture_spark.sources.cagg import (
    ContinuousAggregate,
)

T0 = 1_700_000_000


def _rows(spark, lo, hi, step=60):
    return spark.range(lo, hi).select(
        F.timestamp_seconds(F.lit(T0) + F.col("id") * step).alias("ts"),
        (F.col("id") % 3).cast("string").alias("sym"),
        (F.col("id") * 1.5).alias("px"),
    )


def _ts(epoch):
    import datetime

    return datetime.datetime.utcfromtimestamp(epoch)


def test_drop_chunks_is_whole_file_and_manifest_only(spark, tmp_path):
    t = str(tmp_path / "tbl")
    # four time-clustered chunks of 25 rows (1500 s) each
    V.commit(_rows(spark, 0, 100).repartitionByRange(4, "ts"), t)
    before_files = sorted(os.listdir(os.path.join(t, V._DATA)))
    cutoff = T0 + 40 * 60  # mid-chunk: chunk 1 wholly old, chunk 2 straddles
    rep: dict = {}
    V.drop_chunks(spark, t, [("ts", "<", _ts(cutoff))], report=rep)
    assert rep["files_total"] == 4
    assert 1 <= rep["files_dropped"] < 4
    # manifest-only: NO data file touched, none staged (vacuum reclaims)
    assert sorted(os.listdir(os.path.join(t, V._DATA))) == before_files
    got = V.read_version(spark, t)
    n = got.count()
    # every surviving pre-cutoff row lives in a straddling chunk; all
    # post-cutoff rows survive (chunk-granular, never row-lossy beyond
    # whole chunks)
    assert got.filter(F.col("ts") >= _ts(cutoff)).count() == 60
    assert 60 <= n < 100
    assert n == 100 - rep["rows_dropped"]
    # idempotent: nothing else wholly expired → no-op, no commit
    head = V._list_versions(t)[-1]
    rep2: dict = {}
    V.drop_chunks(spark, t, [("ts", "<", _ts(cutoff))], report=rep2)
    assert rep2["files_dropped"] == 0
    assert V._list_versions(t)[-1] == head
    # vacuum now reclaims the dropped chunks' bytes
    assert V.vacuum(t, keep_last=1) >= rep["files_dropped"]
    assert V.read_version(spark, t).count() == n


def test_drop_chunks_cdf_honest_and_skippable(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_rows(spark, 0, 40).repartitionByRange(2, "ts"), t)
    V.drop_chunks(spark, t, [("ts", "<", _ts(T0 + 20 * 60))], )
    head = V._list_versions(t)[-1]
    ch = V.read_changes(spark, t, 1, head)
    dels = ch.filter(F.col("_change_type") == "delete")
    assert dels.count() == 20  # the dropped chunk's rows, honestly
    # a consumer that declared it skips retention sees nothing
    ch2 = V.read_changes(spark, t, 1, head, skip_versions={head})
    assert ch2.count() == 0


def test_cagg_history_outlives_retention(spark, tmp_path):
    """The reference pattern: 1m bars kept forever, raw ticks aged out.
    A drop_chunks on the base must neither un-materialize history nor
    stall the refresh high-water."""
    import pandas as pd

    base, agg = str(tmp_path / "base"), str(tmp_path / "agg")
    V.commit(_rows(spark, 0, 100).repartitionByRange(4, "ts"), base)
    ca = ContinuousAggregate(
        spark, base, agg,
        time_col="ts", bucket_seconds=600, group_cols=["sym"],
        aggs={"n": F.count(F.lit(1)), "sum_px": F.sum("px")},
    )
    ca.create()
    full_before = (
        ca.read().toPandas().sort_values(["bucket_start", "sym"])
        .reset_index(drop=True)
    )
    V.drop_chunks(spark, base, [("ts", "<", _ts(T0 + 50 * 60))])
    rep: dict = {}
    ca.refresh(report=rep)
    assert rep["refreshed"] and rep["buckets_dirty"] == 0
    pd.testing.assert_frame_equal(
        ca.read().toPandas().sort_values(["bucket_start", "sym"])
        .reset_index(drop=True),
        full_before,
    )
    # high-water advanced — the retention commit is consumed, not stuck
    assert ca.last_refreshed_version() == V._list_versions(base)[-1]
    # realtime keeps serving the full history too
    assert ca.read_realtime().count() == len(full_before)


def test_cagg_strict_mirroring_opt_out(spark, tmp_path):
    """ignore_retention=False: retention deletes flow through like any
    delete and un-materialize their buckets."""
    base, agg = str(tmp_path / "base"), str(tmp_path / "agg")
    V.commit(_rows(spark, 0, 100).repartitionByRange(4, "ts"), base)
    ca = ContinuousAggregate(
        spark, base, agg,
        time_col="ts", bucket_seconds=600, group_cols=["sym"],
        aggs={"n": F.count(F.lit(1))},
        ignore_retention=False,
    )
    ca.create()
    n0 = ca.read().count()
    rep: dict = {}
    V.drop_chunks(spark, base, [("ts", "<", _ts(T0 + 50 * 60))], report=rep)
    assert rep["files_dropped"] >= 1
    ca.refresh()
    assert ca.read().count() < n0
    assert (
        ca.read().count()
        == V.read_version(spark, base)
        .select(
            F.floor(F.col("ts").cast("double") / 600), "sym"
        )
        .distinct()
        .count()
    )


def test_retention_policy_writer_converges(spark, tmp_path):
    base = str(tmp_path / "base")
    V.commit(_rows(spark, 0, 100).repartitionByRange(4, "ts"), base)
    tbl = V.VersionedTable(spark, base)
    clock = {"now": T0 + 100 * 60 + 3600}
    ck = str(tmp_path / "ck")
    w = tbl.retention_policy_writer(
        ck,
        time_col="ts",
        older_than=3600 + 50 * 60,  # keep the trailing ~50 min of data
        now_fn=lambda: clock["now"],
    )
    q = w.trigger(availableNow=True).start()
    q.awaitTermination()
    kept = V.read_version(spark, base)
    assert kept.count() < 100
    assert kept.filter(F.col("ts") >= _ts(T0 + 50 * 60)).count() == 50
    head = V._list_versions(base)[-1]
    # the policy's own retention commit ticks once more and finds
    # nothing expired — converged, no commit churn
    q = tbl.retention_policy_writer(
        ck, time_col="ts", older_than=3600 + 50 * 60,
        now_fn=lambda: clock["now"],
    ).trigger(availableNow=True).start()
    q.awaitTermination()
    assert V._list_versions(base)[-1] == head


def test_vacuum_policy_writer(spark, tmp_path):
    """The scheduled-VACUUM leg: overwrites leave garbage, the policy
    job reclaims it, content intact, and (unlike compact/retention) the
    vacuum publishes no commit — no tick feedback."""
    import os

    base = str(tmp_path / "base")
    df = _rows(spark, 0, 40).coalesce(1)
    V.commit(df, base)
    V.commit(df, base, mode="overwrite")
    V.commit(df, base, mode="overwrite")
    data_dir = os.path.join(base, V._DATA)
    n_before = len(os.listdir(data_dir))
    head = V._list_versions(base)[-1]
    tbl = V.VersionedTable(spark, base)
    ck = str(tmp_path / "ck")
    q = (
        tbl.vacuum_policy_writer(ck, keep_last=1)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(os.listdir(data_dir)) < n_before
    assert V._list_versions(base)[-1] == head  # no commit published
    assert V.read_version(spark, base).count() == 40


def test_file_must_match_conservatism():
    """The drop-eligibility test must never claim 'provably all rows
    match' on missing/partial evidence — the dual of _file_may_match's
    never-wrongly-prune contract."""
    m = V._file_must_match
    # no stats / empty → not droppable; zero rows → vacuously droppable
    assert m(None, [("x", "<", 5)]) is False
    assert m({}, [("x", "<", 5)]) is False
    assert m({"rows": 0}, [("x", "<", 5)]) is True
    ok = {"rows": 10, "cols": {"x": {"min": 1, "max": 4, "nulls": 0}}}
    assert m(ok, [("x", "<", 5)]) is True
    assert m(ok, [("x", "<", 4)]) is False  # max == 4 not provably < 4
    assert m(ok, [("x", "<=", 4)]) is True
    assert m(ok, [("x", ">", 0)]) is True
    assert m(ok, [("x", ">=", 2)]) is False
    # any NULL in a predicated column blocks the drop
    nulls = {"rows": 10, "cols": {"x": {"min": 1, "max": 4, "nulls": 1}}}
    assert m(nulls, [("x", "<", 5)]) is False
    # column absent from stats → blocks
    assert m(ok, [("y", "<", 5)]) is False
    # 'in' and unknown ops can never be proven by an envelope
    assert m(ok, [("x", "in", [1, 2, 3, 4])]) is False
    # kind mismatch (string predicate vs numeric envelope) → blocks
    assert m(ok, [("x", "<", "zzz")]) is False
    # '=' needs a degenerate envelope
    point = {"rows": 3, "cols": {"x": {"min": 7, "max": 7, "nulls": 0}}}
    assert m(point, [("x", "=", 7)]) is True
    assert m(ok, [("x", "=", 3)]) is False
    # conjunction: every triple must be proven
    assert m(ok, [("x", "<", 5), ("x", ">", 2)]) is False


def test_drop_chunks_on_column_mapped_table(spark, tmp_path):
    """Retention predicates are LOGICAL names; stats are keyed by
    PHYSICAL names — drop_chunks must translate through the column
    mapping (the r6 bug class was exactly this kind of silent miss)."""
    t = str(tmp_path / "tbl")
    V.commit(_rows(spark, 0, 100).repartitionByRange(4, "ts"), t)
    V.enable_column_mapping(t)
    V.rename_column(t, "ts", "event_time")
    rep: dict = {}
    V.drop_chunks(
        spark, t, [("event_time", "<", _ts(T0 + 50 * 60))], report=rep
    )
    assert rep["files_dropped"] == 2  # both wholly-old chunks
    got = V.read_version(spark, t)
    assert got.count() == 50
    assert got.filter(F.col("event_time") < _ts(T0 + 50 * 60)).count() == 0


# -- round 8: the retention↔refresh foot-gun, guarded by default ----------
# TimescaleDB docs trap: a cagg policy window (or deferred pending
# range) reaching below the retention horizon recomputes those buckets
# from an EMPTY base and delete-merges the materialized history away.
# Here drop_chunks records its cutoff in the commit metadata and the
# cagg clips pending invalidations at the horizon (bucket-grid-ceiled),
# so the safe thing is the default; ignore_retention=False opts back
# into strict base-mirroring.


def test_pending_below_horizon_does_not_unmaterialize(spark, tmp_path):
    import pandas as pd

    base, agg = str(tmp_path / "base"), str(tmp_path / "agg")
    V.commit(_rows(spark, 0, 100).repartitionByRange(4, "ts"), base)
    ca = ContinuousAggregate(
        spark, base, agg,
        time_col="ts", bucket_seconds=600, group_cols=["sym"],
        aggs={"n": F.count(F.lit(1)), "sum_px": F.sum("px")},
    )
    ca.create()
    old_half = (
        ca.read()
        .filter(F.col("bucket_start") < _ts(T0 + 2800))
        .toPandas()
        .sort_values(["bucket_start", "sym"])
        .reset_index(drop=True)
    )
    assert len(old_half) > 0
    # dirty EVERY bucket, then refresh only the recent half → the old
    # half defers as a pending range
    V.update_where(spark, base, [("px", ">=", 0.0)],
                   {"px": F.col("px") + 1.0})
    ca.refresh(window_start=T0 + 2800)
    assert ca._pending_ranges(), "old half should be pending"
    # retention expires the old half's raw rows (original AND updated)
    rep: dict = {}
    V.drop_chunks(spark, base, [("ts", "<", _ts(T0 + 2800))], report=rep)
    assert rep["files_dropped"] >= 1
    # realtime must SERVE the materialized old buckets, not recompute
    # them (empty) over the dropped base
    rt_old = (
        ca.read_realtime()
        .filter(F.col("bucket_start") < _ts(T0 + 2800))
        .toPandas()
        .sort_values(["bucket_start", "sym"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(rt_old, old_half)
    # a covering (unwindowed) refresh drains pending WITHOUT deleting
    # the below-horizon history
    rep2: dict = {}
    ca.refresh(report=rep2)
    assert rep2.get("buckets_deleted", 0) == 0
    assert ca._pending_ranges() == []
    got_old = (
        ca.read()
        .filter(F.col("bucket_start") < _ts(T0 + 2800))
        .toPandas()
        .sort_values(["bucket_start", "sym"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_old, old_half)


def test_pending_below_horizon_escape_hatch_mirrors(spark, tmp_path):
    """ignore_retention=False keeps the old destructive-but-mirroring
    behavior: the drained pending range sees the dropped base and
    un-materializes its buckets."""
    base, agg = str(tmp_path / "base"), str(tmp_path / "agg")
    V.commit(_rows(spark, 0, 100).repartitionByRange(4, "ts"), base)
    ca = ContinuousAggregate(
        spark, base, agg,
        time_col="ts", bucket_seconds=600, group_cols=["sym"],
        aggs={"n": F.count(F.lit(1))},
        ignore_retention=False,
    )
    ca.create()
    V.update_where(spark, base, [("px", ">=", 0.0)],
                   {"px": F.col("px") + 1.0})
    ca.refresh(window_start=T0 + 2800)
    assert ca._pending_ranges()
    V.drop_chunks(spark, base, [("ts", "<", _ts(T0 + 2800))])
    ca.refresh()  # drain — strict mirroring deletes the dead buckets
    assert ca._pending_ranges() == []
    assert (
        ca.read().filter(F.col("bucket_start") < _ts(T0 + 1000)).count()
        == 0
    )


def test_retention_horizon_metadata_roundtrip():
    import datetime

    um = V.retention_horizon_metadata(
        [("ts", "<", datetime.datetime.utcfromtimestamp(T0)),
         ("other", ">=", 5), ("lvl", "<", 3.5)]
    )
    assert V.is_retention_metadata(um)
    assert V.is_retention_metadata(V.RETENTION_METADATA)  # legacy form
    assert not V.is_retention_metadata('{"op": "compress"}')
    assert not V.is_retention_metadata(None)
    assert V.retention_horizon_from_metadata(um, "ts") == float(T0)
    assert V.retention_horizon_from_metadata(um, "lvl") == 3.5
    assert V.retention_horizon_from_metadata(um, "other") is None  # >= op
    assert V.retention_horizon_from_metadata(
        V.RETENTION_METADATA, "ts"
    ) is None


def test_pending_scan_is_bounded_by_cache(spark, tmp_path, monkeypatch):
    """_pending_ranges / _base_retention_horizon walk only the commits
    that landed since the previous call — never the whole history
    (round-8 O(touched) fix for the commit-log re-walk)."""
    base, agg = str(tmp_path / "base"), str(tmp_path / "agg")
    V.commit(_rows(spark, 0, 40).coalesce(1), base)
    ca = ContinuousAggregate(
        spark, base, agg,
        time_col="ts", bucket_seconds=600, group_cols=["sym"],
        aggs={"n": F.count(F.lit(1))},
    )
    ca.create()
    for lo in range(40, 70, 10):  # a few more base commits
        V.commit(_rows(spark, lo, lo + 10).coalesce(1), base, mode="append")
    ca.refresh()
    ca._pending_ranges()
    ca._base_retention_horizon()
    calls: list = []
    real = V._read_segment
    monkeypatch.setattr(
        V, "_read_segment",
        lambda d, v: calls.append((d, v)) or real(d, v),
    )
    # heads unchanged → NO segment reads at all
    assert ca._pending_ranges() == []
    assert ca._base_retention_horizon() is None
    assert calls == []
    # one new commit → exactly the new segment is read (the commit
    # itself replays the log; only count the horizon scan's reads)
    V.commit(_rows(spark, 70, 80).coalesce(1), base, mode="append")
    new_head = V._list_versions(base)[-1]
    calls.clear()
    ca._base_retention_horizon()
    assert calls == [(base, new_head)]
    # every refresh commit restates the pending key, so a FRESH
    # instance's first walk stops at the last refresh commit
    head_um = V._read_segment(agg, V._list_versions(agg)[-1]).get(
        "user_metadata"
    )
    assert head_um and "cagg_pending" in head_um


def test_retention_horizon_inclusive_cutoff_covers_boundary(
    spark, tmp_path
):
    """A ``<=`` cutoff drops the boundary INSTANT itself, so the
    recorded horizon must sit strictly above it — otherwise a cutoff
    landing exactly on a bucket boundary leaves that bucket classified
    as intact while its first-instant rows are gone (round-9 advice
    fix)."""
    import datetime

    # exactly on the ABSOLUTE 600 s bucket grid (epoch multiples of
    # 600 — T0 itself is not on it), inside the droppable range
    boundary = float((T0 // 600 + 6) * 600)
    um_lt = V.retention_horizon_metadata(
        [("ts", "<", datetime.datetime.utcfromtimestamp(boundary))]
    )
    um_le = V.retention_horizon_metadata(
        [("ts", "<=", datetime.datetime.utcfromtimestamp(boundary))]
    )
    # exclusive cutoff: the boundary instant is intact
    assert V.retention_horizon_from_metadata(um_lt, "ts") == boundary
    # inclusive cutoff: bumped past the boundary by one parquet tick
    hz = V.retention_horizon_from_metadata(um_le, "ts")
    assert hz > boundary and hz - boundary < 1e-3
    # end-to-end: drop_chunks with <= exactly on the grid → the
    # straddling-bucket guard covers the bucket STARTING at the cutoff
    base, agg = str(tmp_path / "base"), str(tmp_path / "agg")
    V.commit(_rows(spark, 0, 100).repartitionByRange(4, "ts"), base)
    ca = ContinuousAggregate(
        spark, base, agg,
        time_col="ts", bucket_seconds=600, group_cols=["sym"],
        aggs={"n": F.count(F.lit(1))},
    )
    ca.create()
    V.drop_chunks(spark, base, [("ts", "<=", _ts(int(boundary)))])
    grid = ca._horizon_grid()
    assert grid == int(boundary) + 600  # next bucket, not the boundary


def test_stats_envelope_partial_stats_falls_back_to_scan(
    spark, tmp_path, monkeypatch
):
    """A snapshot where only SOME files carry stats for the column must
    not silently narrow the envelope to the stats-bearing files (files
    written before a schema-evolution add, legacy INT96 staging) —
    ANY non-empty file without stats triggers the min/max scan
    (round-9 advice fix)."""
    base, agg = str(tmp_path / "base"), str(tmp_path / "agg")
    V.commit(_rows(spark, 0, 50).repartitionByRange(2, "ts"), base)
    ca = ContinuousAggregate(
        spark, base, agg,
        time_col="ts", bucket_seconds=600, group_cols=["sym"],
        aggs={"n": F.count(F.lit(1))},
    )
    full = ca._stats_envelope(base, "ts")
    assert full is not None
    real_snapshot = V._snapshot

    def _strip_one(table_dir, version, **kw):
        m = real_snapshot(table_dir, version, **kw)
        if kw.get("with_stats") and m.get("stats"):
            m = dict(m)
            stats = dict(m["stats"])
            # strip the EARLIEST file's stats (the one holding the min)
            victim = min(
                stats,
                key=lambda f: (
                    (stats[f] or {}).get("cols", {})
                    .get("ts", {}).get("min") or float("inf")
                ),
            )
            stats[victim] = {
                "rows": (stats[victim] or {}).get("rows", 1) or 1
            }
            m["stats"] = stats
        return m

    monkeypatch.setattr(V, "_snapshot", _strip_one)
    got = ca._stats_envelope(base, "ts")
    # the scan restores the TRUE envelope — no silent narrowing
    assert got == full
