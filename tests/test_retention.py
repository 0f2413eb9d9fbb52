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
