"""Continuous aggregates (TimescaleDB's centerpiece, reference
sql/timescaledb_schema.sql:44-65): invalidation-driven incremental
refresh of a materialized time-bucket aggregate over the versioned
table — the CDF is the invalidation log, only dirty buckets recompute,
and the result MERGEs into the (versioned) materialized store."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.sources import versioned as V
from open_source_financial_time_series_data_pipeline_architecture_spark.sources.cagg import (
    ContinuousAggregate,
)

T0 = 1_700_000_000  # epoch anchor


def _rows(spark, lo, hi, step=37, px_mult=1.5):
    return spark.range(lo, hi).select(
        F.timestamp_seconds(F.lit(T0) + F.col("id") * step).alias("ts"),
        (F.col("id") % 3).cast("string").alias("sym"),
        (F.col("id") * px_mult).alias("px"),
    )


def _cagg(spark, base, agg, bucket=60):
    return ContinuousAggregate(
        spark,
        base,
        agg,
        time_col="ts",
        bucket_seconds=bucket,
        group_cols=["sym"],
        aggs={
            "n": F.count(F.lit(1)),
            "sum_px": F.sum("px"),
            "max_px": F.max("px"),
        },
    )


def _full(spark, base, bucket=60):
    """The declarative truth: one full aggregation of the base head."""
    return (
        V.read_version(spark, base)
        .withColumn(
            "bucket_start",
            F.timestamp_seconds(
                F.floor(F.col("ts").cast("double") / bucket).cast("long")
                * bucket
            ),
        )
        .groupBy("bucket_start", "sym")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("px").alias("sum_px"),
            F.max("px").alias("max_px"),
        )
    )


def _sorted_pdf(df):
    return (
        df.toPandas()
        .sort_values(["bucket_start", "sym"])
        .reset_index(drop=True)
    )


def _assert_matches_full(spark, ca, base):
    import pandas as pd

    pd.testing.assert_frame_equal(
        _sorted_pdf(ca.read()), _sorted_pdf(_full(spark, base))
    )


def test_refresh_equals_full_recompute_across_dml(spark, tmp_path):
    """Appends, merge-on-read DELETE and UPDATE, and copy-on-write
    UPDATE all flow through the CDF into the invalidation set; after
    refresh the materialized rows equal a from-scratch aggregation."""
    base, agg = str(tmp_path / "base"), str(tmp_path / "agg")
    V.commit(_rows(spark, 0, 100).repartition(2), base)
    ca = _cagg(spark, base, agg)
    ca.create()
    _assert_matches_full(spark, ca, base)

    V.commit(_rows(spark, 100, 150).repartition(2), base, mode="append")
    V.delete_where(spark, base, [("sym", "=", "2")], merge_on_read=True)
    V.update_where(
        spark, base, [("sym", "=", "1")], {"px": F.col("px") * 2},
        merge_on_read=True,
    )
    rep: dict = {}
    ca.refresh(report=rep)
    assert rep["refreshed"] and rep["buckets_dirty"] > 0
    # deleting every 'sym'=2 row emptied that symbol's buckets — they
    # must leave the materialized table
    assert rep["buckets_deleted"] > 0
    _assert_matches_full(spark, ca, base)
    assert ca.read().filter(F.col("sym") == "2").count() == 0

    # copy-on-write UPDATE dirties too
    V.update_where(spark, base, [("sym", "=", "0")], {"px": F.lit(0.0)})
    ca.refresh()
    _assert_matches_full(spark, ca, base)


def test_refresh_reads_only_dirty_window(spark, tmp_path):
    """The 100 TB contract: a refresh after a small recent append
    prunes the base scan to the dirty time window via manifest min/max
    skipping — old files are never read."""
    base, agg = str(tmp_path / "base"), str(tmp_path / "agg")
    # time-clustered files (the hypertable layout): tight ts envelopes
    big = _rows(spark, 0, 4000).repartitionByRange(8, "ts")
    V.commit(big, base)
    ca = _cagg(spark, base, agg)
    ca.create()
    # append one small recent slice
    V.commit(_rows(spark, 4000, 4040).coalesce(1), base, mode="append")
    rep: dict = {}
    ca.refresh(report=rep)
    assert rep["base_files_read"] < rep["base_files_total"]
    assert rep["base_files_read"] <= 2  # the tail file + the append
    _assert_matches_full(spark, ca, base)


def test_refresh_noop_and_idempotent_replay(spark, tmp_path):
    base, agg = str(tmp_path / "base"), str(tmp_path / "agg")
    V.commit(_rows(spark, 0, 60).repartition(2), base)
    ca = _cagg(spark, base, agg)
    ca.create()
    V.commit(_rows(spark, 60, 90).coalesce(1), base, mode="append")
    ca.refresh()
    head = V._list_versions(agg)[-1]
    # nothing new: no-op, no commit
    rep: dict = {}
    ca.refresh(report=rep)
    assert rep["refreshed"] is False
    assert V._list_versions(agg)[-1] == head
    # crash replay: re-running the SAME range (stale high-water) must
    # converge to the same table — recompute-and-merge is pure
    import unittest.mock as mock

    with mock.patch.object(ca, "last_refreshed_version", return_value=1):
        ca.refresh()
    _assert_matches_full(spark, ca, base)


def test_metadata_only_commits_dirty_nothing(spark, tmp_path):
    base, agg = str(tmp_path / "base"), str(tmp_path / "agg")
    V.commit(_rows(spark, 0, 60).repartition(2), base)
    ca = _cagg(spark, base, agg)
    ca.create()
    V.add_constraint(spark, base, "px_known", "px IS NOT NULL")
    V.compact(spark, base, n_files=1)  # optimize: logical no-op
    rep: dict = {}
    ca.refresh(report=rep)
    assert rep["refreshed"] and rep["buckets_dirty"] == 0
    _assert_matches_full(spark, ca, base)
    # the high-water advanced: the next refresh skips those segments
    rep2: dict = {}
    ca.refresh(report=rep2)
    assert rep2["refreshed"] is False


def test_realtime_read_is_exact_without_refresh(spark, tmp_path):
    import pandas as pd

    base, agg = str(tmp_path / "base"), str(tmp_path / "agg")
    V.commit(_rows(spark, 0, 80).repartition(2), base)
    ca = _cagg(spark, base, agg)
    ca.create()
    V.commit(_rows(spark, 80, 120).coalesce(1), base, mode="append")
    V.delete_where(spark, base, [("sym", "=", "1")], merge_on_read=True)
    pd.testing.assert_frame_equal(
        _sorted_pdf(ca.read_realtime()), _sorted_pdf(_full(spark, base))
    )
    # the materialized store itself is UNCHANGED (no refresh ran)
    assert ca.last_refreshed_version() == 1
    assert ca.read().filter(F.col("sym") == "1").count() > 0


def test_create_required_and_key_collision_rejected(spark, tmp_path):
    base, agg = str(tmp_path / "base"), str(tmp_path / "agg")
    V.commit(_rows(spark, 0, 10).coalesce(1), base)
    ca = _cagg(spark, base, agg)
    with pytest.raises(FileNotFoundError):
        ca.refresh()
    with pytest.raises(ValueError):
        ContinuousAggregate(
            spark, base, agg, time_col="ts", bucket_seconds=60,
            group_cols=["sym"], aggs={"sym": F.count(F.lit(1))},
        )
    with pytest.raises(ValueError):
        ContinuousAggregate(
            spark, base, agg, time_col="ts", bucket_seconds=60,
            group_cols=["sym"], aggs={},
        )


def test_agg_store_is_versioned_and_time_travels(spark, tmp_path):
    """The materialized store is a versioned table: each refresh is a
    commit, so yesterday's aggregate view is one time-travel away."""
    base, agg = str(tmp_path / "base"), str(tmp_path / "agg")
    V.commit(_rows(spark, 0, 60).repartition(2), base)
    ca = _cagg(spark, base, agg)
    ca.create()
    v1 = V._list_versions(agg)[-1]
    before = _sorted_pdf(ca.read())
    V.commit(_rows(spark, 60, 90).coalesce(1), base, mode="append")
    ca.refresh()
    import pandas as pd

    pd.testing.assert_frame_equal(_sorted_pdf(ca.read(version=v1)), before)
    assert ca.read().count() > len(before)


def test_commit_tick_stream_and_refresh_policy(spark, tmp_path):
    """The versioned_commits tick source emits one metadata row per
    commit (no data read), and the refresh policy job built on it keeps
    the aggregate current — TimescaleDB's
    add_continuous_aggregate_policy as a streaming job."""
    from open_source_financial_time_series_data_pipeline_architecture_spark.sources.versioned_stream import (
        VersionedCommitsStreamReader,
    )

    base, agg = str(tmp_path / "base"), str(tmp_path / "agg")
    V.commit(_rows(spark, 0, 60).repartition(2), base)
    ca = _cagg(spark, base, agg)
    ca.create()
    V.commit(_rows(spark, 60, 90).coalesce(1), base, mode="append")
    V.delete_where(spark, base, [("sym", "=", "0")], merge_on_read=True)

    # reader contract: one tick per commit, modes faithful
    r = VersionedCommitsStreamReader({"path": base})
    rows, off = r.read(r.initialOffset())
    assert off == {"v": 3}
    assert [(t[0], t[1]) for t in rows] == [
        (1, "overwrite"),
        (2, "append"),
        (3, "dv"),
    ]

    # the policy job: availableNow catch-up refresh
    ck = str(tmp_path / "ck")
    q = ca.refresh_policy_writer(ck).trigger(availableNow=True).start()
    q.awaitTermination()
    _assert_matches_full(spark, ca, base)
    assert ca.last_refreshed_version() == 3

    # more base commits; the SAME checkpoint resumes past seen ticks
    V.commit(_rows(spark, 90, 120).coalesce(1), base, mode="append")
    q = ca.refresh_policy_writer(ck).trigger(availableNow=True).start()
    q.awaitTermination()
    _assert_matches_full(spark, ca, base)
    assert ca.last_refreshed_version() == 4


def test_refresh_policy_catches_up_across_restore(spark, tmp_path):
    """A reference user restores a bad load while a standing refresh
    policy runs: the restore is an ordinary overwrite-mode commit, the
    tick source emits it, and the policy's catch-up refresh converges
    the aggregate back to the restored content — including deleting
    buckets that only existed in the abandoned head."""
    base, agg = str(tmp_path / "base"), str(tmp_path / "agg")
    V.commit(_rows(spark, 0, 60).repartition(2), base)  # v1 (good)
    ca = _cagg(spark, base, agg)
    ca.create()
    ck = str(tmp_path / "ck")
    # v2: the "bad load" — far-future buckets + doubled prices
    V.commit(
        _rows(spark, 500, 560, px_mult=9.0).coalesce(1), base, mode="append"
    )
    q = ca.refresh_policy_writer(ck).trigger(availableNow=True).start()
    q.awaitTermination()
    _assert_matches_full(spark, ca, base)
    n_bad = ca.read().count()
    # v3: RESTORE to v1 under the same standing policy checkpoint
    V.restore(base, 1, spark)
    q = ca.refresh_policy_writer(ck).trigger(availableNow=True).start()
    q.awaitTermination()
    _assert_matches_full(spark, ca, base)
    assert ca.last_refreshed_version() == 3
    assert ca.read().count() < n_bad  # the bad load's buckets left


def test_null_time_rows_are_excluded_everywhere(spark, tmp_path):
    """A NULL bucket key can never be semi-joined, merged, or deleted
    (SQL NULL-key semantics) — so NULL-time rows are excluded from the
    aggregate on EVERY path, or a once-materialized NULL-bucket row
    would be unmaintainable forever."""
    from pyspark.sql import types as T

    base, agg = str(tmp_path / "base"), str(tmp_path / "agg")
    good = _rows(spark, 0, 40)
    nulls = spark.createDataFrame(
        [(None, "0", 1.0), (None, "1", 2.0)],
        T.StructType(
            [
                T.StructField("ts", T.TimestampType(), True),
                T.StructField("sym", T.StringType(), True),
                T.StructField("px", T.DoubleType(), True),
            ]
        ),
    )
    V.commit(good.unionByName(nulls).coalesce(2), base)
    ca = _cagg(spark, base, agg)
    ca.create()
    assert ca.read().filter(F.col("bucket_start").isNull()).count() == 0
    assert ca.read().agg(F.sum("n")).first()[0] == 40
    # appends carrying more NULL-time rows dirty nothing extra
    V.commit(
        _rows(spark, 40, 60).unionByName(nulls).coalesce(1),
        base,
        mode="append",
    )
    rep: dict = {}
    ca.refresh(report=rep)
    assert ca.read().filter(F.col("bucket_start").isNull()).count() == 0
    assert ca.read().agg(F.sum("n")).first()[0] == 60
    # realtime path too
    V.commit(_rows(spark, 60, 70).unionByName(nulls).coalesce(1), base, mode="append")
    rt = ca.read_realtime()
    assert rt.filter(F.col("bucket_start").isNull()).count() == 0
    assert rt.agg(F.sum("n")).first()[0] == 70


def test_refresh_property_random_dml_sequences(spark, tmp_path):
    """Property: for ANY sequence of appends / copy-on-write updates /
    merge-on-read deletes / merge-on-read updates / compactions /
    overwrites / restores, an incremental refresh after each step
    leaves the materialized table equal to a from-scratch aggregation
    of the base head. Deterministic pseudo-random op sequence (seeded)
    — the cheap exhaustive sweep a single-shape test can't give.
    Overwrite and restore are the whole-snapshot-diff path through the
    CDF (versioned_stream diffs resets as delete-all + insert-all), so
    they dirty every surviving bucket — the reference analog is a CA
    refresh after a backfill/correction load
    (sql/timescaledb_schema.sql:60-65)."""
    import random

    rng = random.Random(1729)
    base, agg = str(tmp_path / "base"), str(tmp_path / "agg")
    V.commit(_rows(spark, 0, 80).repartition(2), base)
    ca = _cagg(spark, base, agg)
    ca.create()
    nxt = 80
    for step in range(14):
        op = rng.choice(
            [
                "append",
                "update",
                "mor_delete",
                "mor_update",
                "compact",
                "overwrite",
                "restore",
            ]
        )
        if op == "append":
            n = rng.randint(1, 30)
            V.commit(_rows(spark, nxt, nxt + n).coalesce(1), base, mode="append")
            nxt += n
        elif op == "update":
            s = str(rng.randint(0, 2))
            V.update_where(
                spark, base, [("sym", "=", s)], {"px": F.col("px") + 1.0}
            )
        elif op == "mor_delete":
            lo = rng.randint(0, nxt)
            V.delete_where(
                spark, base,
                [("px", ">=", lo * 1.5), ("px", "<", (lo + 10) * 1.5)],
                merge_on_read=True,
            )
        elif op == "mor_update":
            s = str(rng.randint(0, 2))
            V.update_where(
                spark, base, [("sym", "=", s)], {"px": F.col("px") * 1.5},
                merge_on_read=True,
            )
        elif op == "overwrite":
            # a correction/backfill load replacing the whole table
            n = rng.randint(20, 60)
            V.commit(
                _rows(spark, nxt, nxt + n, px_mult=2.5).coalesce(1),
                base,
                mode="overwrite",
            )
            nxt += n
        elif op == "restore":
            vs = V._list_versions(base)
            V.restore(base, rng.choice(vs[:-1] or vs), spark)
        else:
            V.compact(spark, base, n_files=2)
        if rng.random() < 0.7:  # sometimes batch several ops per refresh
            ca.refresh()
            _assert_matches_full(spark, ca, base)
    ca.refresh()
    _assert_matches_full(spark, ca, base)


# -- hierarchical caggs (TimescaleDB cagg-on-cagg, r7) --------------------


def _full_rollup(spark, base, bucket):
    """From-scratch truth for the child: bucket the RAW base at the
    child grain (combinable aggs only, so this equals rolling up the
    parent partials)."""
    return (
        V.read_version(spark, base)
        .withColumn(
            "bucket_start",
            F.timestamp_seconds(
                F.floor(F.col("ts").cast("double") / bucket).cast("long")
                * bucket
            ),
        )
        .groupBy("bucket_start", "sym")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("px").alias("sum_px"),
            F.max("px").alias("max_px"),
        )
    )


def _child(spark, parent, cagg_dir, bucket=300):
    return ContinuousAggregate.on_cagg(
        parent,
        cagg_dir,
        bucket_seconds=bucket,
        aggs={
            "n": F.sum("n"),  # count partials re-SUM
            "sum_px": F.sum("sum_px"),
            "max_px": F.max("max_px"),
        },
    )


def test_hierarchical_cagg_propagates_base_dml(spark, tmp_path):
    """base → 1m cagg → 5m cagg: base DML (append + merge-on-read
    delete that empties whole symbols) propagates through BOTH levels
    on refresh_hierarchy(), and the child equals a from-scratch 5m
    aggregation of the raw base head. The child's refresh reads only
    the PARENT STORE's change feed — pinned via its report."""
    base = str(tmp_path / "base")
    agg1, agg5 = str(tmp_path / "agg1m"), str(tmp_path / "agg5m")
    V.commit(_rows(spark, 0, 300).repartitionByRange(4, "ts"), base)
    p = _cagg(spark, base, agg1)
    p.create()
    c = _child(spark, p, agg5)
    c.create()
    pd_eq = __import__("pandas").testing.assert_frame_equal
    pd_eq(_sorted_pdf(c.read()), _sorted_pdf(_full_rollup(spark, base, 300)))

    # base DML: append new time range + delete a whole symbol
    V.commit(_rows(spark, 300, 420).coalesce(1), base, mode="append")
    V.delete_where(spark, base, [("sym", "=", "1")], merge_on_read=True)
    reports: list = []
    c.refresh_hierarchy(reports)
    assert len(reports) == 2  # parent then child
    assert reports[0]["refreshed"] and reports[1]["refreshed"]
    assert reports[1]["buckets_deleted"] > 0  # sym=1 left level 2 too
    pd_eq(_sorted_pdf(c.read()), _sorted_pdf(_full_rollup(spark, base, 300)))
    assert c.read().filter(F.col("sym") == "1").count() == 0

    # idempotent: nothing advanced → second run is a no-op at each level
    reports2: list = []
    c.refresh_hierarchy(reports2)
    assert not reports2[1].get("buckets_dirty")
    pd_eq(_sorted_pdf(c.read()), _sorted_pdf(_full_rollup(spark, base, 300)))


def test_hierarchical_cagg_validation(spark, tmp_path):
    base = str(tmp_path / "base")
    V.commit(_rows(spark, 0, 10).coalesce(1), base)
    p = _cagg(spark, base, str(tmp_path / "agg1m"))
    with pytest.raises(ValueError, match="whole .*multiple"):
        ContinuousAggregate.on_cagg(
            p, str(tmp_path / "bad"), bucket_seconds=90, aggs={"n": F.sum("n")}
        )
    with pytest.raises(ValueError, match="group_cols"):
        ContinuousAggregate.on_cagg(
            p,
            str(tmp_path / "bad2"),
            bucket_seconds=300,
            group_cols=["sym", "px"],
            aggs={"n": F.sum("n")},
        )


def test_hierarchical_cagg_random_dml_convergence(spark, tmp_path):
    """The two-level analog of the DML property test: any op sequence
    on the raw base converges through the chain."""
    import random

    rng = random.Random(31337)
    base = str(tmp_path / "base")
    V.commit(_rows(spark, 0, 120).repartition(2), base)
    p = _cagg(spark, base, str(tmp_path / "agg1m"))
    p.create()
    c = _child(spark, p, str(tmp_path / "agg5m"))
    c.create()
    nxt = 120
    pd_eq = __import__("pandas").testing.assert_frame_equal
    for _ in range(6):
        op = rng.choice(["append", "mor_delete", "update", "restore"])
        if op == "append":
            n = rng.randint(5, 40)
            V.commit(_rows(spark, nxt, nxt + n).coalesce(1), base, mode="append")
            nxt += n
        elif op == "mor_delete":
            lo = rng.randint(0, nxt)
            V.delete_where(
                spark, base,
                [("px", ">=", lo * 1.5), ("px", "<", (lo + 15) * 1.5)],
                merge_on_read=True,
            )
        elif op == "update":
            s = str(rng.randint(0, 2))
            V.update_where(
                spark, base, [("sym", "=", s)], {"px": F.col("px") + 0.25}
            )
        else:
            vs = V._list_versions(base)
            V.restore(base, rng.choice(vs[:-1] or vs), spark)
        c.refresh_hierarchy()
        pd_eq(
            _sorted_pdf(c.read()), _sorted_pdf(_full_rollup(spark, base, 300))
        )


# -- windowed refresh / policy offsets (r7) -------------------------------
# TimescaleDB's refresh_continuous_aggregate(start, end) and policy
# start_offset/end_offset — the reference's own policy calls
# (sql/timescaledb_schema.sql:60-65). Out-of-window invalidations
# persist as pending ranges in the agg store's commit user_metadata and
# materialize when a later window covers them; realtime treats them as
# dirty meanwhile.


def test_windowed_refresh_defers_and_later_drains(spark, tmp_path):
    base, agg = str(tmp_path / "base"), str(tmp_path / "agg")
    V.commit(_rows(spark, 0, 100).repartition(2), base)
    ca = _cagg(spark, base, agg)
    ca.create()
    # two disjoint dirtied regions: an OLD backfill and a RECENT append
    V.commit(_rows(spark, 100, 140).coalesce(1), base, mode="append")  # recent
    V.update_where(  # old region: px bumped → old buckets dirty
        spark, base, [("px", "<", 30.0)], {"px": F.col("px") + 1000.0}
    )
    recent_start = T0 + 100 * 37
    rep: dict = {}
    ca.refresh(report=rep, window_start=recent_start)
    assert rep["refreshed"] and rep["pending_after"] > 0
    # recent buckets materialized; old buckets STALE in the store
    assert ca.read().filter(F.col("max_px") > 900).count() == 0  # stale
    got_recent = ca.read().filter(
        F.col("bucket_start") >= F.timestamp_seconds(F.lit(recent_start))
    )
    assert got_recent.count() > 0
    # realtime is EXACT anyway: pending ranges count as dirty
    import pandas as pd

    pd.testing.assert_frame_equal(
        _sorted_pdf(ca.read_realtime()), _sorted_pdf(_full(spark, base))
    )
    # the high-water DID advance (pending carries the rest)
    assert ca.last_refreshed_version() == V._list_versions(base)[-1]
    rep_noop: dict = {}
    ca.refresh(report=rep_noop, window_start=recent_start)
    assert rep_noop["refreshed"] is False  # nothing new in-window
    # an unwindowed refresh drains the pending ranges
    rep2: dict = {}
    ca.refresh(report=rep2)
    assert rep2["refreshed"] and rep2["pending_after"] == 0
    _assert_matches_full(spark, ca, base)
    assert ca._pending_ranges() == []


def test_windowed_refresh_pending_delete_propagates(spark, tmp_path):
    """Deletes deferred by the window still delete their buckets when
    the pending range finally refreshes (keys_in_ranges includes the
    MATERIALIZED side)."""
    base, agg = str(tmp_path / "base"), str(tmp_path / "agg")
    V.commit(_rows(spark, 0, 100).repartition(2), base)
    ca = _cagg(spark, base, agg)
    ca.create()
    n0 = ca.read().count()
    # delete EVERY row of the old half (empties whole buckets)
    V.delete_where(
        spark, base, [("px", "<", 50 * 1.5)], merge_on_read=True
    )
    far_future = T0 + 10**7
    ca.refresh(window_start=far_future)  # nothing in-window
    assert ca.read().count() == n0  # store untouched, all pending
    pd_eq = __import__("pandas").testing.assert_frame_equal
    pd_eq(_sorted_pdf(ca.read_realtime()), _sorted_pdf(_full(spark, base)))
    ca.refresh()  # drain
    _assert_matches_full(spark, ca, base)
    assert ca.read().count() < n0


def test_policy_offsets_hold_back_hot_tail(spark, tmp_path):
    """end_offset keeps the hot tail out of the store; a later tick
    (clock advanced) materializes it."""
    base, agg = str(tmp_path / "base"), str(tmp_path / "agg")
    V.commit(_rows(spark, 0, 60).repartition(2), base)
    ca = _cagg(spark, base, agg)
    ca.create()
    data_end = T0 + 60 * 37
    V.commit(_rows(spark, 60, 120).coalesce(1), base, mode="append")
    clock = {"now": data_end + 600}
    ck = str(tmp_path / "ck")
    w = ca.refresh_policy_writer(
        ck,
        start_offset=10**6,
        end_offset=900,  # hold back the last 15 min before "now"
        now_fn=lambda: clock["now"],
    )
    q = w.trigger(availableNow=True).start()
    q.awaitTermination()
    held = ca._pending_ranges()
    assert held, "hot tail should be pending"
    # the appended rows all land beyond now − end_offset, so NONE of
    # their buckets reached the store (create()-time buckets stay — the
    # window governs refreshes, like TimescaleDB's WITH DATA create)
    assert (
        ca.read()
        .filter(
            F.col("bucket_start") >= F.timestamp_seconds(F.lit(data_end))
        )
        .count()
        == 0
    )
    pd_eq = __import__("pandas").testing.assert_frame_equal
    pd_eq(_sorted_pdf(ca.read_realtime()), _sorted_pdf(_full(spark, base)))
    # clock advances past the tail; a new base commit ticks the policy
    clock["now"] = data_end + 10**5
    V.commit(_rows(spark, 120, 121).coalesce(1), base, mode="append")
    q = ca.refresh_policy_writer(
        ck, start_offset=10**6, end_offset=900,
        now_fn=lambda: clock["now"],
    ).trigger(availableNow=True).start()
    q.awaitTermination()
    _assert_matches_full(spark, ca, base)
    assert ca._pending_ranges() == []


def test_windowed_refresh_property_random_sequences(spark, tmp_path):
    """Property: under ANY interleaving of DML and windowed/unwindowed
    refreshes, (a) read_realtime() is ALWAYS exact (pending ranges
    count as dirty), and (b) a final unwindowed refresh converges the
    store to the full recompute with no pending left."""
    import random

    import pandas as pd

    rng = random.Random(20260816)
    base, agg = str(tmp_path / "base"), str(tmp_path / "agg")
    V.commit(_rows(spark, 0, 80).repartition(2), base)
    ca = _cagg(spark, base, agg)
    ca.create()
    nxt = 80
    t_lo, t_hi = T0, T0 + 80 * 37
    for step in range(8):
        op = rng.choice(["append", "mor_delete", "update"])
        if op == "append":
            n = rng.randint(5, 30)
            V.commit(_rows(spark, nxt, nxt + n).coalesce(1), base, mode="append")
            nxt += n
            t_hi = T0 + nxt * 37
        elif op == "mor_delete":
            lo = rng.randint(0, nxt)
            V.delete_where(
                spark, base,
                [("px", ">=", lo * 1.5), ("px", "<", (lo + 12) * 1.5)],
                merge_on_read=True,
            )
        else:
            s = str(rng.randint(0, 2))
            V.update_where(
                spark, base, [("sym", "=", s)], {"px": F.col("px") + 0.5}
            )
        if rng.random() < 0.8:
            kind = rng.choice(["full", "start", "end", "band", "force"])
            kw = {}
            a = rng.randint(t_lo, t_hi)
            b = rng.randint(t_lo, t_hi)
            if kind == "start":
                kw = {"window_start": a}
            elif kind == "end":
                kw = {"window_end": a}
            elif kind == "band" and abs(a - b) >= 60:
                kw = {"window_start": min(a, b), "window_end": max(a, b)}
            elif kind == "force":  # r8: forced re-materialization is
                # an invariant-preserving op anywhere in the sequence
                kw = {"force": True}
                if rng.random() < 0.5 and abs(a - b) >= 60:
                    kw.update(
                        window_start=min(a, b), window_end=max(a, b)
                    )
            ca.refresh(**kw)
        pd.testing.assert_frame_equal(
            _sorted_pdf(ca.read_realtime()), _sorted_pdf(_full(spark, base))
        )
    ca.refresh()  # unwindowed drain
    assert ca._pending_ranges() == []
    _assert_matches_full(spark, ca, base)


def test_hierarchical_realtime_cascade_exact_vs_raw_base(spark, tmp_path):
    """read_realtime(cascade=True) on a 2-level chain is exact w.r.t.
    the RAW base with NO refresh anywhere — the recompute frame is the
    parent's own realtime and the parent's unmaterialized keys
    re-bucket into this level's dirty set. (TimescaleDB forbids this
    composition outright; here it is exact.)"""
    import pandas as pd

    base = str(tmp_path / "base")
    V.commit(_rows(spark, 0, 200).repartition(2), base)
    p = _cagg(spark, base, str(tmp_path / "agg1m"))
    p.create()
    c = _child(spark, p, str(tmp_path / "agg5m"))
    c.create()
    # base DML with NO refresh at either level
    V.commit(_rows(spark, 200, 320).coalesce(1), base, mode="append")
    V.delete_where(spark, base, [("sym", "=", "2")], merge_on_read=True)
    V.update_where(spark, base, [("sym", "=", "0")], {"px": F.col("px") + 9.0})
    # non-cascade realtime sees only the parent STORE (stale)
    assert c.last_refreshed_version() == 1 and p.last_refreshed_version() == 1
    pd.testing.assert_frame_equal(
        _sorted_pdf(c.read_realtime(cascade=True)),
        _sorted_pdf(_full_rollup(spark, base, 300)),
    )
    # and with a PARTIAL refresh state (parent refreshed, child not)
    p.refresh()
    pd.testing.assert_frame_equal(
        _sorted_pdf(c.read_realtime(cascade=True)),
        _sorted_pdf(_full_rollup(spark, base, 300)),
    )
    # default (non-cascade) semantics unchanged: exact vs parent STORE
    pd.testing.assert_frame_equal(
        _sorted_pdf(c.read_realtime()),
        _sorted_pdf(
            p.read()
            .withColumn(
                "bucket_start",
                F.timestamp_seconds(
                    (F.floor(F.col("bucket_start").cast("double") / 300) * 300)
                    .cast("long")
                ),
            )
            .groupBy("bucket_start", "sym")
            .agg(
                F.sum("n").alias("n"),
                F.sum("sum_px").alias("sum_px"),
                F.max("max_px").alias("max_px"),
            )
        ),
    )


def test_force_refresh_rematerializes_and_repairs(spark, tmp_path):
    """refresh(force=True) — TimescaleDB 2.13's force => true:
    re-materialize the window even with nothing invalidated. Repairs a
    corrupted store (rows the CDF can never re-derive) and is a
    content no-op on a clean one."""
    import pandas as pd

    base, agg = str(tmp_path / "b"), str(tmp_path / "a")
    V.commit(_rows(spark, 0, 100).repartition(2), base)
    ca = _cagg(spark, base, agg)
    ca.create()
    want = _sorted_pdf(_full(spark, base))
    # corrupt the STORE directly: drop some buckets, fake another
    V.delete_where(spark, ca.agg_dir, [("sym", "=", "1")])
    head = V._list_versions(base)[-1]
    ca.refresh()  # plain refresh: base head unchanged → no-op
    assert V._list_versions(base)[-1] == head
    assert len(_sorted_pdf(ca.read())) < len(want)
    rep: dict = {}
    ca.refresh(report=rep, force=True)
    assert rep["refreshed"] and rep["buckets_dirty"] > 0
    pd.testing.assert_frame_equal(_sorted_pdf(ca.read()), want)
    # windowed force only re-materializes the window
    V.delete_where(spark, ca.agg_dir, [("sym", "=", "2")])
    ca.refresh(force=True, window_start=T0 + 50 * 37)
    got = _sorted_pdf(ca.read())
    assert 0 < len(got) < len(want)  # early sym-2 buckets still gone
    ca.refresh(force=True)
    pd.testing.assert_frame_equal(_sorted_pdf(ca.read()), want)


def test_pending_survives_vacuum(spark, tmp_path):
    """Every refresh commit restates the pending key (round 8), so a
    vacuum that drops the commit which ORIGINALLY carried it cannot
    lose the pending state — a fresh instance still sees it."""
    base, agg = str(tmp_path / "b"), str(tmp_path / "a")
    V.commit(_rows(spark, 0, 100).repartition(2), base)
    ca = _cagg(spark, base, agg)
    ca.create()
    V.update_where(spark, base, [("px", ">=", 0.0)],
                   {"px": F.col("px") + 1.0})
    far = T0 + 10**7
    ca.refresh(window_start=far)  # everything defers
    held = ca._pending_ranges()
    assert held
    # more refresh commits (each restates), then vacuum to the head
    for lo in (100, 101, 102):
        V.commit(_rows(spark, lo, lo + 1).coalesce(1), base, mode="append")
        ca.refresh(window_start=far)
    V.vacuum(ca.agg_dir, keep_last=1)
    fresh = _cagg(spark, base, agg)
    assert fresh._pending_ranges() == ca._pending_ranges()
    fresh.refresh()  # drain through the fresh instance
    _assert_matches_full(spark, fresh, base)
