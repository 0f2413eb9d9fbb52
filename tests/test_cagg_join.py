"""Continuous aggregates WITH JOINS (round 8): TimescaleDB 2.10's
caggs-over-joins — the aggregate definition joins the hypertable to a
plain dimension table (broadcast equi-join), group keys and aggregates
may reference dimension columns, and invalidation tracks ONLY the
hypertable: a dimension change never dirties existing buckets; the
next refresh of a dirty bucket sees the CURRENT dimension."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.sources import versioned as V
from open_source_financial_time_series_data_pipeline_architecture_spark.sources.cagg import (
    ContinuousAggregate,
)

T0 = 1_700_000_000

DIM = [("0", "web"), ("1", "web"), ("2", "ops")]


def _rows(spark, lo, hi, step=60):
    return spark.range(lo, hi).select(
        F.timestamp_seconds(F.lit(T0) + F.col("id") * step).alias("ts"),
        (F.col("id") % 3).cast("string").alias("sym"),
        (F.col("id") * 1.5).alias("px"),
    )


def _dim_df(spark, rows=DIM):
    return spark.createDataFrame(rows, "sym string, sector string")


def _cagg(spark, base, agg, enrich):
    return ContinuousAggregate(
        spark, base, agg,
        time_col="ts", bucket_seconds=600, group_cols=["sector"],
        aggs={"n": F.count(F.lit(1)), "sum_px": F.sum("px")},
        enrich=enrich,
    )


def _full(spark, base, dim_rows=DIM):
    return (
        V.read_version(spark, base)
        .join(F.broadcast(_dim_df(spark, dim_rows)), "sym")
        .filter(F.col("ts").isNotNull())
        .withColumn(
            "bucket_start",
            F.timestamp_seconds(
                F.floor(F.col("ts").cast("double") / 600).cast("long") * 600
            ),
        )
        .groupBy("bucket_start", "sector")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("px").alias("sum_px"))
    )


def _sorted(df):
    return (
        df.toPandas()
        .sort_values(["bucket_start", "sector"])
        .reset_index(drop=True)
    )


def test_cagg_join_create_refresh_realtime(spark, tmp_path):
    base, agg = str(tmp_path / "b"), str(tmp_path / "a")
    V.commit(_rows(spark, 0, 100).repartition(2), base)
    dim = _dim_df(spark)
    ca = _cagg(spark, base, agg, lambda df: df.join(F.broadcast(dim), "sym"))
    ca.create()
    pd.testing.assert_frame_equal(_sorted(ca.read()), _sorted(_full(spark, base)))
    # DML across the board: append + update + delete → refresh converges
    V.commit(_rows(spark, 100, 130).coalesce(1), base, mode="append")
    V.update_where(spark, base, [("px", "<", 30.0)],
                   {"px": F.col("px") + 100.0})
    V.delete_where(spark, base, [("sym", "=", "2"),
                                 ("px", ">", 150.0)], merge_on_read=True)
    rep: dict = {}
    ca.refresh(report=rep)
    assert rep["refreshed"]
    pd.testing.assert_frame_equal(_sorted(ca.read()), _sorted(_full(spark, base)))
    # realtime exactness with a further unrefreshed append
    V.commit(_rows(spark, 130, 140).coalesce(1), base, mode="append")
    pd.testing.assert_frame_equal(
        _sorted(ca.read_realtime()), _sorted(_full(spark, base))
    )


def test_cagg_join_inner_join_filters(spark, tmp_path):
    """A base row whose dim key is absent aggregates NOWHERE (inner
    join semantics) — and its deletes don't dirty anything either."""
    base, agg = str(tmp_path / "b"), str(tmp_path / "a")
    V.commit(_rows(spark, 0, 90).repartition(2), base)
    dim = _dim_df(spark, DIM[:2])  # sym '2' unmapped
    ca = _cagg(spark, base, agg, lambda df: df.join(F.broadcast(dim), "sym"))
    ca.create()
    got = ca.read()
    assert got.filter(F.col("sector") == "ops").count() == 0
    pd.testing.assert_frame_equal(
        _sorted(got), _sorted(_full(spark, base, DIM[:2]))
    )
    # deleting only unmapped rows: refresh finds zero dirty buckets
    V.delete_where(spark, base, [("sym", "=", "2")], merge_on_read=True)
    rep: dict = {}
    ca.refresh(report=rep)
    assert rep["buckets_dirty"] == 0


def test_cagg_join_dim_change_semantics(spark, tmp_path):
    """TimescaleDB contract: invalidation tracks only the hypertable.
    A dimension change alone leaves the store untouched; the next
    base-driven refresh of a dirty bucket sees the CURRENT dim while
    clean buckets keep their old enrichment (mixed state by design —
    refresh a window to force re-enrichment)."""
    base, agg, dimdir = (
        str(tmp_path / "b"), str(tmp_path / "a"), str(tmp_path / "dim")
    )
    V.commit(_rows(spark, 0, 100).repartition(2), base)
    V.commit(_dim_df(spark), dimdir)

    def enrich(df):
        return df.join(
            F.broadcast(V.read_version(spark, dimdir)), "sym"
        )

    ca = _cagg(spark, base, agg, enrich)
    ca.create()
    before = _sorted(ca.read())
    # dim flips sym '2' ops→web — NO base change: refresh is a no-op
    V.commit(
        _dim_df(spark, [("0", "web"), ("1", "web"), ("2", "web")]), dimdir
    )
    rep: dict = {}
    ca.refresh(report=rep)
    assert rep["refreshed"] is False
    pd.testing.assert_frame_equal(_sorted(ca.read()), before)
    # a base append dirties ONE late bucket → only it re-enriches
    V.commit(_rows(spark, 100, 110).coalesce(1), base, mode="append")
    ca.refresh()
    got = ca.read()
    late = got.filter(
        F.col("bucket_start") >= F.timestamp_seconds(F.lit(T0 + 100 * 60))
    )
    # the late bucket has NO ops rows (current dim maps all to web)
    assert late.filter(F.col("sector") == "ops").count() == 0
    # untouched early buckets still carry the old 'ops' sector rows
    assert got.filter(F.col("sector") == "ops").count() > 0
    # FORCE refresh (TimescaleDB 2.13 force => true): re-materializes
    # every bucket through the CURRENT dim — the only way to re-derive
    # buckets whose stale group keys ('ops') no longer flow from the
    # base; the orphaned 'ops' rows delete-detect via the mat-side keys
    rep2: dict = {}
    ca.refresh(report=rep2, force=True)
    assert rep2["refreshed"] and rep2["buckets_deleted"] > 0
    pd.testing.assert_frame_equal(
        _sorted(ca.read()),
        _sorted(
            _full(spark, base, [("0", "web"), ("1", "web"), ("2", "web")])
        ),
    )


def test_cagg_join_windowed_and_pending(spark, tmp_path):
    """Enrichment composes with windowed refresh: deferred pending
    ranges recompute THROUGH the join when drained."""
    base, agg = str(tmp_path / "b"), str(tmp_path / "a")
    V.commit(_rows(spark, 0, 100).repartition(2), base)
    dim = _dim_df(spark)
    ca = _cagg(spark, base, agg, lambda df: df.join(F.broadcast(dim), "sym"))
    ca.create()
    V.update_where(spark, base, [("px", ">=", 0.0)],
                   {"px": F.col("px") + 1.0})
    ca.refresh(window_start=T0 + 50 * 60)
    assert ca._pending_ranges()
    pd.testing.assert_frame_equal(
        _sorted(ca.read_realtime()), _sorted(_full(spark, base))
    )
    ca.refresh()  # drain
    assert ca._pending_ranges() == []
    pd.testing.assert_frame_equal(_sorted(ca.read()), _sorted(_full(spark, base)))


def test_cagg_health_and_gapfilled_realtime(spark, tmp_path):
    """health(): the reference's continuous_aggregate_lag_seconds gauge
    (health_dashboard.py:109-137) from manifest metadata; gapfilled
    realtime composes the dense grid with the exact unrefreshed tail."""
    base, agg = str(tmp_path / "b"), str(tmp_path / "a")
    V.commit(_rows(spark, 0, 100).repartition(2), base)
    dim = _dim_df(spark)
    ca = _cagg(spark, base, agg, lambda df: df.join(F.broadcast(dim), "sym"))
    ca.create()
    h = ca.health()
    assert h["status"] == "healthy" and h["lag_seconds"] == 0.0
    assert h["versions_behind"] == 0 and h["pending_ranges"] == 0
    assert h["store_files"] >= 1 and h["store_bytes"] > 0
    # an unrefreshed append 1h past the data end → lag grows past 2 min
    V.commit(
        spark.range(1).select(
            F.timestamp_seconds(F.lit(T0 + 100 * 60 + 3600)).alias("ts"),
            F.lit("0").alias("sym"),
            F.lit(1.0).alias("px"),
        ),
        base,
        mode="append",
    )
    h2 = ca.health()
    assert h2["versions_behind"] == 1
    assert h2["lag_seconds"] > 120 and h2["status"] == "degraded"
    # gapfilled realtime: dense grid AND the unrefreshed row included
    gf = ca.read_gapfilled(value_cols=["n"], realtime=True)
    assert gf.filter(
        F.col("bucket_start")
        >= F.timestamp_seconds(F.lit(T0 + 100 * 60 + 3600 - 600))
    ).count() >= 1
    assert gf.filter(F.col("is_gap")).count() > 0  # the 1h hole filled
    ca.refresh()
    assert ca.health()["lag_seconds"] == 0.0
