"""Sketch partials inside continuous aggregates (round 7 —
TimescaleDB Toolkit's hyperloglog-in-a-cagg pattern): the cagg
materializes mergeable sketch STATE, the hierarchical rollup merges
partials, the estimate happens at read time."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.functions import sketches as S
from open_source_financial_time_series_data_pipeline_architecture_spark.sources import versioned as V
from open_source_financial_time_series_data_pipeline_architecture_spark.sources.cagg import (
    ContinuousAggregate,
)

T0 = 1_700_000_000


def _rows(spark, lo, hi):
    # uid repeats (id % 97) so distinct-per-bucket < row count
    return spark.range(lo, hi).select(
        F.timestamp_seconds(F.lit(T0) + F.col("id") * 7).alias("ts"),
        (F.col("id") % 2).cast("string").alias("sym"),
        (F.col("id") % 97).cast("string").alias("uid"),
    )


def test_kmv_merge_equals_direct_partial(spark):
    """Mergeability: k-smallest of the union of per-part k-smallest
    sets == k-smallest over all rows (bit-identical arrays)."""
    df = _rows(spark, 0, 500)
    direct = df.groupBy("sym").agg(S.kmv_partial("uid", k=16).alias("s"))
    two_level = (
        df.withColumn("part", (F.col("ts").cast("long") % 5))
        .groupBy("sym", "part")
        .agg(S.kmv_partial("uid", k=16).alias("s"))
        .groupBy("sym")
        .agg(S.kmv_merge("s", k=16).alias("s"))
    )
    a = {r["sym"]: r["s"] for r in direct.collect()}
    b = {r["sym"]: r["s"] for r in two_level.collect()}
    assert a == b


def test_kmv_estimate_exact_below_k_and_close_above(spark):
    df = _rows(spark, 0, 2000)  # 97 distinct uids per sym (roughly)
    est = (
        df.groupBy("sym")
        .agg(
            S.kmv_partial("uid", k=16).alias("s"),
            F.count_distinct("uid").alias("exact"),
        )
        .select("sym", "exact", S.kmv_estimate("s", k=16).alias("est"))
        .collect()
    )
    for r in est:
        assert r["exact"] > 16
        # KMV with k=16 has ~1/sqrt(k-2) ≈ 27% rsd; generous band
        assert 0.4 * r["exact"] <= r["est"] <= 2.5 * r["exact"]
    small = (
        spark.createDataFrame([("a", "x"), ("a", "y"), ("a", "x")], "g string, v string")
        .groupBy("g")
        .agg(S.kmv_partial("v", k=16).alias("s"))
        .select(S.kmv_estimate("s", k=16).alias("est"))
        .first()
    )
    assert small["est"] == 2  # below k: the partial IS the distinct set


def test_hll_partials_through_hierarchical_cagg(spark, tmp_path):
    """Binary HLL state lives in the materialized store, survives
    MERGE/CDF refresh plumbing, re-merges through a cagg-on-cagg
    rollup, and estimates within HLL error of the exact count."""
    base = str(tmp_path / "base")
    V.commit(_rows(spark, 0, 1500).repartitionByRange(3, "ts"), base)
    parent = ContinuousAggregate(
        spark, base, str(tmp_path / "agg1m"),
        time_col="ts", bucket_seconds=60, group_cols=["sym"],
        aggs={"n": F.count(F.lit(1)), "hll": S.hll_partial("uid")},
    )
    parent.create()
    child = ContinuousAggregate.on_cagg(
        parent, str(tmp_path / "agg5m"), bucket_seconds=300,
        aggs={"n": F.sum("n"), "hll": S.hll_merge("hll")},
    )
    child.create()
    # DML propagates: append more rows, then refresh the chain
    V.commit(_rows(spark, 1500, 2500).coalesce(1), base, mode="append")
    child.refresh_hierarchy()
    got = (
        child.read()
        .select(
            "bucket_start", "sym", "n",
            S.hll_estimate("hll").alias("est"),
        )
    )
    exact = (
        V.read_version(spark, base)
        .withColumn(
            "bucket_start",
            F.timestamp_seconds(
                (F.floor(F.col("ts").cast("double") / 300) * 300).cast("long")
            ),
        )
        .groupBy("bucket_start", "sym")
        .agg(F.count_distinct("uid").alias("exact"))
    )
    joined = got.join(exact, ["bucket_start", "sym"]).collect()
    assert joined
    for r in joined:
        assert abs(r["est"] - r["exact"]) <= max(2, 0.1 * r["exact"]), r


def test_hist_merge_is_exact_and_two_level_equals_direct(spark):
    df = _rows(spark, 0, 800).withColumn(
        "px", (F.col("uid").cast("double") * 3.3) % 100.0
    )
    direct = df.groupBy("sym").agg(
        S.hist_partial("px", 0.0, 100.0, 32).alias("h")
    )
    two = (
        df.withColumn("part", F.col("ts").cast("long") % 4)
        .groupBy("sym", "part")
        .agg(S.hist_partial("px", 0.0, 100.0, 32).alias("h"))
        .groupBy("sym")
        .agg(S.hist_merge("h", 32).alias("h"))
    )
    a = {r["sym"]: r["h"] for r in direct.collect()}
    b = {r["sym"]: r["h"] for r in two.collect()}
    assert a == b
    for h in a.values():
        assert sum(h) == 400  # every non-null row binned exactly once


def test_hist_percentile_matches_grid_walk(spark):
    import math

    vals = [1.0, 5.0, 5.5, 9.9, 20.0, 35.0, 99.0, -3.0, 250.0]  # clamps
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = (
        df.agg(S.hist_partial("x", 0.0, 100.0, 10).alias("h"))
        .select(
            S.hist_percentile("h", 0.5, 0.0, 100.0, 10).alias("p50"),
            S.hist_percentile("h", 0.95, 0.0, 100.0, 10).alias("p95"),
        )
        .first()
    )
    # manual walk: bins (width 10) counts: [-3→0, 1→0, 5,5.5→0, 9.9→0,
    # 20→2, 35→3, 99→9, 250→9] → bin counts idx0:4(+clamped -3 → 5)...
    counts = [0] * 10
    for v in vals:
        counts[min(9, max(0, math.floor(v / 10.0)))] += 1
    def walk(q):
        tot = sum(counts)
        cum = 0
        for i, c in enumerate(counts):
            cum += c
            if cum >= q * tot:
                return i * 10.0
    assert got["p50"] == walk(0.5)
    assert got["p95"] == walk(0.95)


def test_hist_percentile_through_hierarchical_cagg(spark, tmp_path):
    """Histogram partials are EXACTLY combinable: the 5m rollup's
    percentile equals the one computed from a direct 5m aggregation of
    the raw rows — bit-identical, not banded."""
    base = str(tmp_path / "base")
    rows = _rows(spark, 0, 1200).withColumn(
        "px", (F.col("uid").cast("double") * 7.7) % 64.0
    )
    V.commit(rows.repartitionByRange(3, "ts"), base)
    parent = ContinuousAggregate(
        spark, base, str(tmp_path / "agg1m"),
        time_col="ts", bucket_seconds=60, group_cols=["sym"],
        aggs={"h": S.hist_partial("px", 0.0, 64.0, 32)},
    )
    parent.create()
    child = ContinuousAggregate.on_cagg(
        parent, str(tmp_path / "agg5m"), bucket_seconds=300,
        aggs={"h": S.hist_merge("h", 32)},
    )
    child.create()
    V.commit(
        _rows(spark, 1200, 1600)
        .withColumn("px", (F.col("uid").cast("double") * 7.7) % 64.0)
        .coalesce(1),
        base,
        mode="append",
    )
    child.refresh_hierarchy()
    got = child.read().select(
        "bucket_start", "sym",
        S.hist_percentile("h", 0.5, 0.0, 64.0, 32).alias("p50"),
    )
    direct = (
        V.read_version(spark, base)
        .withColumn(
            "bucket_start",
            F.timestamp_seconds(
                (F.floor(F.col("ts").cast("double") / 300) * 300).cast("long")
            ),
        )
        .groupBy("bucket_start", "sym")
        .agg(S.hist_partial("px", 0.0, 64.0, 32).alias("h"))
        .select(
            "bucket_start", "sym",
            S.hist_percentile("h", 0.5, 0.0, 64.0, 32).alias("p50"),
        )
    )
    import pandas as pd

    key = ["bucket_start", "sym"]
    pd.testing.assert_frame_equal(
        got.toPandas().sort_values(key).reset_index(drop=True),
        direct.toPandas().sort_values(key).reset_index(drop=True),
    )


def test_with_hist_percentiles_matches_column_form(spark):
    """The DataFrame (hot-path) form computes the same chosen bin and
    edge as the nested-fold column form — bit-identical columns."""
    df = (
        _rows(spark, 0, 600)
        .withColumn("px", (F.col("uid").cast("double") * 5.1) % 80.0)
        .groupBy("sym")
        .agg(S.hist_partial("px", 0.0, 80.0, 16).alias("h"))
    )
    a = df.select(
        "sym",
        S.hist_percentile("h", 0.5, 0.0, 80.0, 16).alias("p50"),
        S.hist_percentile("h", 0.9, 0.0, 80.0, 16).alias("p90"),
    )
    b = S.with_hist_percentiles(
        df, "h", {"p50": 0.5, "p90": 0.9}, 0.0, 80.0, 16
    ).select("sym", "p50", "p90")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_cms_never_underestimates_and_merge_exact(spark):
    df = _rows(spark, 0, 3000)  # uid = id % 97: known exact counts
    direct = df.agg(S.cms_partial("uid", d=4, w=32).alias("s"))
    two = (
        df.withColumn("part", F.col("ts").cast("long") % 5)
        .groupBy("part")
        .agg(S.cms_partial("uid", d=4, w=32).alias("s"))
        .agg(S.cms_merge("s", d=4, w=32).alias("s"))
    )
    assert direct.first()["s"] == two.first()["s"]  # merge is exact
    exact = {
        r["uid"]: r["n"]
        for r in df.groupBy("uid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    est_df = (
        df.select("uid").distinct()
        .crossJoin(F.broadcast(direct))
        .select("uid", S.cms_estimate(F.col("s"), "uid", d=4, w=32).alias("est"))
    )
    n_total = sum(exact.values())
    for r in est_df.collect():
        assert r["est"] >= exact[r["uid"]]  # CMS never underestimates
        assert r["est"] <= exact[r["uid"]] + n_total  # sanity ceiling


def test_cms_from_counts_equals_partial_merge(spark):
    """The explode+positional-sum build (r9 optimization: replaces the
    d·w-conditional-aggregate form whose Catalyst analysis dominated
    the witness query's runtime) yields the BIT-IDENTICAL merged
    sketch: every counter is an integer sum over the values hashing to
    it, invariant to grouping."""
    df = _rows(spark, 0, 3000)
    wc = df.groupBy("uid").agg(F.count(F.lit(1)).alias("n"))
    via_partials = (
        wc.withColumn("part", F.col("uid").cast("long") % 5)
        .groupBy("part")
        .agg(S.cms_partial("uid", d=4, w=32, weight="n").alias("s"))
        .agg(S.cms_merge("s", d=4, w=32).alias("s"))
    )
    via_counts = S.cms_from_counts(wc, "uid", "n", d=4, w=32)
    assert via_counts.first()["s"] == via_partials.first()["s"]
    assert [f.dataType.simpleString() for f in via_counts.schema.fields] == [
        "array<bigint>"
    ]


def test_sketch_partials_survive_deletes_through_hierarchy(spark, tmp_path):
    """Sketches cannot be DECREMENTED — recompute-not-decrement is what
    makes them legal cagg aggs. A merge-on-read DELETE must leave the
    rolled-up KMV and histogram partials equal to a from-scratch
    aggregation of the surviving rows (bit-identical arrays)."""
    base = str(tmp_path / "base")
    rows = _rows(spark, 0, 1000).withColumn(
        "px", (F.col("uid").cast("double") * 7.7) % 64.0
    )
    V.commit(rows.repartitionByRange(3, "ts"), base)
    parent = ContinuousAggregate(
        spark, base, str(tmp_path / "agg1m"),
        time_col="ts", bucket_seconds=60, group_cols=["sym"],
        aggs={
            "kmv": S.kmv_partial("uid", k=8),
            "h": S.hist_partial("px", 0.0, 64.0, 16),
        },
    )
    parent.create()
    child = ContinuousAggregate.on_cagg(
        parent, str(tmp_path / "agg5m"), bucket_seconds=300,
        aggs={"kmv": S.kmv_merge("kmv", k=8), "h": S.hist_merge("h", 16)},
    )
    child.create()
    V.delete_where(spark, base, [("sym", "=", "1")], merge_on_read=True)
    V.delete_where(spark, base, [("px", "<", 10.0)], merge_on_read=True)
    child.refresh_hierarchy()
    direct = (
        V.read_version(spark, base)
        .withColumn(
            "bucket_start",
            F.timestamp_seconds(
                (F.floor(F.col("ts").cast("double") / 300) * 300).cast("long")
            ),
        )
        .groupBy("bucket_start", "sym")
        .agg(
            S.kmv_partial("uid", k=8).alias("kmv"),
            S.hist_partial("px", 0.0, 64.0, 16).alias("h"),
        )
    )
    key = lambda r: (r["bucket_start"], r["sym"])  # noqa: E731
    got = {key(r): (r["kmv"], r["h"]) for r in child.read().collect()}
    exp = {key(r): (r["kmv"], r["h"]) for r in direct.collect()}
    assert got == exp
    assert child.read().filter(F.col("sym") == "1").count() == 0
