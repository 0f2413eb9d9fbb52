"""Columnar compression policy (round 8): TimescaleDB's
``add_compression_policy`` rebuilt as a scheduled OPTIMIZE-with-codec
job over the commit tick stream — age-based zstd rewrite of provably
cold chunks, snappy kept on the hot ingest path, convergence by
construction (candidates = cold ∧ wrong-codec), and the reference's
``compression_ratio`` health metric served from parquet footers
(reference src/observability/health_dashboard.py:119,331)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.sources import versioned as V

T0 = 1_700_000_000


def _rows(spark, lo, hi, step=60):
    return spark.range(lo, hi).select(
        F.timestamp_seconds(F.lit(T0) + F.col("id") * step).alias("ts"),
        (F.col("id") % 3).cast("string").alias("sym"),
        (F.col("id") * 1.5).alias("px"),
    )


def _codecs(table_dir):
    m = V._snapshot(table_dir, V._list_versions(table_dir)[-1], with_stats=False)
    return V.file_compression(table_dir, m["files"])


def test_compression_policy_rewrites_cold_only_and_converges(
    spark, tmp_path
):
    base = str(tmp_path / "tbl")
    # 4 time-clustered chunks; the clock makes the older two cold
    V.commit(_rows(spark, 0, 100).repartitionByRange(4, "ts"), base)
    before = (
        V.read_version(spark, base)
        .orderBy("ts", "sym")
        .toPandas()
        .reset_index(drop=True)
    )
    assert {i["codec"] for i in _codecs(base).values()} == {"snappy"}
    tbl = V.VersionedTable(spark, base)
    clock = {"now": T0 + 100 * 60}
    ck = str(tmp_path / "ck")
    q = (
        tbl.compression_policy_writer(
            ck,
            time_col="ts",
            older_than=50 * 60,  # the first two chunks are wholly older
            codec="zstd",
            codec_level=9,
            now_fn=lambda: clock["now"],
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    by_codec: dict = {}
    for info in _codecs(base).values():
        by_codec.setdefault(info["codec"], 0)
        by_codec[info["codec"]] += 1
    # cold chunks → one zstd rewrite (bin-packed); hot chunks untouched
    assert by_codec.get("zstd", 0) >= 1
    assert by_codec.get("snappy", 0) == 2
    # row-identical (an optimize commit is logically a no-op)
    import pandas as pd

    pd.testing.assert_frame_equal(
        V.read_version(spark, base)
        .orderBy("ts", "sym")
        .toPandas()
        .reset_index(drop=True),
        before,
    )
    # the ratio metric sees both codecs and a sane overall ratio
    cs = tbl.compression_stats()
    assert set(cs["codecs"]) == {"zstd", "snappy"}
    assert cs["compression_ratio"] and cs["compression_ratio"] > 0
    # convergence: the policy's own optimize commit ticked once more
    # during availableNow already; an explicit second run adds nothing
    head = V._list_versions(base)[-1]
    q = (
        tbl.compression_policy_writer(
            ck,
            time_col="ts",
            older_than=50 * 60,
            codec="zstd",
            now_fn=lambda: clock["now"],
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert V._list_versions(base)[-1] == head


def test_compression_policy_picks_up_newly_cold(spark, tmp_path):
    """The clock advances → yesterday's hot chunk ages past the
    boundary and ONLY it is rewritten (the archive stays untouched —
    its codec already matches)."""
    base = str(tmp_path / "tbl")
    V.commit(_rows(spark, 0, 100).repartitionByRange(4, "ts"), base)
    tbl = V.VersionedTable(spark, base)
    clock = {"now": T0 + 100 * 60}
    ck = str(tmp_path / "ck")

    def _run():
        q = (
            tbl.compression_policy_writer(
                ck,
                time_col="ts",
                older_than=50 * 60,
                codec="zstd",
                now_fn=lambda: clock["now"],
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _run()
    archive = {
        f for f, i in _codecs(base).items() if i["codec"] == "zstd"
    }
    assert archive
    clock["now"] += 25 * 60  # one more chunk ages out
    V.commit(  # any commit ticks the policy
        _rows(spark, 100, 101).coalesce(1), base, mode="append"
    )
    _run()
    now = _codecs(base)
    # the old archive files were NOT rewritten again
    assert archive <= set(now)
    # and at least one more file converted
    assert sum(1 for i in now.values() if i["codec"] == "zstd") > len(
        archive
    )


def test_compact_codec_and_only_files(spark, tmp_path):
    """compact(codec=...) rewrites with the requested codec;
    only_files restricts the rewrite set file-granularly."""
    base = str(tmp_path / "tbl")
    V.commit(_rows(spark, 0, 40).repartitionByRange(2, "ts"), base)
    m = V._snapshot(base, V._list_versions(base)[-1], with_stats=False)
    target = sorted(m["files"])[:1]
    rep: dict = {}
    V.compact(
        spark, base, n_files=1, codec="zstd", only_files=target, report=rep
    )
    assert rep["files_rewritten"] == 1
    codecs = sorted(i["codec"] for i in _codecs(base).values())
    assert codecs == ["snappy", "zstd"]
    assert V.read_version(spark, base).count() == 40


def test_compression_policy_composes_with_cagg_store(spark, tmp_path):
    """TimescaleDB's canonical pairing: compress the CAGG's own
    materialized store. The policy's optimize commits are CDF-invisible
    and rebase under racing MERGEs, so refresh semantics are untouched
    while the archive half of the store converts to zstd."""
    import pandas as pd
    from pyspark.sql import functions as F

    from open_source_financial_time_series_data_pipeline_architecture_spark.sources.cagg import (
        ContinuousAggregate,
    )

    base, agg = str(tmp_path / "b"), str(tmp_path / "a")
    V.commit(
        _rows(spark, 0, 200).repartitionByRange(4, "ts"), base
    )
    ca = ContinuousAggregate(
        spark, base, agg,
        time_col="ts", bucket_seconds=600, group_cols=["sym"],
        aggs={"n": F.count(F.lit(1)), "sum_px": F.sum("px")},
    )
    ca.create()
    # re-chunk the store by time (compact cluster_by — the hypertable
    # layout whose tight envelopes age tiers and drop_chunks want)
    V.compact(spark, agg, n_files=4, cluster_by=["bucket_start"])
    want = (
        ca.read().toPandas()
        .sort_values(["bucket_start", "sym"]).reset_index(drop=True)
    )
    tbl = V.VersionedTable(spark, agg)
    ck = str(tmp_path / "ck")
    q = (
        tbl.compression_policy_writer(
            ck,
            time_col="bucket_start",
            older_than=100 * 60,
            codec="zstd",
            now_fn=lambda: float(T0 + 200 * 60),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    codecs = {i["codec"] for i in _codecs(agg).values()}
    assert "zstd" in codecs and "snappy" in codecs
    pd.testing.assert_frame_equal(
        ca.read().toPandas()
        .sort_values(["bucket_start", "sym"]).reset_index(drop=True),
        want,
    )
    # refresh through the compressed store: MERGE rebases/prunes fine
    V.commit(_rows(spark, 200, 220).coalesce(1), base, mode="append")
    ca.refresh()
    got = (
        ca.read().toPandas()
        .sort_values(["bucket_start", "sym"]).reset_index(drop=True)
    )
    assert len(got) > len(want)


def test_compression_policy_through_column_mapping(spark, tmp_path):
    """Policy predicates are LOGICAL names; stats are keyed by PHYSICAL
    names — the cold-file proof must translate through the column
    mapping (the r6 silent-miss bug class)."""
    base = str(tmp_path / "tbl")
    V.commit(_rows(spark, 0, 100).repartitionByRange(4, "ts"), base)
    V.enable_column_mapping(base)
    V.rename_column(base, "ts", "event_time")
    tbl = V.VersionedTable(spark, base)
    ck = str(tmp_path / "ck")
    q = (
        tbl.compression_policy_writer(
            ck,
            time_col="event_time",
            older_than=50 * 60,
            codec="zstd",
            now_fn=lambda: float(T0 + 100 * 60),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert any(i["codec"] == "zstd" for i in _codecs(base).values())
    got = V.read_version(spark, base)
    assert got.count() == 100 and "event_time" in got.columns


def test_compression_stats_on_shallow_clone(spark, tmp_path):
    """Footer reads resolve clone refs (absolute or data-dir-relative)
    the same way every other read path does."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    V.commit(_rows(spark, 0, 50).repartitionByRange(2, "ts"), src)
    V.compact(spark, src, n_files=1, codec="zstd",
              only_files=sorted(V._snapshot(
                  src, V._list_versions(src)[-1], with_stats=False
              )["files"])[:1])
    V.clone(src, dst, relative=True)
    cs = V.compression_stats(dst)
    assert set(cs["codecs"]) == {"zstd", "snappy"}
    assert cs["bytes"] > 0 and cs["compression_ratio"]


def test_files_df_metadata_inventory(spark, tmp_path):
    """files_df(): the Iceberg-.files / DESCRIBE DETAIL inventory —
    logical stat names through a rename, SQL-queryable."""
    import json as _json

    base = str(tmp_path / "tbl")
    V.commit(_rows(spark, 0, 100).repartitionByRange(4, "ts"), base)
    V.enable_column_mapping(base)
    V.rename_column(base, "ts", "event_time")
    tbl = V.VersionedTable(spark, base)
    inv = tbl.files_df()
    rows = inv.collect()
    assert len(rows) == 4
    assert sum(r["n_rows"] for r in rows) == 100
    assert all(r["size_bytes"] > 0 for r in rows)
    stats = [_json.loads(r["stats"]) for r in rows]
    # stats keys are LOGICAL (the renamed name, not the physical one)
    assert all("event_time" in s for s in stats)
    assert not any(k.startswith("col_") for s in stats for k in s)


def test_compression_policy_skips_unreadable_footer(
    spark, tmp_path, monkeypatch
):
    """A cold file whose parquet footer could not be read (absent from
    file_compression's result) is excluded from BOTH the rewrite set
    and the bin-pack size sum — it used to pass the wrong-codec filter
    as codec None and then KeyError the streaming batch (round-9
    advice fix)."""
    base = str(tmp_path / "tbl")
    V.commit(_rows(spark, 0, 100).repartitionByRange(4, "ts"), base)
    tbl = V.VersionedTable(spark, base)
    real = V.file_compression
    dropped: dict = {}

    def _flaky(table_dir, files):
        out = real(table_dir, files)
        if out and not dropped:
            victim = sorted(out)[0]
            dropped["f"] = victim
            out = {f: i for f, i in out.items() if f != victim}
        return out

    monkeypatch.setattr(V, "file_compression", _flaky)
    ck = str(tmp_path / "ck")
    q = (
        tbl.compression_policy_writer(
            ck,
            time_col="ts",
            older_than=0.0,  # everything is cold
            codec="zstd",
            now_fn=lambda: T0 + 200 * 60,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()  # must not raise despite the unreadable footer
    assert dropped  # the monkeypatch did hide one footer
    codecs = {i["codec"] for i in real(
        base, V._snapshot(base, V._list_versions(base)[-1],
                          with_stats=False)["files"]
    ).values()}
    # the readable cold files were rewritten; nothing crashed
    assert "zstd" in codecs
