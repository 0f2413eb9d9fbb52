"""Size-aware OPTIMIZE (Delta's real behavior: compact SMALL files
toward a target size; never re-rewrite right-sized data) and
commit-level user metadata (Delta's commitInfo.userMetadata)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.sources import versioned as V


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumn("v", F.col("id") * 10)


def test_size_aware_compact_skips_big_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    # one BIG file (10k rows) + four small ones (10 rows each)
    V.commit(_df(spark, 0, 10_000).coalesce(1), t)
    for k in range(4):
        V.commit(
            _df(spark, 10_000 + k * 10, 10_000 + k * 10 + 10).coalesce(1),
            t,
            mode="append",
        )
    m = V._snapshot(t, V._list_versions(t)[-1], with_stats=False)
    data = os.path.join(t, "data")
    big = max(m["files"], key=lambda f: os.path.getsize(os.path.join(data, f)))
    big_size = os.path.getsize(os.path.join(data, big))
    rep: dict = {}
    snap = V.compact(
        spark,
        t,
        target_file_bytes=big_size * 4,
        min_file_bytes=big_size // 2,
        report=rep,
    )
    # only the four small files were rewritten; the big one survives
    assert rep["files_rewritten"] == 4
    assert big in snap["files"]
    assert len(snap["files"]) == 2  # big + one packed small-file bin
    got = {r["id"] for r in V.read_version(spark, t).collect()}
    assert got == set(range(10_040))


def test_size_aware_compact_lone_small_file_is_noop(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10_000).coalesce(1), t)
    V.commit(_df(spark, 10_000, 10_010).coalesce(1), t, mode="append")
    head = V._list_versions(t)[-1]
    m = V._snapshot(t, head, with_stats=False)
    data = os.path.join(t, "data")
    big_size = max(
        os.path.getsize(os.path.join(data, f)) for f in m["files"]
    )
    rep: dict = {}
    V.compact(
        spark, t, target_file_bytes=big_size * 4,
        min_file_bytes=big_size // 2, report=rep,
    )
    # a single undersized file has nothing to coalesce with: no commit
    assert rep["files_rewritten"] == 0
    assert V._list_versions(t)[-1] == head


def test_size_aware_compact_bin_count(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for k in range(6):
        V.commit(
            _df(spark, k * 1000, (k + 1) * 1000).coalesce(1),
            t,
            mode="append" if k else "overwrite",
        )
    m = V._snapshot(t, V._list_versions(t)[-1], with_stats=False)
    data = os.path.join(t, "data")
    per = max(os.path.getsize(os.path.join(data, f)) for f in m["files"])
    # six ~equal files, target = two files' bytes → ceil(6/2) = 3 bins
    snap = V.compact(
        spark, t, target_file_bytes=per * 2, min_file_bytes=per + 1_000_000
    )
    assert len(snap["files"]) == 3
    assert V.read_version(spark, t).count() == 6000


def test_user_metadata_recorded_in_history(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10), t, user_metadata="initial load")
    V.commit(
        _df(spark, 10, 20), t, mode="append",
        user_metadata="backfill 2026-01 ticket FTS-42",
    )
    V.commit(_df(spark, 20, 30), t, mode="append")  # untagged
    h = V.history(t)
    assert h[0]["user_metadata"] == "initial load"
    assert h[1]["user_metadata"] == "backfill 2026-01 ticket FTS-42"
    assert "user_metadata" not in h[2]
