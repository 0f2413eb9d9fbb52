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
