"""SHALLOW CLONE (round 6): zero-copy table forks via absolute file
references — independent evolution, copy-on-write at file granularity,
stats/data-skipping carried, vacuum isolation both ways."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.sources import versioned as V


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumn("v", F.col("id") * 10)


def _src(spark, tmp_path, files=4, n=400) -> str:
    s = str(tmp_path / "src")
    V.commit(
        _df(spark, 0, n).repartitionByRange(files, "id").sortWithinPartitions("id"),
        s,
    )
    return s


def test_clone_is_zero_copy_and_reads_equal(spark, tmp_path):
    s = _src(spark, tmp_path)
    c = str(tmp_path / "dst")
    snap = V.clone(s, c)
    assert snap["version"] == 1 and snap["n_files"] == 4
    assert all(os.path.isabs(f) for f in snap["files"])
    # ZERO data files under the clone's own data dir
    assert not os.path.isdir(os.path.join(c, V._DATA)) or not os.listdir(
        os.path.join(c, V._DATA)
    )
    assert (
        V.read_version(spark, c).orderBy("id").collect()
        == V.read_version(spark, s).orderBy("id").collect()
    )
    with pytest.raises(FileExistsError):
        V.clone(s, c)


def test_clone_evolves_independently(spark, tmp_path):
    s = _src(spark, tmp_path)
    c = str(tmp_path / "dst")
    V.clone(s, c)
    # append to the clone: lands locally, source untouched
    V.commit(_df(spark, 1000, 1010).coalesce(1), c, mode="append")
    assert V.read_version(spark, c).count() == 410
    assert V.read_version(spark, s).count() == 400
    # merge on the clone rewrites the touched REFERENCED file locally
    rep: dict = {}
    V.merge(
        spark,
        c,
        _df(spark, 0, 5).withColumn("v", F.lit(-1).cast("long")),
        keys=["id"],
        report=rep,
    )
    assert rep["files_rewritten"] == 1
    got = {r["id"]: r["v"] for r in V.read_version(spark, c).collect()}
    assert got[0] == -1 and len(got) == 410
    src_got = {r["id"]: r["v"] for r in V.read_version(spark, s).collect()}
    assert src_got[0] == 0  # source rows untouched
    # and the source can keep writing without seeing the clone
    V.commit(_df(spark, 2000, 2005).coalesce(1), s, mode="append")
    assert V.read_version(spark, c).count() == 410


def test_clone_carries_stats_for_data_skipping(spark, tmp_path):
    s = _src(spark, tmp_path)
    c = str(tmp_path / "dst")
    V.clone(s, c)
    rep: dict = {}
    df = V.read_version(spark, c, predicates=[("id", "<", 100)], prune_report=rep)
    assert df.count() == 100
    assert rep["files_kept"] < rep["files_total"] == 4


def test_clone_vacuum_isolation(spark, tmp_path):
    """The clone's vacuum never touches source files (they are not in
    its own data dir listing); compacting the clone materializes it so
    even a source vacuum can no longer hurt it."""
    s = _src(spark, tmp_path)
    c = str(tmp_path / "dst")
    V.clone(s, c)
    V.commit(_df(spark, 1000, 1010).coalesce(1), c, mode="append")
    assert V.vacuum(c, keep_last=1) == 0  # nothing local is garbage
    assert V.read_version(spark, s).count() == 400  # source intact
    # materialize: compact rewrites every referenced file locally
    snap = V.compact(spark, c, n_files=2)
    assert all(not os.path.isabs(f) for f in snap["files"])
    V.vacuum(s, keep_last=1)  # source vacuum is now irrelevant to c
    assert V.read_version(spark, c).count() == 410


def test_clone_constraints_and_clone_of_clone(spark, tmp_path):
    s = _src(spark, tmp_path)
    V.add_constraint(spark, s, "id_nonneg", "id >= 0")
    c1 = str(tmp_path / "c1")
    c2 = str(tmp_path / "c2")
    V.clone(s, c1)
    snap2 = V.clone(c1, c2)  # clone of a clone: refs pass through
    assert all(os.path.isabs(f) for f in snap2["files"])
    assert V.read_version(spark, c2).count() == 400
    with pytest.raises(V.ConstraintViolationError):
        V.commit(_df(spark, -5, 0).coalesce(1), c2, mode="append")


def test_clone_txn_marks_do_not_carry(spark, tmp_path):
    s = _src(spark, tmp_path)
    V.commit(
        _df(spark, 400, 410).coalesce(1), s, mode="append", txn=("job", 7)
    )
    c = str(tmp_path / "dst")
    V.clone(s, c)
    assert V.last_txn_version(s, "job") == 7
    assert V.last_txn_version(c, "job") is None  # replay must apply here


def test_relative_clone_survives_parent_rename(spark, tmp_path):
    """relative=True stores references relative to the clone's data
    dir, so renaming the COMMON PARENT (the fixture rename-into-place
    protocol, a remount, a volume move) leaves the fork readable."""
    parent = tmp_path / "bundle.build"
    s = str(parent / "src")
    c = str(parent / "fork")
    V.commit(_df(spark, 0, 100).coalesce(2), s)
    snap = V.clone(s, c, relative=True)
    assert all((not os.path.isabs(f)) and os.sep in f for f in snap["files"])
    final = tmp_path / "bundle"
    os.rename(parent, final)
    c2 = str(final / "fork")
    assert V.read_version(spark, c2).count() == 100
    # merges keep working post-rename (stats keyed by the relative ref)
    V.merge(
        spark,
        c2,
        _df(spark, 0, 3).withColumn("v", F.lit(-1).cast("long")),
        keys=["id"],
    )
    got = {r["id"]: r["v"] for r in V.read_version(spark, c2).collect()}
    assert got[0] == -1 and len(got) == 100
    # ... and the renamed source is untouched
    assert {
        r["v"] for r in V.read_version(spark, str(final / "src")).collect()
    } == {i * 10 for i in range(100)}
