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


# ---------------------------------------------------------------------------
# CONVERT TO versioned (Delta's CONVERT TO DELTA): adopt an existing
# flat parquet directory in place — zero copy, references like a clone


def test_convert_in_place_zero_copy(spark, tmp_path):
    import os

    plain = str(tmp_path / "plain")
    df = (
        spark.range(0, 100)
        .selectExpr("id", "id * 1.5 AS v")
        .repartitionByRange(4, "id")  # tight per-file id envelopes
    )
    df.write.parquet(plain)
    before = sorted(os.listdir(plain))
    snap = V.convert_to_versioned(spark, plain)
    # nothing moved or copied: the original files are untouched and the
    # table's own data/ dir holds no data yet
    assert sorted(f for f in os.listdir(plain) if f in before) == before
    got = V.read_version(spark, plain)
    assert got.count() == 100
    assert {r["id"] for r in got.collect()} == set(range(100))
    # footer stats were collected: predicates prune the adopted files
    rep: dict = {}
    V.read_version(spark, plain, predicates=[("id", "=", 5)], prune_report=rep)
    assert rep["files_kept"] < rep["files_total"]
    # the table evolves normally from here
    V.commit(
        spark.range(100, 110).selectExpr("id", "id * 1.5 AS v").coalesce(1),
        plain,
        mode="append",
    )
    assert V.read_version(spark, plain).count() == 110
    # compact materializes everything into data/; reads stay exact
    V.compact(spark, plain, n_files=2)
    assert V.read_version(spark, plain).count() == 110
    # conversion is one-shot
    import pytest as _pytest

    with _pytest.raises(FileExistsError):
        V.convert_to_versioned(spark, plain)


def test_convert_rejects_hive_partitions_and_empty(spark, tmp_path):
    import os

    part = str(tmp_path / "part")
    (
        spark.range(0, 10)
        .selectExpr("id", "id % 2 AS p", "id * 1.5 AS v")
        .write.partitionBy("p")
        .parquet(part)
    )
    with pytest.raises(ValueError):
        V.convert_to_versioned(spark, part)
    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    with pytest.raises(FileNotFoundError):
        V.convert_to_versioned(spark, empty)


def test_detail_reports_features(spark, tmp_path):
    from pyspark.sql import functions as F

    t = str(tmp_path / "tbl")
    V.commit(
        spark.range(0, 20).selectExpr("id", "id * 1.5 AS v").repartition(2),
        t,
        generated={"id2": "id * 2"},
        identity={"rid": {"start": 1, "step": 1}},
    )
    # renaming a generated SOURCE column is blocked (the reserved
    # constraint references it) — rename the untracked one instead
    V.rename_column(t, "v", "value")
    V.delete_where(spark, t, [("id", "=", 3)], merge_on_read=True)
    V.add_constraint(spark, t, "value_known", "value IS NOT NULL")
    d = V.detail(t)
    assert d["n_rows"] == 20  # stats count raw rows (DV applies at read)
    assert d["n_files"] >= 2 and d["size_bytes"] > 0
    assert d["features"] == {
        "constraints": ["value_known"],
        "generated_columns": ["id2"],
        "identity_columns": ["rid"],
        "column_mapping": True,
        "deletion_vectors": True,
        "bloom_cols": [],
    }
    assert V.VersionedTable(spark, t).detail()["version"] == d["version"]


def test_compaction_policy_job(spark, tmp_path):
    """The auto-compaction maintenance policy: many tiny appends trip
    the small-file threshold, ONE size-aware compact runs, content is
    untouched, the big-file archive is never rewritten, and the policy
    converges (its own optimize tick finds nothing small)."""
    import os

    t = str(tmp_path / "tbl")
    # one "archive" file big enough to stay above the small threshold
    V.commit(
        spark.range(0, 20000).selectExpr(
            "id", "repeat(uuid(), 8) AS pad"
        ).coalesce(1),
        t,
    )
    big = V.detail(t)["n_files"]
    assert big == 1
    for k in range(10):  # tiny appends
        V.commit(
            spark.range(100000 + k, 100001 + k).selectExpr(
                "id", "'x' AS pad"
            ).coalesce(1),
            t,
            mode="append",
        )
    tbl = V.VersionedTable(spark, t)
    before_rows = V.read_version(spark, t).count()
    archive = {
        f
        for f in V._snapshot(t, 1, with_stats=False)["files"]
    }
    ck = str(tmp_path / "ck")
    q = (
        tbl.compaction_policy_writer(
            ck, small_file_bytes=1 << 20, min_small_files=8
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    d = V.detail(t)
    assert d["n_files"] == 2  # archive + one compacted file
    head_files = set(
        V._snapshot(t, V._list_versions(t)[-1], with_stats=False)["files"]
    )
    assert archive <= head_files  # the big file was never rewritten
    assert V.read_version(spark, t).count() == before_rows
    head = V._list_versions(t)[-1]
    # converged: a second availableNow pass compacts nothing
    q = (
        tbl.compaction_policy_writer(
            str(tmp_path / "ck2"), small_file_bytes=1 << 20, min_small_files=8
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert V._list_versions(t)[-1] == head
