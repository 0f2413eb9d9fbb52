"""CHECK constraints on the versioned table (Delta's ALTER TABLE ADD
CONSTRAINT): validated on add against the whole snapshot, enforced on
every later commit / merge / update, NULL passes (SQL CHECK), dropped
via metadata-only commits the change feed and streaming tail ignore."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.sources import versioned as V


def _df(spark, lo, hi):
    # v nullable so NULL-constraint tests can append without evolution
    return spark.range(lo, hi).withColumn(
        "v", F.when(F.col("id") >= 0, F.col("id") * 10.0)
    )


def test_add_validates_current_snapshot(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10), t)
    m = V.add_constraint(spark, t, "v_nonneg", "v >= 0")
    assert m["mode"] == "metadata" and m["constraints"] == {"v_nonneg": "v >= 0"}
    with pytest.raises(V.ConstraintViolationError):
        V.add_constraint(spark, t, "v_small", "v < 50")  # 9 rows violate


def test_commits_enforce_and_carry(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10), t)
    V.add_constraint(spark, t, "v_nonneg", "v >= 0")
    bad = spark.range(99, 100).withColumn(
        "v", F.when(F.col("id") >= 0, F.lit(-1.0))
    )
    with pytest.raises(V.ConstraintViolationError, match="v_nonneg"):
        V.commit(bad, t, mode="append")
    m = V.commit(_df(spark, 10, 15), t, mode="append")
    assert m["constraints"] == {"v_nonneg": "v >= 0"}  # carried forward
    assert V.read_version(spark, t).count() == 15
    # NULL passes (SQL CHECK unknown)
    nulls = spark.range(100, 101).withColumn(
        "v", F.when(F.col("id") < 0, F.lit(0.0))
    )
    V.commit(nulls, t, mode="append")
    assert V.read_version(spark, t).count() == 16


def test_merge_and_update_enforce(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10), t)
    V.add_constraint(spark, t, "v_nonneg", "v >= 0")
    bad = spark.createDataFrame([(3, -30.0)], "id long, v double")
    with pytest.raises(V.ConstraintViolationError):
        V.merge(spark, t, bad, keys=["id"])
    with pytest.raises(V.ConstraintViolationError):
        V.update_where(spark, t, [("id", "=", 3)], {"v": F.lit(-1.0)})
    ok = spark.createDataFrame([(3, 30.5)], "id long, v double")
    m = V.merge(spark, t, ok, keys=["id"])
    assert m["constraints"] == {"v_nonneg": "v >= 0"}
    # deletes cannot violate
    V.delete_where(spark, t, [("id", "=", 0)])
    assert V.read_version(spark, t).count() == 9


def test_drop_constraint_and_feed_skips_metadata(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 5), t)
    V.add_constraint(spark, t, "v_nonneg", "v >= 0")
    V.drop_constraint(t, "v_nonneg")
    neg = spark.range(9, 10).withColumn(
        "v", F.when(F.col("id") >= 0, F.lit(-1.0))
    )
    V.commit(neg, t, mode="append")  # no longer enforced
    ch = V.read_changes(spark, t, 1)  # metadata commits emit nothing
    rows = {(r["_change_type"], r["id"]) for r in ch.collect()}
    assert rows == {("insert", 9)}
    modes = [h["mode"] for h in V.history(t)]
    assert modes == ["overwrite", "metadata", "metadata", "append"]
