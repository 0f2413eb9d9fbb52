"""Advanced MERGE clauses (Delta's full surface): conditional matched
actions, partial UPDATE SET, and whenNotMatchedBySource — the
dimension-sync primitive (reference spark/batch_feature_calculation.py
:61-65 is the Delta MERGE call site these extend)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.sources import versioned as V


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumn("v", F.col("id") * 10)


def _table(spark, tmp_path) -> str:
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10).coalesce(1), t)
    return t


def test_partial_update_set_exprs(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = _df(spark, 0, 5).withColumn("w", F.lit(1).cast("long"))
    V.commit(df.coalesce(1), t)
    src = (
        _df(spark, 2, 4)
        .withColumn("v", F.lit(-1).cast("long"))
        .withColumn("w", F.lit(99).cast("long"))
    )
    # SET only v (from the source); w must keep its TARGET value
    V.merge(spark, t, src, keys=["id"], set_exprs={"v": F.col("src_v")})
    got = {r["id"]: (r["v"], r["w"]) for r in V.read_version(spark, t).collect()}
    assert got[2] == (-1, 1) and got[3] == (-1, 1)
    assert got[0] == (0, 1) and got[4] == (40, 1)
    # SET can mix target and source columns in one expression
    V.merge(
        spark,
        t,
        src,
        keys=["id"],
        set_exprs={"w": F.col("w") + F.col("src_w")},
    )
    got = {r["id"]: r["w"] for r in V.read_version(spark, t).collect()}
    assert got[2] == 100 and got[0] == 1


def test_matched_condition_scopes_the_update(spark, tmp_path):
    t = _table(spark, tmp_path)
    src = _df(spark, 0, 10).withColumn("v", F.lit(-1).cast("long"))
    # only rows whose CURRENT v exceeds 50 update; NULL/false keep
    V.merge(
        spark, t, src, keys=["id"], when_matched_condition="v > 50"
    )
    got = {r["id"]: r["v"] for r in V.read_version(spark, t).collect()}
    assert all(got[i] == i * 10 for i in range(6))  # 0..50 untouched
    assert all(got[i] == -1 for i in range(6, 10))


def test_matched_condition_with_delete(spark, tmp_path):
    t = _table(spark, tmp_path)
    src = _df(spark, 0, 10)
    V.merge(
        spark,
        t,
        src,
        keys=["id"],
        when_matched="delete",
        when_matched_condition="src_v >= 70",
        when_not_matched="ignore",
    )
    got = {r["id"] for r in V.read_version(spark, t).collect()}
    assert got == set(range(7))


def test_not_matched_by_source_delete(spark, tmp_path):
    t = _table(spark, tmp_path)
    src = _df(spark, 3, 6)  # keys 3..5 survive + update
    rep: dict = {}
    V.merge(
        spark,
        t,
        src,
        keys=["id"],
        when_not_matched_by_source="delete",
        report=rep,
    )
    # whole-table semantics: pruning is off for this run
    assert rep["files_rewritten"] == rep["files_total"]
    got = {r["id"] for r in V.read_version(spark, t).collect()}
    assert got == {3, 4, 5}


def test_not_matched_by_source_delete_with_condition(spark, tmp_path):
    t = _table(spark, tmp_path)
    src = _df(spark, 3, 6)
    # only unmatched rows with v < 20 die; others stay
    V.merge(
        spark,
        t,
        src,
        keys=["id"],
        when_not_matched_by_source="delete",
        when_not_matched_by_source_condition="v < 20",
    )
    got = {r["id"] for r in V.read_version(spark, t).collect()}
    # 0,1 deleted (v<20); 2 unmatched but v=20 fails the condition
    assert got == {2, 3, 4, 5} | set(range(6, 10))


def test_by_source_delete_with_matched_ignore(spark, tmp_path):
    t = _table(spark, tmp_path)
    src = _df(spark, 3, 6).withColumn("v", F.lit(-1).cast("long"))
    V.merge(
        spark,
        t,
        src,
        keys=["id"],
        when_matched="ignore",
        when_not_matched="ignore",
        when_not_matched_by_source="delete",
    )
    got = {r["id"]: r["v"] for r in V.read_version(spark, t).collect()}
    # matched rows KEPT with their original values; unmatched deleted
    assert got == {3: 30, 4: 40, 5: 50}


def test_by_source_delete_with_empty_source_clears(spark, tmp_path):
    t = _table(spark, tmp_path)
    src = _df(spark, 0, 0)
    V.merge(
        spark,
        t,
        src,
        keys=["id"],
        when_not_matched_by_source="delete",
    )
    assert V.read_version(spark, t).count() == 0


def test_advanced_path_preserves_target_multiplicity(spark, tmp_path):
    t = str(tmp_path / "tbl")
    dup = _df(spark, 0, 3).unionByName(_df(spark, 2, 3))  # id=2 twice
    V.commit(dup.coalesce(1), t)
    src = _df(spark, 2, 3).withColumn("v", F.lit(-1).cast("long"))
    V.merge(spark, t, src, keys=["id"], set_exprs={"v": F.col("src_v")})
    rows = [r["v"] for r in V.read_version(spark, t).filter("id = 2").collect()]
    assert rows == [-1, -1]  # both duplicates updated in place


def test_validation_errors(spark, tmp_path):
    t = _table(spark, tmp_path)
    src = _df(spark, 0, 1)
    with pytest.raises(ValueError, match="set_exprs requires"):
        V.merge(spark, t, src, keys=["id"], when_matched="delete",
                set_exprs={"v": F.lit(0)})
    with pytest.raises(ValueError, match="non-key"):
        V.merge(spark, t, src, keys=["id"], set_exprs={"id": F.lit(0)})
    with pytest.raises(ValueError, match="meaningless"):
        V.merge(spark, t, src, keys=["id"], when_matched="ignore",
                when_matched_condition="v > 0")
    with pytest.raises(ValueError, match="when_not_matched_by_source"):
        V.merge(spark, t, src, keys=["id"],
                when_not_matched_by_source="update")


def test_advanced_merge_composes_with_colmap_and_dv(spark, tmp_path):
    t = _table(spark, tmp_path)
    V.rename_column(t, "v", "value")
    V.delete_where(spark, t, [("id", "=", 9)], merge_on_read=True)
    src = (
        spark.range(3, 6)
        .withColumn("value", F.lit(-1).cast("long"))
    )
    V.merge(
        spark,
        t,
        src,
        keys=["id"],
        set_exprs={"value": F.col("src_value")},
        when_not_matched_by_source="delete",
        when_not_matched_by_source_condition="value < 20",
    )
    got = {r["id"]: r["value"] for r in V.read_version(spark, t).collect()}
    # 0,1 deleted by-source; 9 was already dv-deleted (not resurrected)
    assert got == {2: 20, 3: -1, 4: -1, 5: -1, 6: 60, 7: 70, 8: 80}


# ---------------------------------------------------------------------------
# MERGE schema evolution (Delta's spark.databricks.delta.schema.autoMerge)


def test_merge_schema_evolution_adds_columns(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10).coalesce(1), t)
    src = _df(spark, 5, 15).withColumn("tag", F.lit("new").cast("string"))
    # without the flag: rejected, message points at it
    with pytest.raises(V.SchemaMismatchError, match="allow_evolution"):
        V.merge(spark, t, src, keys=["id"])
    V.merge(spark, t, src, keys=["id"], allow_evolution=True)
    got = {r["id"]: r["tag"] for r in V.read_version(spark, t).collect()}
    assert len(got) == 15
    assert all(got[i] == "new" for i in range(5, 15))  # updated+inserted
    assert all(got[i] is None for i in range(5))  # kept rows read NULL
    # historical version still reads under ITS schema (no tag column)
    assert "tag" not in V.read_version(spark, t, version=1).columns
    # later appends must now carry (or evolve into) the new schema
    nxt = _df(spark, 20, 22).withColumn("tag", F.lit(None).cast("string"))
    V.commit(nxt.coalesce(1), t, mode="append")
    assert V.read_version(spark, t).count() == 17


def test_merge_evolution_rejects_type_change_and_missing_cols(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 5).coalesce(1), t)
    # a type drift on an EXISTING column is never evolution
    bad = spark.range(0, 2).select(
        F.col("id"), F.col("id").cast("string").alias("v")
    )
    with pytest.raises(V.SchemaMismatchError):
        V.merge(spark, t, bad, keys=["id"], allow_evolution=True)
    # dropping a table column from the source is never evolution
    with pytest.raises(V.SchemaMismatchError):
        V.merge(
            spark,
            t,
            spark.range(0, 2).select("id"),
            keys=["id"],
            allow_evolution=True,
        )


def test_merge_evolution_with_column_mapping_and_cdf(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 6).coalesce(1), t)
    V.rename_column(t, "v", "value")
    src = (
        _df(spark, 3, 8)
        .withColumnRenamed("v", "value")
        .withColumn("extra", (F.col("id") * 100).cast("long"))
    )
    V.merge(spark, t, src, keys=["id"], allow_evolution=True)
    m = V._snapshot(t, V._list_versions(t)[-1], with_stats=False)
    # the new column got a MINTED physical name on the mapped table
    assert m["colmap"]["extra"].startswith("col_")
    got = {r["id"]: (r["value"], r["extra"]) for r in V.read_version(spark, t).collect()}
    assert len(got) == 8 and got[7] == (70, 700) and got[0] == (0, None)
    # the change feed reads every step under the END schema
    ch = V.read_changes(spark, t, 0)
    assert "extra" in ch.columns
    ins = {
        r["id"]
        for r in ch.collect()
        if r["_change_type"] == "insert" and r["extra"] is not None
    }
    assert ins == {3, 4, 5, 6, 7}
