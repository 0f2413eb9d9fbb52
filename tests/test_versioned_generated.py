"""GENERATED COLUMNS on the versioned table (Delta's ``GENERATED
ALWAYS AS (expr)``): declared at creation, computed server-side when a
write omits them, VALIDATED when a write supplies them (stored as
reserved ``__gen__`` CHECK constraints, so every write path — append,
MERGE, DML, DV update — enforces them through the one constraint
gate). The scale payoff is generated-column file pruning: stats
envelopes cover the materialized column, so predicates on it skip
files even though the raw data only carries the source column."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.sources import versioned as V

T0 = 1_700_000_000


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.timestamp_seconds(F.lit(T0) + F.col("id") * 3600).alias("ts"),
        (F.col("id") * 1.5).alias("px"),
    )


GEN = {
    "ts_date": "CAST(ts AS DATE)",
    "notional": "px * 2",
}


def test_declare_compute_and_append_omitted(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10).coalesce(1), t, generated=GEN)
    got = V.read_version(spark, t)
    assert set(got.columns) == {"ts", "px", "ts_date", "notional"}
    rows = {r["px"]: r for r in got.collect()}
    r = rows[1.5]
    assert r["notional"] == 3.0
    assert r["ts_date"] == datetime.date(2023, 11, 14)
    # appends omitting the generated columns get them computed
    V.commit(_df(spark, 10, 15).coalesce(1), t, mode="append")
    out = V.read_version(spark, t)
    assert out.count() == 15
    assert out.filter(F.col("notional") != F.col("px") * 2).count() == 0
    assert out.filter(F.col("ts_date").isNull()).count() == 0
    # introspection
    assert V.VersionedTable(spark, t).generated_columns() == GEN


def test_supplied_values_validated(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 5).coalesce(1), t, generated=GEN)
    good = _df(spark, 5, 8).withColumn(
        "ts_date", F.col("ts").cast("date")
    ).withColumn("notional", F.col("px") * 2)
    V.commit(good.coalesce(1), t, mode="append")
    assert V.read_version(spark, t).count() == 8
    bad = good.withColumn("notional", F.lit(0.0))
    with pytest.raises(V.ConstraintViolationError):
        V.commit(bad.coalesce(1), t, mode="append")


def test_declared_on_append_rejected(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 5).coalesce(1), t)
    with pytest.raises(ValueError):
        V.commit(
            _df(spark, 5, 8).coalesce(1), t, mode="append", generated=GEN
        )


def test_generated_column_prunes_files(spark, tmp_path):
    """Delta's generated-column partition pruning, here via stats
    envelopes: day-clustered commits, a date predicate reads one
    file."""
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 24).coalesce(1), t, generated=GEN)  # day 1+2
    V.commit(_df(spark, 24, 48).coalesce(1), t, mode="append")
    V.commit(_df(spark, 48, 72).coalesce(1), t, mode="append")
    rep: dict = {}
    out = V.read_version(
        spark,
        t,
        predicates=[("ts_date", "=", datetime.date(2023, 11, 17))],
        prune_report=rep,
    )
    assert rep["files_kept"] < rep["files_total"]
    # hourly rows with ts_date = Nov 17: hours 50..71 (the data ends
    # at hour 71, before the day does)
    assert out.count() == 22


def test_dml_and_merge_enforce_generation(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10).coalesce(1), t, generated=GEN)
    # an UPDATE that breaks the generation invariant is rejected —
    # copy-on-write and merge-on-read alike
    with pytest.raises(V.ConstraintViolationError):
        V.update_where(spark, t, [("px", ">=", 0.0)], {"px": F.col("px") + 1})
    with pytest.raises(V.ConstraintViolationError):
        V.update_where(
            spark, t, [("px", ">=", 0.0)], {"px": F.col("px") + 1},
            merge_on_read=True,
        )
    # updating source AND generated together keeps the invariant
    V.update_where(
        spark,
        t,
        [("px", "=", 1.5)],
        {"px": F.lit(5.0), "notional": F.lit(10.0)},
        merge_on_read=True,
    )
    got = V.read_version(spark, t).filter(F.col("px") == 5.0).collect()
    assert len(got) == 1 and got[0]["notional"] == 10.0
    # a MERGE source must satisfy generation too
    src = _df(spark, 0, 1).withColumn(
        "ts_date", F.col("ts").cast("date")
    ).withColumn("notional", F.lit(-1.0))
    with pytest.raises(V.ConstraintViolationError):
        V.merge(spark, t, src, keys=["ts"])


def test_generation_survives_checkpoint_restore_clone(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 5).coalesce(1), t, generated=GEN)
    for k in range(10):  # roll a checkpoint
        V.commit(_df(spark, 5 + k, 6 + k).coalesce(1), t, mode="append")
    assert V._list_checkpoints(t)
    assert V.VersionedTable(spark, t).generated_columns() == GEN
    dst = str(tmp_path / "fork")
    V.clone(t, dst)
    assert V.VersionedTable(spark, dst).generated_columns() == GEN
    V.commit(_df(spark, 100, 102).coalesce(1), dst, mode="append")
    out = V.read_version(spark, dst)
    assert out.filter(F.col("notional").isNull()).count() == 0


def test_reserved_prefix_blocked_in_add_constraint(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 5).coalesce(1), t)
    with pytest.raises(ValueError):
        V.add_constraint(spark, t, "__gen__notional", "notional <=> (px)")
