"""Scheduled DQ validation policy (round 9): the reference's Airflow
data-quality DAG (airflow/dags/data_quality_dags.py:28-75) rebuilt as
an incremental commit-tick job — CDF-scoped validation, versioned
result history with txn exactly-once, DLQ routing."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.functions import quality as QX
from open_source_financial_time_series_data_pipeline_architecture_spark.sources import versioned as V

T0 = 1_700_000_000


def _rows(spark, lo, hi, bad_price_every=0):
    df = spark.range(lo, hi).select(
        F.timestamp_seconds(F.lit(T0) + F.col("id") * 60).alias("ts"),
        (F.col("id") % 3).cast("string").alias("sym"),
        F.when(
            (F.lit(bad_price_every) > 0)
            & (F.col("id") % F.lit(max(bad_price_every, 1)) == 0),
            F.lit(-1.0),
        )
        .otherwise(F.col("id") * 1.5 + 1.0)
        .alias("px"),
        F.col("id").cast("string").alias("tid"),
    )
    return df


def _suite():
    return [
        QX.expect_not_null("sym"),
        QX.expect_between("px", 0.0, 1e9),
        QX.expect_unique(["tid"]),
    ]


def _run(writer, ck):
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()


def test_dq_policy_incremental_and_exactly_once(spark, tmp_path):
    base = str(tmp_path / "base")
    results = str(tmp_path / "results")
    dlq = str(tmp_path / "dlq")
    ck = str(tmp_path / "ck")
    V.commit(_rows(spark, 0, 50), base)
    tbl = V.VersionedTable(spark, base)
    writer = tbl.dq_policy_writer(
        ck, expectations=_suite(), results_dir=results, dlq_dir=dlq
    )
    _run(writer, ck)
    res = V.read_version(spark, results)
    got = {r["expectation"]: r for r in res.collect()}
    assert set(got) == {"not_null_sym", "between_px", "unique_tid"}
    assert all(r["n_violations"] == 0 and r["passed"] for r in got.values())
    assert got["between_px"]["from_version"] == 1
    assert got["between_px"]["to_version"] == V._list_versions(base)[-1]
    assert not os.path.isdir(dlq)  # nothing violated → no DLQ writes

    # a dirty append: only the NEW rows are validated; violations
    # counted and routed to the DLQ with their expectation tags
    V.commit(_rows(spark, 50, 80, bad_price_every=10), base, mode="append")
    head = V._list_versions(base)[-1]
    _run(
        tbl.dq_policy_writer(
            ck, expectations=_suite(), results_dir=results, dlq_dir=dlq
        ),
        ck,
    )
    res2 = V.read_version(spark, results).filter(
        F.col("to_version") == head
    )
    got2 = {r["expectation"]: r for r in res2.collect()}
    assert got2["between_px"]["n_violations"] == 3  # ids 50..79 % 10
    assert not got2["between_px"]["passed"]
    assert got2["not_null_sym"]["n_violations"] == 0
    dlq_rows = spark.read.parquet(dlq)
    assert dlq_rows.count() == 3
    assert set(
        dlq_rows.select(F.explode("__violated")).toPandas().iloc[:, 0]
    ) == {"between_px"}

    # exactly-once: a replayed tick at the same head is a no-op
    rv_head = V._list_versions(results)[-1]
    _run(
        tbl.dq_policy_writer(
            str(tmp_path / "ck2"),
            expectations=_suite(),
            results_dir=results,
            dlq_dir=dlq,
        ),
        ck,
    )
    assert V._list_versions(results)[-1] == rv_head


def test_dq_policy_validates_only_inserts(spark, tmp_path):
    """A delete-only commit advances the cursor with zero checked
    violations (its CDF rows are deletes, not inserts)."""
    base = str(tmp_path / "base")
    results = str(tmp_path / "results")
    V.commit(_rows(spark, 0, 40).repartitionByRange(4, "ts"), base)
    tbl = V.VersionedTable(spark, base)
    _run(
        tbl.dq_policy_writer(
            str(tmp_path / "ck"),
            expectations=_suite(),
            results_dir=results,
        ),
        None,
    )
    V.delete_where(spark, base, [("sym", "=", "1")])
    head = V._list_versions(base)[-1]
    _run(
        tbl.dq_policy_writer(
            str(tmp_path / "ckb"),
            expectations=_suite(),
            results_dir=results,
        ),
        None,
    )
    res = V.read_version(spark, results).filter(
        F.col("to_version") == head
    )
    rows = res.collect()
    assert rows and all(r["n_violations"] == 0 for r in rows)
    assert V.last_txn_version(results, f"dq:{os.path.basename(base)}") == head
