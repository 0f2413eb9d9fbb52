"""Bucketed tables (sources/tables.py write_bucketed): result parity
and the shuffling control. The no-Exchange property itself is pinned in
tests/test_plans.py::test_bucketed_join_has_no_exchange; these tests
add (a) value equality between the bucketed join and the plain join,
and (b) the control showing the same join WITHOUT bucketing shuffles —
proving the layout, not a config, removed the exchange."""

from __future__ import annotations

import pytest

from open_source_financial_time_series_data_pipeline_architecture_spark.sources import load_table
from open_source_financial_time_series_data_pipeline_architecture_spark.sources.tables import (
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bkt")
    ev = load_table(spark, SF, "events").select("user_id", "event_type", "value")
    users = ev.groupBy("user_id").count().withColumnRenamed("count", "n_events")
    write_bucketed(ev, "ev_bkt", ["user_id"], 4, path=str(base / "ev"))
    write_bucketed(users, "users_bkt", ["user_id"], 4, path=str(base / "u"))
    yield "ev_bkt", "users_bkt"
    spark.sql("DROP TABLE IF EXISTS ev_bkt")
    spark.sql("DROP TABLE IF EXISTS users_bkt")


def test_bucketed_join_results_match_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    j = spark.table(left).join(spark.table(right), "user_id")
    ev = load_table(spark, SF, "events").select("user_id", "event_type", "value")
    users = ev.groupBy("user_id").count().withColumnRenamed("count", "n_events")
    plain = ev.join(users, "user_id")
    assert j.count() == plain.count()
    assert j.agg({"value": "sum"}).collect()[0][0] == pytest.approx(
        plain.agg({"value": "sum"}).collect()[0][0]
    )


def test_plain_join_does_shuffle(spark):
    """Control: the same join off unbucketed parquet shuffles — the
    bucketed layout is what removes the exchange."""
    ev = load_table(spark, SF, "events").select("user_id", "value")
    users = ev.groupBy("user_id").count()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            ev.join(users, "user_id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
