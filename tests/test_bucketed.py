"""Bucketed tables: the join between two same-bucketed tables must have
NO shuffle exchange — the write-time-amortized layout for 100 TB joins."""

from __future__ import annotations

import pytest

from open_source_financial_time_series_data_pipeline_architecture_spark.sources import bucketed as BK
from open_source_financial_time_series_data_pipeline_architecture_spark.sources import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    ev = load_table(spark, SF, "events").select("user_id", "event_type", "value")
    users = (
        ev.groupBy("user_id").count().withColumnRenamed("count", "n_events")
    )
    BK.write_bucketed(ev, "ev_bkt", ["user_id"], n_buckets=4)
    BK.write_bucketed(users, "users_bkt", ["user_id"], n_buckets=4)
    yield "ev_bkt", "users_bkt"
    spark.sql("DROP TABLE IF EXISTS ev_bkt")
    spark.sql("DROP TABLE IF EXISTS users_bkt")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = BK.bucketed_join(spark, left, right, ["user_id"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_results_match_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    j = BK.bucketed_join(spark, left, right, ["user_id"])
    ev = load_table(spark, SF, "events").select("user_id", "event_type", "value")
    users = ev.groupBy("user_id").count().withColumnRenamed("count", "n_events")
    plain = ev.join(users, "user_id")
    assert j.count() == plain.count()
    assert (
        j.agg({"value": "sum"}).collect()[0][0]
        == pytest.approx(plain.agg({"value": "sum"}).collect()[0][0])
    )


def test_plain_join_does_shuffle(spark):
    """Control: the same join off unbucketed parquet shuffles both
    sides — proving the bucketed layout is what removed the exchange."""
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
