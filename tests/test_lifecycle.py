"""Storage lifecycle tiering (S15 analog — reference
src/cost/s3_lifecycle.py): policy document shape + age-audit tiers."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.sources.lifecycle import (
    DEFAULT_TIERS,
    lifecycle_policy,
    partition_age_audit,
)


def test_policy_document_shape():
    pol = lifecycle_policy(prefixes=("feature-store/", "raw/"))
    rules = pol["Rules"]
    # per prefix: 2 transitions (IT, glacier) + 1 expiration
    assert len(rules) == 6
    assert all(r["Status"] == "Enabled" for r in rules)
    by_prefix = {}
    for r in rules:
        by_prefix.setdefault(r["Filter"]["Prefix"], []).append(r)
    assert set(by_prefix) == {"feature-store/", "raw/"}
    for prefix, rs in by_prefix.items():
        trans = [t for r in rs for t in r.get("Transitions", [])]
        assert {(t["Days"], t["StorageClass"]) for t in trans} == {
            (30, "INTELLIGENT_TIERING"),
            (90, "GLACIER"),
        }
        exp = [r["Expiration"]["Days"] for r in rs if "Expiration" in r]
        assert exp == [730]


def test_partition_age_audit_tiers(spark):
    base = dt.datetime(2024, 6, 1, 12, 0, 0)
    # ages relative to the max day (2024-06-01): 0, 45, 120, 800 days
    rows = []
    for age, n in ((0, 4), (45, 3), (120, 2), (800, 1)):
        day = base - dt.timedelta(days=age)
        rows += [(i, day, i, "et", 1.0, "p" * 10) for i in range(n)]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {r["tier"]: r for r in partition_age_audit(df, "ts").collect()}
    assert set(out) == {"standard", "intelligent_tiering", "glacier", "expired"}
    assert out["standard"]["n_rows"] == 4
    assert out["intelligent_tiering"]["n_rows"] == 3
    assert out["glacier"]["n_rows"] == 2
    assert out["expired"]["n_rows"] == 1
    # row estimate: 8*3 fixed (event_id, user_id, value) + 8 (ts)
    # + 2 (event_type 'et') + 10 (props) = 44 bytes
    gb = 4 * 44 / 1024.0**3
    assert abs(out["standard"]["est_gb"] - round(gb, 6)) < 1e-12
    # glacier is ~6x cheaper per GB than standard at equal size
    assert out["expired"]["monthly_cost"] == 0.0
    rates = dict((t, r) for t, _a, r in DEFAULT_TIERS)
    assert rates["glacier"] < rates["standard"]


def test_assign_tier_boundaries(spark):
    from open_source_financial_time_series_data_pipeline_architecture_spark.sources.lifecycle import (
        assign_tier,
    )

    df = spark.createDataFrame(
        [(0,), (29,), (30,), (89,), (90,), (729,), (730,)], "age int"
    )
    got = {
        r["age"]: r["tier"]
        for r in df.select(
            "age", assign_tier(F.col("age")).alias("tier")
        ).collect()
    }
    assert got == {
        0: "standard",
        29: "standard",
        30: "intelligent_tiering",
        89: "intelligent_tiering",
        90: "glacier",
        729: "glacier",
        730: "expired",
    }


def test_validate_scaling_request_limits():
    from open_source_financial_time_series_data_pipeline_architecture_spark.sources.lifecycle import (
        validate_scaling_request,
    )

    assert validate_scaling_request("spark_executors", 2)
    assert validate_scaling_request("spark_executors", 20)
    assert not validate_scaling_request("spark_executors", 21)
    assert validate_scaling_request("gpu_instances", 0)
    assert not validate_scaling_request("gpu_instances", 5)
    assert not validate_scaling_request("unknown_resource", 1)


def test_budget_enforcement_flips_on_budget(spark):
    """Same data, two budgets: the generous budget yields no actions
    and violated=0; the tight one emits the reference's three
    enforcement actions (cost_budget.py:77-92)."""
    import datetime

    from open_source_financial_time_series_data_pipeline_architecture_spark.sources.lifecycle import (
        budget_enforcement,
    )

    rows = [
        (datetime.datetime(2024, 1, 1 + d), f"ev{d}", "p" * 10)
        for d in range(10)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, props string")
    # 10-day span → mtd = rate/30*10; fixed total 3340/3 ≈ 1113
    ok = {r["item"]: r for r in budget_enforcement(df, monthly_budget=2000.0).collect()}
    assert ok["violated"]["amount"] == 0.0
    assert not [i for i in ok.values() if i["kind"] == "action"]
    assert abs(ok["timescaledb"]["amount"] - 500.0 / 3) < 1e-6
    tight = {r["item"]: r for r in budget_enforcement(df, monthly_budget=1000.0).collect()}
    assert tight["violated"]["amount"] == 1.0
    acts = {i for i, r in tight.items() if r["kind"] == "action"}
    assert acts == {
        "scale_down_spark", "scale_down_gpu", "enable_s3_lifecycle"
    }
    assert tight["enable_s3_lifecycle"]["detail"] == "glacier"
    assert tight["utilization_percent"]["amount"] > 100.0
