"""Physical-plan introspection: make scale properties testable.

"Would this plan survive a 100× scale-up?" is a property of the
physical plan, not the output — these helpers turn the key properties
(filter pushdown to parquet, broadcast vs shuffle joins, shuffle
count, no accidental cartesian products) into assertions that run in CI
(tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def assert_pushed_filter(df: DataFrame, column: str) -> None:
    """The filter on `column` must reach the parquet scan
    (PushedFilters), not run post-scan only."""
    plan = physical_plan(df)
    pushed = [
        line for line in plan.splitlines() if "PushedFilters" in line and column in line
    ]
    assert pushed, f"no pushed filter on {column}:\n{plan}"


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    plan = physical_plan(df)
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert n >= at_least, f"expected ≥{at_least} broadcast joins:\n{plan}"


def assert_no_cartesian(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, f"cartesian product in plan:\n{plan}"


def shuffle_count(df: DataFrame) -> int:
    """Number of exchanges (shuffles) in the physical plan — the metric
    to minimize; every one is a full network/disk round of the data."""
    plan = physical_plan(df)
    return sum(
        line.strip().lstrip("+-* ").startswith("Exchange")
        for line in plan.splitlines()
    )
