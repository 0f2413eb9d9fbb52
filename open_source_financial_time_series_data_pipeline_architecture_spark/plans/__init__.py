from .explain import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_no_unpartitioned_window,
    assert_pushed_filter,
    optimized_plan,
    plan_hazards,
    physical_plan,
    runtime_metrics,
    shuffle_count,
    unpartitioned_window_count,
)

__all__ = [
    "assert_broadcast_join",
    "assert_no_cartesian",
    "assert_no_unpartitioned_window",
    "assert_pushed_filter",
    "optimized_plan",
    "plan_hazards",
    "physical_plan",
    "runtime_metrics",
    "shuffle_count",
    "unpartitioned_window_count",
]
