from .explain import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filter,
    optimized_plan,
    physical_plan,
    runtime_metrics,
    shuffle_count,
)

__all__ = [
    "assert_broadcast_join",
    "assert_no_cartesian",
    "assert_pushed_filter",
    "optimized_plan",
    "physical_plan",
    "runtime_metrics",
    "shuffle_count",
]
