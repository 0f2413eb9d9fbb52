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
    """Number of exchanges (shuffles) the plan EXECUTES — the metric to
    minimize; every one is a full network/disk round of the data.

    Exchanges nested inside an `InMemoryRelation` subtree are the
    cached fragment's ORIGINAL plan, re-printed for provenance; a cache
    hit replays none of them, so they don't count. (They still run
    exactly once at materialization — that cost is the cache's, not
    this query's.)"""
    plan = physical_plan(df)
    count = 0
    skip_deeper_than: int | None = None
    for line in plan.splitlines():
        body = line.lstrip(" :+-*")
        indent = len(line) - len(body)
        if skip_deeper_than is not None:
            if indent > skip_deeper_than:
                continue
            skip_deeper_than = None
        if body.startswith("InMemoryRelation"):
            skip_deeper_than = indent
            continue
        if body.startswith("Exchange"):
            count += 1
    return count


def unpartitioned_window_count(df: DataFrame) -> int:
    """Number of logical Window operators with an EMPTY partition spec.

    An unpartitioned window moves every row into a single partition
    (Spark's own `WindowExec: No Partition Defined` warning) — the
    shape that does not survive a 100× scale-up unless its input is
    provably bounded. Production-default queries assert this is 0; the
    exact-total-order forms live on as `*_exact_witness` queries."""
    count = 0
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        node = stack.pop()
        if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
            count += 1
        kids = node.children()
        for i in range(kids.size()):
            stack.append(kids.apply(i))
    return count


def assert_no_unpartitioned_window(df: DataFrame, name: str = "?") -> None:
    n = unpartitioned_window_count(df)
    assert n == 0, (
        f"{name}: {n} unpartitioned Window operator(s) over an unbounded "
        f"input — single-partition total order; use the percentile-"
        f"threshold / pre-aggregated form:\n{optimized_plan(df)}"
    )


def plan_hazards(df: DataFrame) -> dict:
    """Count the plan shapes that do NOT survive a 100× scale-up:

    - ``cartesian``: CartesianProduct — O(N·M) pairs, never acceptable;
    - ``python_row_udf``: BatchEvalPython — a row-at-a-time Python UDF
      in the hot path (Arrow-batched pandas UDFs show as
      ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas and are
      the sanctioned Python escape hatch);
    - ``unpartitioned_windows``: single-partition total orders (see
      `unpartitioned_window_count`).

    BroadcastNestedLoopJoin is deliberately NOT counted: the broadcast
    1-row-aggregate pattern (the scale-safe replacement for
    ``Window.partitionBy(lit(1))``) plans as a BNLJ whose build side is
    one row — bounded by construction. The dangerous both-sides-scale
    BNLJ shows up as a CartesianProduct or is caught per-query by the
    targeted `assert_no_cartesian` / shuffle-shape tests."""
    phys = physical_plan(df)
    return {
        "cartesian": phys.count("CartesianProduct"),
        "python_row_udf": phys.count("BatchEvalPython"),
        "unpartitioned_windows": unpartitioned_window_count(df),
    }


def runtime_metrics(df: DataFrame) -> dict:
    """Execute the plan (noop write) and read back the ACTUAL runtime
    SQL metrics from the executed plan tree: rows scanned, shuffle
    bytes/records written, broadcast sizes. `.explain` shows the shape;
    this shows what the shape COST — the pair of numbers a 100 TB
    capacity plan is written from.

    Returns {"scan_rows", "shuffle_bytes", "shuffle_records",
    "broadcast_bytes", "exchanges"} aggregated over the whole tree.

    The action must run df's OWN QueryExecution (a `.write` builds a
    fresh one whose metrics this handle never sees), so this collects —
    use on query-sized results, not raw tables.
    """
    df.collect()
    out = {
        "scan_rows": 0,
        "shuffle_bytes": 0,
        "shuffle_records": 0,
        "broadcast_bytes": 0,
        "exchanges": 0,
    }

    def walk(node):
        name = node.nodeName()
        metrics = node.metrics()
        it = metrics.iterator()
        vals = {}
        while it.hasNext():
            kv = it.next()
            vals[kv._1()] = kv._2().value()
        if "Scan" in name:
            out["scan_rows"] += vals.get("numOutputRows", 0)
        # count the Exchange node itself, not its QueryStage wrapper
        # (both would match and double-count)
        if "Exchange" in name and "QueryStage" not in name and "Reused" not in name:
            out["exchanges"] += 1
            out["shuffle_bytes"] += vals.get("shuffle bytes written", 0) or vals.get(
                "shuffleBytesWritten", 0
            )
            out["shuffle_records"] += vals.get("shuffle records written", 0) or vals.get(
                "shuffleRecordsWritten", 0
            )
        if "Broadcast" in name and "Exchange" in name:
            out["broadcast_bytes"] += vals.get("dataSize", 0)
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))
        # AQE wrappers are leaves from children()'s point of view:
        # descend the materialized subtrees explicitly
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan())
        elif "QueryStage" in name:
            walk(node.plan())
        elif name == "ReusedExchange":
            pass  # metrics counted where the exchange actually ran

    plan = df._jdf.queryExecution().executedPlan()
    walk(plan)
    return out
