"""Property test for manifest data skipping: pruning is CONSERVATIVE —
no file containing a predicate-matching row is ever dropped, for any
data layout and any supported predicate. Pure Python (the prune logic
is manifest arithmetic, no Spark needed), so hypothesis can hammer it.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from open_source_financial_time_series_data_pipeline_architecture_spark.sources import versioned as V

_OPS = ["=", "<", "<=", ">", ">="]


def _matches(op: str, x, val) -> bool:
    if x is None:
        return False  # SQL comparison with NULL is never TRUE
    return {
        "=": x == val,
        "<": x < val,
        "<=": x <= val,
        ">": x > val,
        ">=": x >= val,
    }[op]


def _manifest_from_layout(layout: list[list[int | None]]) -> dict:
    """Build a manifest whose per-file stats mirror what the parquet
    footers would say for column 'c' holding these values."""
    files, stats = [], {}
    for i, rows in enumerate(layout):
        name = f"f{i}.parquet"
        files.append(name)
        vals = [v for v in rows if v is not None]
        nulls = len(rows) - len(vals)
        cols = {}
        if vals or nulls == len(rows):
            cols["c"] = {
                "min": min(vals) if vals else None,
                "max": max(vals) if vals else None,
                "nulls": nulls,
            }
        stats[name] = {"rows": len(rows), "cols": cols}
    return {"files": files, "stats": stats}


@settings(max_examples=300, deadline=None)
@given(
    layout=st.lists(
        st.lists(st.one_of(st.integers(-50, 50), st.none()), min_size=0, max_size=8),
        min_size=1,
        max_size=6,
    ),
    preds=st.lists(
        st.tuples(
            st.just("c"), st.sampled_from(_OPS), st.integers(-60, 60)
        ),
        min_size=1,
        max_size=3,
    ),
)
def test_prune_never_drops_a_matching_row(layout, preds):
    m = _manifest_from_layout(layout)
    kept, rep = V.prune_files(m, preds)
    assert rep["files_total"] == len(layout)
    assert set(kept) <= set(m["files"])
    for i, rows in enumerate(layout):
        has_match = any(
            all(_matches(op, x, val) for (_, op, val) in preds) for x in rows
        )
        if has_match:
            assert f"f{i}.parquet" in kept, (rows, preds, m["stats"])


@settings(max_examples=200, deadline=None)
@given(
    vals=st.lists(st.integers(-50, 50), min_size=1, max_size=12),
    members=st.lists(st.integers(-60, 60), min_size=1, max_size=4),
)
def test_prune_in_predicate_conservative(vals, members):
    m = _manifest_from_layout([[v] for v in vals])
    kept, _ = V.prune_files(m, [("c", "in", members)])
    for i, v in enumerate(vals):
        if v in members:
            assert f"f{i}.parquet" in kept


def test_missing_stats_and_unknown_column_keep_everything():
    m = _manifest_from_layout([[1, 2], [3, 4]])
    m["stats"]["f0.parquet"]["cols"].pop("c")
    kept, _ = V.prune_files(m, [("c", "=", 99)])
    assert kept == ["f0.parquet"]  # stat-less kept, provably-empty dropped
    kept2, _ = V.prune_files(m, [("other", "=", 1)])
    assert kept2 == m["files"]
