"""Hot-block cap for blocked record linkage (operators/linkage.py).

VERDICT r3 item 3: blocking on (nation, segment) had no block-size
cap — a skewed block reintroduces quadratic pairs. These tests pin the
sorted-neighborhood cap: bounded candidates on a skewed fixture, exact
all-pairs semantics below the cap, and pair-orientation invariants.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as em
from open_source_financial_time_series_data_pipeline_architecture_spark.operators.linkage import (
    blocked_pair_candidates,
)
from tests.conftest import SF_SMOKE


def _fixture(spark, hot_n=120, small_n=10):
    # one hot block (block=0) with hot_n rows, one small block (block=1)
    rows = [(i, f"name{i:05d}", 0) for i in range(hot_n)] + [
        (1000 + i, f"other{i:03d}", 1) for i in range(small_n)
    ]
    return spark.createDataFrame(rows, "id long, name string, block int")


def test_hot_block_candidates_bounded(spark):
    hot_n, w, cap = 120, 4, 16
    df = _fixture(spark, hot_n=hot_n, small_n=10)
    pairs = blocked_pair_candidates(
        df, ["block"], "id", "name", max_block_size=cap, neighborhood=w
    )
    got = pairs.groupBy("a_block").count().collect()
    by_block = {r["a_block"]: r["count"] for r in got}
    # hot block: n·w minus the tail rows with fewer than w successors
    assert by_block[0] == hot_n * w - w * (w + 1) // 2
    assert by_block[0] < hot_n * (hot_n - 1) // 2  # strictly sub-quadratic
    # small block below the cap keeps exact all-pairs
    assert by_block[1] == 10 * 9 // 2


def test_below_cap_equals_uncapped(spark):
    df = _fixture(spark, hot_n=30, small_n=10)
    capped = blocked_pair_candidates(
        df, ["block"], "id", "name", max_block_size=64, neighborhood=4
    )
    uncapped = blocked_pair_candidates(df, ["block"], "id", "name")
    a = {tuple(r) for r in capped.collect()}
    b = {tuple(r) for r in uncapped.collect()}
    assert a == b


def test_pair_orientation_and_uniqueness(spark):
    df = _fixture(spark, hot_n=50, small_n=5)
    pairs = blocked_pair_candidates(
        df, ["block"], "id", "name", max_block_size=16, neighborhood=6
    ).collect()
    seen = set()
    for r in pairs:
        assert r["a_id"] < r["b_id"]
        assert r["a_block"] == r["b_block"]
        key = (r["a_id"], r["b_id"])
        assert key not in seen, f"duplicate pair {key}"
        seen.add(key)


def test_neighborhood_keeps_lexicographic_neighbors(spark):
    # rows with adjacent names in a hot block must stay paired — the
    # property that preserves small-edit-distance recall under the cap
    df = _fixture(spark, hot_n=100, small_n=0)
    pairs = blocked_pair_candidates(
        df, ["block"], "id", "name", max_block_size=16, neighborhood=3
    )
    adj = pairs.filter(F.col("b_id") - F.col("a_id") == 1).count()
    assert adj == 99  # every consecutive (name-sorted) pair survives


def test_entity_match_query_unchanged_shape(spark):
    df = em.QUERIES["entity_match_candidates"](spark, SF_SMOKE)
    rows = df.collect()
    assert all(r["custkey_a"] < r["custkey_b"] for r in rows)
    assert all(r["edit_dist"] <= 2 for r in rows)
