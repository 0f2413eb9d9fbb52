"""Connected components / duplicate-cluster formation (round 7)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.operators.graph import (
    connected_components,
    duplicate_clusters,
)


def _union_find(n_edges):
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in n_edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


@pytest.mark.parametrize("seed", [7, 99])
def test_cc_matches_union_find_on_random_graph(spark, seed):
    rng = random.Random(seed)
    verts = list(range(0, 600, 3))  # sparse ids (not 0..n)
    edges = [
        (rng.choice(verts), rng.choice(verts)) for _ in range(250)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    exp = _union_find(edges)
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r["id"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == exp


def test_cc_long_path_converges_fast(spark):
    """A 200-vertex path has diameter 199 — pointer jumping must close
    it well inside 25 rounds (hop-only would need ~200)."""
    edges = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = connected_components(df).collect()
    assert len(got) == 201
    assert {r["component"] for r in got} == {0}


def test_duplicate_clusters_shape(spark):
    pairs = spark.createDataFrame(
        [(10, 20), (20, 30), (50, 60)], "id_a bigint, id_b bigint"
    )
    rows = {r["doc_id"]: r for r in duplicate_clusters(pairs).collect()}
    assert rows[10]["cluster_id"] == 10 and rows[10]["is_canonical"]
    assert rows[30]["cluster_id"] == 10 and not rows[30]["is_canonical"]
    assert rows[30]["cluster_size"] == 3
    assert rows[60]["cluster_id"] == 50 and rows[60]["cluster_size"] == 2
