"""SemDeDup semantic-dedup operator: correctness + plan-shape pins.

Rows-only driver query (`semdedup_prune`) — the iterative k-means
codebook is not expressible as one DuckDB statement — so the hard
guarantees live here:
- exact duplicates (and near-identical vectors) are pruned down to the
  min-id representative;
- dissimilar vectors are never pruned;
- the pair comparison is an equi-join on cluster_id (no
  BroadcastNestedLoopJoin anywhere in the plan).
"""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from open_source_financial_time_series_data_pipeline_architecture_spark.operators import (
    similarity as SIM,
)
from tests.conftest import SF_SMOKE


def _mkvec(base: list[float], eps: float = 0.0) -> list[float]:
    return [x + eps for x in base]


def test_semdedup_prunes_duplicates_keeps_min_id(spark):
    a = [1.0, 0.0, 0.0, 0.0]
    b = [0.0, 1.0, 0.0, 0.0]
    c = [0.0, 0.0, 1.0, 0.0]
    rows = [
        (10, a),
        (11, _mkvec(a, 1e-9)),  # dup of 10 → pruned
        (12, b),
        (13, c),
        (14, _mkvec(c, 1e-9)),  # dup of 13 → pruned
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = SIM.semdedup(emb, k=3, iters=2, threshold=0.999)
    got = {r["id"]: r["is_kept"] for r in out.collect()}
    assert got[10] is True
    assert got[11] is False
    assert got[12] is True
    assert got[13] is True
    assert got[14] is False


def test_semdedup_orthogonal_vectors_all_kept(spark):
    rows = [
        (i, [1.0 if j == i else 0.0 for j in range(6)]) for i in range(6)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = SIM.semdedup(emb, k=2, iters=2, threshold=0.95)
    assert all(r["is_kept"] for r in out.collect())


def test_semdedup_no_nested_loop_join(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    out = SIM.semdedup(emb, k=4, iters=1, threshold=0.95)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the quadratic comparison is one Arrow-batched gram matmul per
    # cluster group — never a pair join
    assert "FlatMapGroupsInPandas" in plan
    # any nested-loop join in the plan is the k-row broadcast-codebook
    # assignment cross (O(N·k) by construction), never a pair join
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "Cross" in line, line


def test_semdedup_prune_query_runs(spark):
    df = entry_mod.queries()["semdedup_prune"](spark, SF_SMOKE)
    rows = df.collect()
    assert rows, "semdedup_prune returned no clusters"
    for r in rows:
        assert 0 < r["n_kept"] <= r["n_vecs"]
        assert 0.0 < r["keep_rate"] <= 1.0
