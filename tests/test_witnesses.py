"""Algebraic invariants of the round-3 oracle witnesses.

The witnesses' VALUES are pinned by the parity suite; these tests pin
the algebra that must hold regardless of data, so a future refactor
that keeps parity by accident (both sides wrong the same way) still
has to satisfy the mathematical contract.
"""

from __future__ import annotations

import __spark_entry__ as em
from pyspark.sql import functions as F
from tests.conftest import SF_SMOKE


def test_minhash_md5_estimate_bounds(spark):
    df = em.QUERIES["dedup_minhash_md5"](spark, SF_SMOKE)
    assert df.filter(
        (F.col("est_jaccard") < 0) | (F.col("est_jaccard") > 1)
    ).count() == 0
    assert df.filter(F.col("id_a") >= F.col("id_b")).count() == 0
    assert df.count() == df.select("id_a", "id_b").distinct().count()


def test_simhash_md5_hamming_bound(spark):
    df = em.QUERIES["dedup_simhash_md5"](spark, SF_SMOKE)
    assert df.filter(
        (F.col("hamming") < 0) | (F.col("hamming") > 3)
    ).count() == 0


def test_lsh_witness_subset_of_exact_topk(spark):
    # every LSH-bucketed result must score <= the exact top-1 cosine of
    # its query, and ranks must be 1..k dense per query
    lsh = em.QUERIES["ann_lsh_witness"](spark, SF_SMOKE)
    exact = em.QUERIES["ann_topk"](spark, SF_SMOKE)
    top1 = (
        exact.filter(F.col("rank") == 1)
        .select("query_id", F.col("cosine").alias("best"))
    )
    bad = (
        lsh.join(top1, "query_id")
        .filter(F.col("cosine") > F.col("best"))
        .count()
    )
    assert bad == 0
    per_q = lsh.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("rank").alias("mx")
    )
    assert per_q.filter(F.col("n") != F.col("mx")).count() == 0


def test_ivf_witness_rank_dense(spark):
    df = em.QUERIES["ann_ivf_witness"](spark, SF_SMOKE)
    per_q = df.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("rank").alias("mx")
    )
    assert per_q.filter(F.col("n") != F.col("mx")).count() == 0


def test_kmeans_assign_partitions_corpus(spark):
    from open_source_financial_time_series_data_pipeline_architecture_spark.sources import load_table

    df = em.QUERIES["kmeans_assign_witness"](spark, SF_SMOKE)
    total = df.agg(F.sum("n_vectors")).collect()[0][0]
    corpus = load_table(spark, SF_SMOKE, "embeddings").count()
    assert total == corpus
    assert df.filter(
        (F.col("mean_cosine") < -1) | (F.col("mean_cosine") > 1)
    ).count() == 0


def test_semdedup_witness_keep_bounds(spark):
    df = em.QUERIES["semdedup_witness"](spark, SF_SMOKE)
    assert df.filter(F.col("n_kept") > F.col("n_vecs")).count() == 0
    assert df.filter(F.col("n_kept") < 1).count() == 0  # min-id survives


def test_dtw_witness_nonnegative(spark):
    df = em.QUERIES["dtw_witness"](spark, SF_SMOKE)
    assert df.filter(F.col("dtw_dist") < 0).count() == 0
    assert df.filter(F.col("n_points") <= 0).count() == 0


def test_pca_witness_in_spectrum_range(spark):
    row = em.QUERIES["pca_power_witness"](spark, SF_SMOKE).collect()[0]
    assert row["top_eigenvalue"] > 0
    # dominant eigenvalue is at most the trace, at least trace/d
    assert 0 < row["explained_ratio"] <= 1
    assert row["explained_ratio"] >= 1.0 / 64 - 1e-9
