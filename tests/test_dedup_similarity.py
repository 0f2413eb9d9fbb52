"""Recall/property tests for the approximate dedup + ANN operators,
per the contract's Recall@k test method
(/root/reference/sql/smartdb_contract.md:111) and the dedup family's
ground-truth validation design.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.operators import (
    dedup as DD,
)
from open_source_financial_time_series_data_pipeline_architecture_spark.operators import (
    similarity as SIM,
)
from open_source_financial_time_series_data_pipeline_architecture_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_minhash_lsh_recall_vs_exact(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    exact = {
        (r["id_a"], r["id_b"])
        for r in DD.ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    assert exact, "fixture should contain near-duplicate documents"
    approx = {
        (r["id_a"], r["id_b"])
        for r in DD.minhash_lsh_pairs(
            docs, num_hashes=64, bands=16, threshold=0.5
        ).collect()
    }
    # LSH output is verified with exact jaccard → no false positives
    assert approx <= exact
    # recall at j≥0.5 with 16 bands × 4 rows: P(candidate) = 1-(1-j^4)^16
    # ≥ 0.65 at j=0.5 and → 1 fast; the fixture's dups are j≈0.9+
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.8, f"minhash recall {recall:.2f}"


def test_simhash_finds_near_identical_docs(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    # ground truth: very similar docs (jaccard ≥ 0.8)
    exact = {
        (r["id_a"], r["id_b"])
        for r in DD.ngram_jaccard_pairs(docs, n=3, threshold=0.8).collect()
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in DD.simhash_pairs(docs, max_hamming=10).collect()
    }
    assert exact, "fixture should contain j≥0.8 pairs"
    found = len(got & exact) / len(exact)
    assert found >= 0.7, f"simhash found only {found:.2f} of near-identical pairs"


def test_lsh_ann_recall_at_k(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in SIM.knn_join(queries, emb, k=5).collect()
    }
    # 4-bit LSH → expected candidate set N/16; recall suffers vs exact,
    # but the self-match (cosine 1.0) must always survive and overall
    # recall should beat random bucketing by a wide margin
    approx = {
        (r["query_id"], r["vec_id"])
        for r in SIM.lsh_bucketed_topk(queries, emb, k=5, bits=4, dim=64).collect()
    }
    self_matches = {(q, v) for (q, v) in exact if q == v}
    assert self_matches <= approx
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.3, f"ANN recall@5 {recall:.2f}"


def test_ivf_recall_at_k(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    centroids = SIM.kmeans_centroids(emb, k=8, iters=3)
    assert len(centroids) == 8 and all(len(c) == 64 for c in centroids)
    # determinism: same seed → same codebook
    again = SIM.kmeans_centroids(emb, k=8, iters=3)
    assert centroids == again

    exact = {
        (r["query_id"], r["vec_id"])
        for r in SIM.knn_join(queries, emb, k=5).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in SIM.ivf_topk(queries, emb, centroids, k=5, n_probe=3).collect()
    }
    self_matches = {(q, v) for (q, v) in exact if q == v}
    assert self_matches <= approx  # a query always probes its own list
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.4, f"IVF recall@5 {recall:.2f}"


def test_exact_dedup_keeps_min_id(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    # inject true duplicates by unioning a shifted copy of 10 docs
    dup = docs.limit(10).withColumn("doc_id", F.col("doc_id") + 100000)
    out = DD.exact_dedup(docs.unionByName(dup))
    dups = out.filter(F.col("n_copies") > 1).collect()
    assert len(dups) == 10
    assert all(r["keep_id"] < 100000 for r in dups)


def test_connected_components_toy_graph(spark):
    """Chain 1-2-3 collapses to one cluster (transitivity, 2 hops);
    5-6 pairs; isolated docs become their own singleton cluster."""
    from open_source_financial_time_series_data_pipeline_architecture_spark.operators.dedup import (
        connected_components,
        dedup_cluster_assignments,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    cc = {r["id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}

    docs = spark.createDataFrame(
        [(i, "x") for i in (1, 2, 3, 4, 5, 6)], "doc_id long, text string"
    )
    assign = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in dedup_cluster_assignments(docs, pairs=pairs).collect()
    }
    assert assign == {
        1: (1, True),
        2: (1, False),
        3: (1, False),
        4: (4, True),
        5: (5, True),
        6: (5, False),
    }


def test_lsh_bucketed_pairs_recall_and_no_false_positives(spark):
    """Multi-table random-projection LSH vs the exact all-pairs
    baseline on planted near-duplicates: recall >= 0.8, and (because
    every candidate is exact-cosine-verified) zero false positives."""
    import math

    from open_source_financial_time_series_data_pipeline_architecture_spark.operators import (
        dedup as DDx,
    )
    from open_source_financial_time_series_data_pipeline_architecture_spark.operators import (
        similarity as SIMx,
    )

    # deterministic corpus: 60 base vectors (LCG), each with one small
    # perturbation -> 60 planted near-dup pairs at cosine ~0.99
    state = 7
    def nxt():
        nonlocal state
        state = (state * 48271) % 2147483647
        return state / 2147483647.0 - 0.5

    rows = []
    for i in range(60):
        base = [nxt() for _ in range(64)]
        nrm = math.sqrt(sum(x * x for x in base)) or 1.0
        base = [x / nrm for x in base]
        pert = [x + nxt() * 0.02 for x in base]
        rows.append((i * 2, base))
        rows.append((i * 2 + 1, pert))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = {
        (r["id_a"], r["id_b"])
        for r in DDx.embedding_cosine_pairs(emb, threshold=0.95).collect()
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in SIMx.lsh_bucketed_pairs(
            emb, threshold=0.95, bits=6, tables=6, dim=64
        ).collect()
    }
    assert exact, "fixture must contain near-dup pairs"
    assert got <= exact, f"false positives: {got - exact}"
    recall = len(got & exact) / len(exact)
    assert recall >= 0.8, recall


def test_knn_join_vectorized_matches_interpreted(spark):
    """The Arrow/numpy-scored kNN must equal the zip_with/aggregate
    form exactly (both round cosine to 6 before ranking)."""
    from pyspark.sql import functions as F

    from open_source_financial_time_series_data_pipeline_architecture_spark.operators import (
        similarity as SIMx,
    )
    from open_source_financial_time_series_data_pipeline_architecture_spark.sources import (
        load_table,
    )
    from tests.conftest import SF_CORRECT

    emb = load_table(spark, SF_CORRECT, "embeddings")
    qs = emb.filter(F.col("vec_id") % 499 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = sorted(map(tuple, SIMx.knn_join(qs, emb, k=5).collect()))
    b = sorted(map(tuple, SIMx.knn_join_vectorized(qs, emb, k=5).collect()))
    assert a == b and a


def test_blocked_exact_pairs_equals_all_pairs_baseline(spark):
    # the block-matrix form is EXACT: same pair set and same rounded
    # cosine as the brute-force all-pairs baseline at every threshold
    emb = load_table(spark, SF_SMOKE, "embeddings")
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in SIM.blocked_exact_pairs(
            emb, threshold=0.2, n_blocks=5
        ).collect()
    }
    base = {
        (r.id_a, r.id_b): round(r.cosine, 6)
        for r in DD.embedding_cosine_pairs(emb, threshold=-2.0).collect()
        if round(r.cosine, 6) >= 0.2
    }
    assert set(got) == set(base)
    for k, v in base.items():
        assert abs(got[k] - v) < 1e-9, (k, got[k], v)


def test_ngram_jaccard_hot_shingle_cap(spark):
    # a stop-phrase shared by the whole corpus must not generate O(n^2)
    # candidates once capped: pairs related ONLY through the hot phrase
    # disappear, genuine near-dups (discriminative shingle overlap) stay
    stop = "terms and conditions apply to all"
    docs = [(i, f"{stop} unique{i} alpha{i} beta{i} gamma{i}") for i in range(40)]
    # one true near-dup pair: 41/42 share a long discriminative tail
    docs += [
        (41, f"{stop} shared body of text that repeats verbatim here"),
        (42, f"{stop} shared body of text that repeats verbatim here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    capped = DD.ngram_jaccard_pairs(df, n=3, threshold=0.5, max_doc_freq=5)
    rows = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (41, 42) in rows
    assert rows == {(41, 42)}, rows

    # uncapped, the stop phrase alone creates cross-corpus candidates;
    # the capped CANDIDATE set (pre-threshold) must be quadratically smaller
    uncapped_cand = DD.ngram_jaccard_pairs(df, n=3, threshold=0.0).count()
    capped_cand = DD.ngram_jaccard_pairs(
        df, n=3, threshold=0.0, max_doc_freq=5
    ).count()
    assert uncapped_cand > 800  # ~C(42,2) from the hot shingles
    assert capped_cand <= 1


def test_int8_quantized_ann_recall(spark):
    # int8 scalar quantization must preserve neighborhood structure:
    # recall@5 vs the float brute-force baseline >= 0.8 on this corpus
    emb = load_table(spark, SF_SMOKE, "embeddings")
    quant = SIM.scalar_quantize(emb).select(
        "vec_id", F.col("qvec").cast("array<double>").alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") % 499 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    q_queries = quant.filter(F.col("vec_id") % 499 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = SIM.knn_join_vectorized(queries, emb, k=5).collect()
    approx = SIM.knn_join_vectorized(q_queries, quant, k=5).collect()
    by_q_exact: dict[int, set] = {}
    by_q_approx: dict[int, set] = {}
    for r in exact:
        by_q_exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in approx:
        by_q_approx.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = total = 0
    for qid, want in by_q_exact.items():
        got = by_q_approx.get(qid, set())
        hits += len(want & got)
        total += len(want)
    assert total > 0 and hits / total >= 0.8, (hits, total)


def test_scalar_quantize_range_and_zero_vector(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = SIM.scalar_quantize(emb)
    row = q.selectExpr(
        "max(array_max(qvec)) AS mx",
        "min(array_min(qvec)) AS mn",
    ).collect()[0]
    assert row["mx"] <= 127 and row["mn"] >= -127
    # synthetic zero vector quantizes to zeros with scale 0
    import pyspark.sql.functions as SF

    zdf = spark.createDataFrame(
        [(1, [0.0] * 4)], "vec_id long, embedding array<double>"
    )
    zq = SIM.scalar_quantize(zdf).collect()[0]
    assert list(zq["qvec"]) == [0, 0, 0, 0] and zq["scale"] == 0.0


def test_compression_ratio_signal(spark):
    import zlib

    from open_source_financial_time_series_data_pipeline_architecture_spark.functions import corpus as CX

    docs = spark.createDataFrame(
        [
            (1, "the " * 200),                       # degenerate repetition
            (2, "key agg row scan slow fast table value part hash merge"),
            (3, ""),                                 # empty → NULL ratio
            (4, None),                               # NULL text → NULL ratio
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in CX.compression_ratio(docs).collect()}
    # repetitive text compresses far better than varied text
    assert out[1]["compression_ratio"] < 0.1
    assert out[2]["compression_ratio"] > 0.5
    assert out[3]["compression_ratio"] is None and out[3]["raw_bytes"] == 0
    assert out[4]["compression_ratio"] is None
    # deterministic: exact zlib level-6 byte count, same as local python
    expected = len(zlib.compress(("the " * 200).encode(), 6))
    assert out[1]["compressed_bytes"] == expected
    # corpus run: every non-empty doc in [0, ~1.1], none null
    real = CX.compression_ratio(
        load_table(spark, SF_SMOKE, "documents")
    ).collect()
    assert all(0 < r["compression_ratio"] <= 1.2 for r in real)


def test_minhash_calibration_bounds(spark):
    import __spark_entry__ as em

    row = em.QUERIES["minhash_calibration"](spark, SF_SMOKE).collect()[0]
    # 64 hashes → RMSE ~ sqrt(J(1-J)/64) ≈ 0.06 at J=0.5; the mean
    # absolute error over verified pairs must sit well inside that
    assert row["n_pairs"] > 0
    assert row["mean_abs_err"] < 0.08, row
    assert row["max_abs_err"] < 0.25, row
