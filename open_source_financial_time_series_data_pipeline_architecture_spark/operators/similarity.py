"""Similarity search over embedding columns (A10 + training-data ANN).

Replaces pgvector's ivfflat cosine index
(/root/reference/sql/timescaledb_schema.sql:285-286):

- ``brute_force_topk``   — exact cosine top-k (the correctness baseline;
  distributed TakeOrdered, no shuffle of the corpus)
- ``knn_join``           — exact k-NN for a set of query vectors via
  join + per-query rank window
- ``lsh_bucketed_topk``  — random-hyperplane LSH (signed projections)
  blocking, the approximate 100 TB path; probes only colliding buckets

Determinism convention: ranking always orders by
(round(cosine, 6) DESC, id ASC) so results are reproducible across
engines and runs even under floating-point ulp drift.

Scale notes: brute force is O(N·d) per query — at 100 TB use
`lsh_bucketed_topk` (expected bucket size N/2^bits) or partition the
corpus IVF-style by a k-means-ish coarse quantizer; both keep the
per-query work to a small corpus slice and avoid any all-pairs shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine_similarity, dot


def brute_force_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against one literal query vector."""
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = emb.select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), qcol), 6).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact k nearest corpus vectors for every query vector.

    Broadcast the (small) query side; the corpus is scanned once, then a
    per-query rank window keeps k rows. Corpus never self-shuffles.
    """
    q = queries.select(
        F.col(query_id), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(F.col(corpus_id), F.col(vec_col).alias("__cv"))
    scored = c.join(F.broadcast(q)).select(
        query_id,
        corpus_id,
        F.round(cosine_similarity("__qv", "__cv"), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def random_hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (pure python LCG — no
    numpy RNG state, reproducible everywhere)."""
    state = seed or 1
    planes: list[list[float]] = []
    for _ in range(bits):
        row = []
        for _ in range(dim):
            # Park–Miller minimal standard LCG
            state = (state * 48271) % 2147483647
            row.append(state / 2147483647.0 - 0.5)
        planes.append(row)
    return planes


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Signed-random-projection bucket id for a vector column."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        pc = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(vec_col, pc) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + bit * F.lit(2 ** i).cast("long")
    return bucket


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    bits: int = 8,
    dim: int = 64,
    seed: int = 42,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate k-NN: only corpus vectors in the query's LSH bucket
    are scored. Expected candidate set = N/2^bits; recall measured by
    tests against `knn_join` (contract A10's Recall@k method,
    /root/reference/sql/smartdb_contract.md:111)."""
    planes = random_hyperplanes(dim, bits, seed)
    qb = queries.select(
        query_id,
        F.col(vec_col).alias("__qv"),
        lsh_bucket(F.col(vec_col), planes).alias("__bucket"),
    )
    cb = corpus.select(
        corpus_id,
        F.col(vec_col).alias("__cv"),
        lsh_bucket(F.col(vec_col), planes).alias("__bucket"),
    )
    scored = cb.join(F.broadcast(qb), "__bucket").select(
        query_id,
        corpus_id,
        F.round(cosine_similarity("__qv", "__cv"), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(corpus_id).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
