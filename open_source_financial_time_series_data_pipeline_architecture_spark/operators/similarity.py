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

import pandas as pd
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


def kmeans_centroids(
    corpus: DataFrame,
    k: int = 16,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> list[list[float]]:
    """Deterministic k-means-lite coarse quantizer (the IVF codebook).

    Init: the k corpus vectors with the smallest xxhash64(id, seed) —
    reproducible, no RNG state. Each Lloyd iteration is one
    Arrow-batched assignment-plus-partial-sum pass (see inline note);
    only O(#partitions·k·d) partials come back to the driver between
    iterations — the standard Spark iterative-ML shape, the corpus
    itself never moves.
    """
    import numpy as np

    # persisted across the init pass + every Lloyd iteration (each is a
    # separate job that would otherwise rescan the source); spills to
    # disk when the corpus exceeds executor memory
    vecs = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    ).persist()
    init = (
        vecs.withColumn("__h", F.xxhash64(F.col(id_col), F.lit(seed)))
        .orderBy("__h")
        .limit(k)
        .select("v")
        .collect()
    )
    centroids = [list(r["v"]) for r in init]

    # Each Lloyd iteration: ONE Arrow-batched pass that assigns every
    # vector to its argmax-cosine centroid (BLAS matmul against the
    # k×d codebook closed over — O(k·d) floats, broadcast-safe) and
    # emits per-partition PARTIAL sums: ≤ k rows per partition, so the
    # driver-side combine is O(#partitions·k·d). The corpus never
    # shuffles; ties (exact-equal cosines) take the first max,
    # matching `_nearest_centroid`'s array_position rule.
    for _ in range(iters):
        cent_arr = np.array(centroids)
        cn = np.linalg.norm(cent_arr, axis=1)
        cn[cn == 0.0] = 1.0
        unit_c = (cent_arr / cn[:, None]).T

        def partial_sums(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                mat = np.stack(pdf["v"].to_numpy())
                vn = np.linalg.norm(mat, axis=1)
                vn[vn == 0.0] = 1.0
                a = ((mat / vn[:, None]) @ unit_c).argmax(axis=1)
                rows = []
                for c in range(len(cent_arr)):
                    m = a == c
                    if m.any():
                        rows.append(
                            (c, int(m.sum()), mat[m].sum(axis=0).tolist())
                        )
                yield pd.DataFrame(rows, columns=["c", "n", "s"])

        parts = vecs.select("v").mapInPandas(
            partial_sums, "c int, n long, s array<double>"
        ).collect()
        sums: dict[int, np.ndarray] = {}
        counts: dict[int, int] = {}
        for r in parts:
            sums[r["c"]] = sums.get(r["c"], 0) + np.array(r["s"])
            counts[r["c"]] = counts.get(r["c"], 0) + r["n"]
        centroids = [
            (sums[i] / counts[i]).tolist() if counts.get(i) else centroids[i]
            for i in range(len(centroids))
        ]
    vecs.unpersist()
    return centroids


def _nearest_centroid(vec, centroids: list[list[float]]):
    """Argmax over centroid cosines, as a pure column expr.

    Flat form — a sims array + array_position of its max (first
    occurrence, so ties resolve to the lowest centroid id, identical
    to a strict-`>` scan). The earlier when-chain fold re-embedded the
    running best_sim subtree twice per step, making the expression
    tree (and the serialized task binary) EXPONENTIAL in k — at k=8,
    d=64 that was a multi-MiB closure per job and an OOM/stack hazard
    in long-lived sessions."""
    sims = F.array(
        *[
            cosine_similarity(vec, F.array(*[F.lit(x) for x in c]))
            for c in centroids
        ]
    )
    return (F.array_position(sims, F.array_max(sims)) - 1).cast("int")


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    n_probe: int = 2,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate k-NN: corpus vectors live in their nearest-
    centroid inverted list; each query probes its `n_probe` nearest
    lists only. Expected work per query = n_probe/k_lists of the corpus
    — the classic ANN scale path next to LSH. Recall vs exact k-NN is
    pinned in tests (contract A10 Recall@k method)."""
    c = corpus.select(
        F.col(corpus_id),
        F.col(vec_col).alias("__cv"),
        _nearest_centroid(F.col(vec_col).cast("array<double>"), centroids).alias(
            "__list"
        ),
    )
    # per-query: similarities to every centroid, pick top n_probe lists
    sims = [
        F.struct(
            cosine_similarity(
                F.col(vec_col).cast("array<double>"),
                F.array(*[F.lit(x) for x in cen]),
            ).alias("s"),
            F.lit(i).alias("i"),
        )
        for i, cen in enumerate(centroids)
    ]
    ql = queries.select(
        F.col(query_id),
        F.col(vec_col).alias("__qv"),
        F.explode(
            F.slice(F.reverse(F.array_sort(F.array(*sims))), 1, n_probe)
        ).alias("__probe"),
    ).select(query_id, "__qv", F.col("__probe.i").alias("__list"))

    scored = c.join(F.broadcast(ql), "__list").select(
        query_id,
        corpus_id,
        F.round(cosine_similarity("__qv", "__cv"), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(corpus_id).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


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


def lsh_bucketed_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    bits: int = 6,
    tables: int = 4,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup candidate pairs via multi-table random-projection LSH —
    the scale path behind `dedup.embedding_cosine_pairs` (which is the
    exact all-pairs baseline).

    Each of the ``tables`` hash tables buckets every vector by ``bits``
    signed projections; the self-join runs WITHIN (table, bucket) only,
    so the shuffle is linear in N·tables and the compare work is
    sum-of-squared-bucket-sizes — never the N² all-pairs join. Every
    candidate is then verified with the exact cosine, so the output has
    zero false positives; missed pairs (recall) shrink exponentially
    with ``tables`` (a pair at cosine c collides in one table with
    probability (1 − acos(c)/π)^bits). Recall vs the exact baseline is
    pinned in tests/test_dedup_similarity.py.
    """
    vecs = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v"))
    per_table = []
    for t in range(tables):
        planes = random_hyperplanes(dim, bits, seed + 1000 * t)
        per_table.append(
            vecs.select(
                id_col,
                "__v",
                F.lit(t).alias("__table"),
                lsh_bucket(F.col("__v"), planes).alias("__bucket"),
            )
        )
    tagged = per_table[0]
    for more in per_table[1:]:
        tagged = tagged.unionByName(more)
    a = tagged.select(
        F.col(id_col).alias("id_a"), F.col("__v").alias("__va"), "__table", "__bucket"
    )
    b = tagged.select(
        F.col(id_col).alias("id_b"), F.col("__v").alias("__vb"), "__table", "__bucket"
    )
    return (
        a.join(b, ["__table", "__bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_similarity("__va", "__vb"), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )


def knn_join_vectorized(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """`knn_join` with the scoring loop moved into an Arrow-batched
    pandas UDF: the query matrix (small by contract) is collected once
    and closed over; each corpus Arrow batch is scored against ALL
    queries with one numpy matmul instead of |Q| interpreted
    zip_with/aggregate evaluations per row.

    Same output contract as `knn_join` (cosine rounded to 6, ties by id)
    — parity is pinned in tests. The corpus is scanned once and never
    shuffled; per-executor extra memory is the |Q|×d query matrix.
    At 100 TB this is the preferred form: BLAS does the inner loop and
    the Arrow transfer carries each corpus vector exactly once, not
    once per query.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    q_rows = queries.select(query_id, vec_col).collect()
    q_ids = [r[query_id] for r in q_rows]
    q_mat = np.asarray([list(r[vec_col]) for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)
    q_norm[q_norm == 0.0] = 1.0

    @pandas_udf("array<double>")
    def score_all(vecs: pd.Series) -> pd.Series:
        c = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if len(c) == 0:
            return pd.Series([], dtype=object)
        c_norm = np.linalg.norm(c, axis=1)
        c_norm[c_norm == 0.0] = 1.0
        sims = (c @ q_mat.T) / np.outer(c_norm, q_norm)
        return pd.Series(list(np.round(sims, 6)))

    scored = corpus.select(
        F.col(corpus_id), score_all(F.col(vec_col).cast("array<double>")).alias("__s")
    ).select(
        corpus_id,
        F.posexplode("__s").alias("__qi", "cosine"),
    )
    qmap = F.array(*[F.lit(i) for i in q_ids])
    scored = scored.select(
        F.element_at(qmap, F.col("__qi") + 1).alias(query_id),
        corpus_id,
        "cosine",
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(corpus_id).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def blocked_exact_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    n_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """EXACT all-pairs cosine ≥ threshold as a distributed block-matrix
    product — the scale-correct form of `dedup.embedding_cosine_pairs`.

    The naive `a JOIN b ON id_a < id_b` is a BroadcastNestedLoopJoin:
    O(N²) join rows materialized through the executor row pipeline. Here
    each vector lands in block ``id % n_blocks`` and is replicated to the
    n_blocks block-PAIRS it participates in, so the shuffle is O(N ·
    n_blocks) rows; each of the n_blocks(n_blocks+1)/2 groups scores its
    two blocks with ONE numpy matmul (BLAS, Arrow-batched) and emits only
    the pairs that clear the threshold. O(N²) multiply-adds are inherent
    to exact all-pairs semantics — but they run inside BLAS at memory
    bandwidth, never as join rows. ``n_blocks`` tunes the per-task memory
    ((2N/n_blocks)·d doubles) independently of cluster size; at 100 TB
    raise it so a block pair fits an executor.

    For approximate near-dup at high thresholds use `lsh_bucketed_pairs`
    (linear shuffle, recall tested); this operator is for when the
    contract demands exactness at an arbitrary threshold.

    Arithmetic matches `knn_join_vectorized` (normalized matmul then
    np.round 6, zero-norm guarded) — pinned ≡ DuckDB
    list_cosine_similarity after ROUND(,6) on this data.
    """
    import numpy as np

    P = n_blocks
    vecs = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        (F.col(id_col) % P).alias("blk"),
    )
    # replicate each vector to every block pair it belongs to:
    # (gp, gq) = (min(blk, other), max(blk, other)) for other in 0..P-1
    # each distinct `other` yields a distinct (gp, gq) for a fixed blk,
    # so no duplicate replicas arise and no dedup shuffle is needed.
    exploded = vecs.withColumn(
        "other", F.explode(F.sequence(F.lit(0), F.lit(P - 1)))
    ).select(
        "id",
        "v",
        "blk",
        F.least("blk", "other").alias("gp"),
        F.greatest("blk", "other").alias("gq"),
    )

    thr = float(threshold)

    def score_block_pair(pdf: pd.DataFrame) -> pd.DataFrame:
        gp = int(pdf["gp"].iloc[0])
        gq = int(pdf["gq"].iloc[0])
        a_rows = pdf[pdf["blk"] == gp]
        b_rows = pdf[pdf["blk"] == gq] if gp != gq else a_rows
        if a_rows.empty or b_rows.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        a_ids = a_rows["id"].to_numpy(dtype=np.int64)
        b_ids = b_rows["id"].to_numpy(dtype=np.int64)
        A = np.asarray([np.asarray(v, dtype=np.float64) for v in a_rows["v"]])
        B = (
            np.asarray([np.asarray(v, dtype=np.float64) for v in b_rows["v"]])
            if gp != gq
            else A
        )
        an = np.linalg.norm(A, axis=1)
        bn = np.linalg.norm(B, axis=1) if gp != gq else an
        an = np.where(an == 0.0, 1.0, an)
        bn = np.where(bn == 0.0, 1.0, bn)
        sims = np.round((A @ B.T) / np.outer(an, bn), 6)
        ii, jj = np.nonzero(sims >= thr)
        ida, idb = a_ids[ii], b_ids[jj]
        lo, hi = np.minimum(ida, idb), np.maximum(ida, idb)
        keep = lo < hi  # drops self-pairs; i<j dedup handled by min/max
        out = pd.DataFrame(
            {"id_a": lo[keep], "id_b": hi[keep], "cosine": sims[ii, jj][keep]}
        )
        # within-block pairs appear once per (gp,gq) group only, but the
        # same (i,j) shows twice inside a gp==gq matmul (sym) — dedup.
        return out.drop_duplicates(["id_a", "id_b"])

    return exploded.groupBy("gp", "gq").applyInPandas(
        score_block_pair, schema="id_a long, id_b long, cosine double"
    )


def scalar_quantize(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: q_i = round(x_i·127/amax)
    ∈ [−127, 127] — the standard memory-bandwidth lever for large ANN
    corpora (4× smaller than float32, 8× smaller than float64; the same
    scheme pgvector/faiss call scalar quantization).

    Pure built-in expressions (amax projected FIRST so the transform
    lambda does not re-evaluate it per element). An all-zero vector
    quantizes to all zeros. COSINE over dequantized vectors equals
    cosine over the raw int vectors — the per-vector scale cancels —
    so downstream search needs only (id, qvec).
    """
    base = emb.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).withColumn("__amax", F.array_max(F.transform("__v", lambda x: F.abs(x))))
    q = F.when(
        F.col("__amax") > 0,
        F.transform(
            "__v",
            lambda x: F.round(x * 127.0 / F.col("__amax")).cast("int"),
        ),
    ).otherwise(F.transform("__v", lambda x: F.lit(0)))
    return base.select(
        id_col,
        q.alias("qvec"),
        (F.col("__amax") / 127.0).alias("scale"),
    )


def centroid_cosine(
    emb: DataFrame,
    group_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine of every vector to its group's mean vector (centroid) —
    the embedding-space outlier/quality score a training-data pipeline
    runs to drop mislabeled or junk examples before fine-tuning
    (pgvector-era analog of the reference's ivfflat clustering,
    sql/timescaledb_schema.sql:285-286, reused as a diagnostic).

    Plan: posexplode to (id, group, pos, comp) — linear in N·d; one
    hash aggregate builds the centroid table (|groups|·d rows, tiny →
    broadcast); one equi-join + per-vector aggregate computes the dot
    and norms. No all-pairs anything: O(N·d) end to end, partial
    aggregation applies, and the only shuffle of the big side is the
    per-vector groupBy on (id, group).
    """
    e = emb.select(
        F.col(id_col),
        F.col(group_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias(
            "pos", "comp"
        ),
    )
    cent = e.groupBy(group_col, "pos").agg(F.avg("comp").alias("c"))
    cnorm = cent.groupBy(group_col).agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("cnorm")
    )
    per_vec = (
        e.join(F.broadcast(cent), [group_col, "pos"])
        .groupBy(id_col, group_col)
        .agg(
            F.sum(F.col("comp") * F.col("c")).alias("dot"),
            F.sqrt(F.sum(F.col("comp") * F.col("comp"))).alias("vnorm"),
        )
    )
    return per_vec.join(F.broadcast(cnorm), group_col).select(
        id_col,
        group_col,
        F.round(
            F.col("dot") / F.nullif(F.col("vnorm") * F.col("cnorm"), F.lit(0.0)),
            6,
        ).alias("cos_centroid"),
    )


def semdedup(
    emb: DataFrame,
    k: int = 8,
    iters: int = 4,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023):
    cluster the embedding space with the deterministic k-means-lite
    codebook, then compare pairs ONLY within a cluster and prune every
    vector that has a higher-similarity-than-threshold neighbor with a
    smaller id (the kept vector of each semantic-dup group is its
    min-id member — deterministic canonical choice, mirroring the
    dedup family's min-label convention).

    Returns (id, cluster_id, is_kept).

    Scale: this is exactly the SemDeDup design point — the quadratic
    cosine comparison is confined to a cluster (cost Σ n_c² ≈ N²/k)
    and k is chosen to bound cluster size (at 100 TB you raise k so
    n_c stays ~10⁴-10⁵; the assignment pass stays O(N·k·d) with a
    broadcast codebook). Each cluster's comparison is ONE Arrow-batched
    BLAS gram-matrix product inside `applyInPandas` (the vectorized
    form is ~40× the interpreted HOF pair-join measured at 5k×64d),
    and a cluster fits in executor memory by construction — the same
    contract as the paper's per-cluster pass.
    """
    import numpy as np

    cents = kmeans_centroids(emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    vecs = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    cent_arr = np.array(cents)
    cn = np.linalg.norm(cent_arr, axis=1)
    cn[cn == 0.0] = 1.0
    unit_c = (cent_arr / cn[:, None]).T

    # assignment: one Arrow-batched matmul pass against the closed-over
    # k×d codebook (first-max tie rule = _nearest_centroid's)
    def assign(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf["v"].to_numpy())
            vn = np.linalg.norm(mat, axis=1)
            vn[vn == 0.0] = 1.0
            a = ((mat / vn[:, None]) @ unit_c).argmax(axis=1)
            yield pd.DataFrame(
                {"id": pdf["id"], "cluster_id": a.astype("int32"), "v": pdf["v"]}
            )

    assigned = vecs.mapInPandas(
        assign, "id long, cluster_id int, v array<double>"
    )

    def prune_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("id").reset_index(drop=True)
        mat = np.stack(pdf["v"].to_numpy())
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0
        unit = mat / norms[:, None]
        gram = unit @ unit.T
        # pruned ⇔ some SMALLER-id row (strictly lower triangle) is a
        # ≥-threshold neighbor — min-id member of each dup group kept
        tri = np.tril(gram >= threshold, k=-1)
        pruned = tri.any(axis=1)
        return pd.DataFrame(
            {
                "id": pdf["id"],
                "cluster_id": pdf["cluster_id"],
                "is_kept": ~pruned,
            }
        )

    return assigned.groupBy("cluster_id").applyInPandas(
        prune_cluster, "id long, cluster_id int, is_kept boolean"
    )


def embedding_contamination(
    cands: DataFrame,
    bench: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space decontamination: the semantic analog of the
    n-gram `benchmark_contamination` check — for every candidate
    vector, its max cosine against the benchmark/eval set and a
    leaked-or-not flag at ``threshold``. Catches paraphrased eval
    leakage that exact n-gram overlap misses.

    The benchmark set is small by definition (an eval suite) → collect
    once and close over it; ONE Arrow-batched pass over the candidate
    corpus scores a whole batch against every benchmark vector with a
    single numpy matmul (the `knn_join_vectorized` arithmetic —
    normalized matmul then np.round 6, pinned ≡ the zip_with/aggregate
    fold after ROUND(,6) on this data), O(|C|·|B|·d) inside BLAS
    instead of |C|·|B| interpreted HOF evaluations. Ranking ties
    (equal rounded cosine) resolve to the smallest benchmark id —
    benchmark columns are ordered by id and argmax takes the first
    maximum. Zero-norm vectors score NULL (excluded from the max),
    matching the NULL-safe column form.
    """
    import numpy as np

    b_rows = (
        bench.select(
            F.col(id_col).alias("bench_id"),
            F.col(vec_col).cast("array<double>").alias("bv"),
        )
        .orderBy("bench_id")
        .collect()
    )
    b_ids = np.asarray([r["bench_id"] for r in b_rows], dtype=np.int64)
    b_mat = np.asarray([list(r["bv"]) for r in b_rows], dtype=np.float64)
    b_norm = np.linalg.norm(b_mat, axis=1) if len(b_rows) else np.zeros(0)

    def score(batches):
        for pdf in batches:
            if pdf.empty or len(b_ids) == 0:
                continue
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["cv"]]
            )
            c_norm = np.linalg.norm(mat, axis=1)
            denom = np.outer(c_norm, b_norm)
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = np.round((mat @ b_mat.T) / denom, 6)
            sims[denom == 0.0] = np.nan
            masked = np.where(np.isnan(sims), -np.inf, sims)
            best = masked.argmax(axis=1)
            maxv = masked[np.arange(len(pdf)), best]
            ok = np.isfinite(maxv)
            yield pd.DataFrame(
                {
                    "cand_id": pdf["cand_id"],
                    "max_cosine": [
                        float(v) if o else None for v, o in zip(maxv, ok)
                    ],
                    "nearest_bench_id": [
                        int(i) if o else None for i, o in zip(b_ids[best], ok)
                    ],
                }
            )

    scored = cands.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).mapInPandas(
        score, "cand_id long, max_cosine double, nearest_bench_id long"
    )
    return scored.select(
        "cand_id",
        "max_cosine",
        "nearest_bench_id",
        (F.col("max_cosine") >= threshold).alias("is_leaked"),
    )


# -- product quantization (PQ / ADC) ----------------------------------------
#
# The fourth leg of the ANN family (brute force / LSH / IVF / PQ — the
# FAISS-canonical quartet): each d-dim vector splits into `m` subspaces
# with a k-entry L2 codebook per subspace, so the corpus compresses to
# m small codes per vector (m·log2(k) bits instead of d·64) and a query
# scores a vector by LOOKUP — one m×k table of subspace dot products per
# query, built once, then sum-of-m-gathers per corpus code word
# (asymmetric distance computation). At 100 TB this is the form where
# the "index" fits in RAM: 64-dim float64 → 8 bytes/vector at m=8,k=16.


def pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> list[list[list[float]]]:
    """Per-subspace L2 k-means codebooks (the PQ trainer), m×k×(d/m).

    Same deterministic shape as ``kmeans_centroids``: init from the k
    corpus vectors with the smallest xxhash64(id, seed) (their
    subspace slices seed every subquantizer), then each Lloyd
    iteration is ONE Arrow-batched pass that assigns ALL m subspaces
    and emits per-partition partial sums — ≤ m·k rows per partition
    back to the driver; the corpus never shuffles. Ties in the argmin
    take the FIRST minimum (lowest code), matching the SQL witness's
    ``ORDER BY dist ASC, ord ASC`` rule."""
    import numpy as np

    vecs = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    ).persist()
    d = len(vecs.select("v").first()["v"])
    if d % m:
        raise ValueError(f"dim {d} not divisible into {m} subspaces")
    sub = d // m
    init = (
        vecs.withColumn("__h", F.xxhash64(F.col(id_col), F.lit(seed)))
        .orderBy("__h")
        .limit(k)
        .select("v")
        .collect()
    )
    books = np.array(
        [
            [list(r["v"])[j * sub : (j + 1) * sub] for r in init]
            for j in range(m)
        ]
    )  # m × k × sub

    for _ in range(iters):
        cb = books.copy()

        def partials(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                mat = np.stack(pdf["v"].to_numpy())
                rows = []
                for j in range(m):
                    x = mat[:, j * sub : (j + 1) * sub]
                    d2 = ((x[:, None, :] - cb[j][None, :, :]) ** 2).sum(
                        axis=2
                    )
                    a = d2.argmin(axis=1)
                    for c in range(len(cb[j])):
                        msk = a == c
                        if msk.any():
                            rows.append(
                                (
                                    j,
                                    c,
                                    int(msk.sum()),
                                    x[msk].sum(axis=0).tolist(),
                                )
                            )
                yield pd.DataFrame(rows, columns=["j", "c", "n", "s"])

        parts = vecs.select("v").mapInPandas(
            partials, "j int, c int, n long, s array<double>"
        ).collect()
        sums: dict = {}
        counts: dict = {}
        for r in parts:
            key = (r["j"], r["c"])
            sums[key] = sums.get(key, 0) + np.array(r["s"])
            counts[key] = counts.get(key, 0) + r["n"]
        for j in range(m):
            for c in range(k):
                if counts.get((j, c)):
                    books[j][c] = sums[(j, c)] / counts[(j, c)]
    vecs.unpersist()
    return [[[float(x) for x in c] for c in books[j]] for j in range(m)]


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector as its m nearest-codeword indices (L2 per
    subspace, first-min ties). One Arrow-batched pass, no shuffle —
    the corpus compresses to (id, codes array<int>)."""
    import numpy as np

    cb = np.asarray(codebooks)
    m, _, sub = cb.shape
    id_type = dict(
        (f.name, f.dataType.simpleString()) for f in df.schema.fields
    )[id_col]

    def enc(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf["v"].to_numpy())
            codes = np.empty((len(mat), m), dtype=np.int32)
            for j in range(m):
                x = mat[:, j * sub : (j + 1) * sub]
                d2 = ((x[:, None, :] - cb[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {"__pq_id": pdf["__pq_id"], "codes": list(codes.tolist())}
            )

    return df.select(
        F.col(id_col).alias("__pq_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).mapInPandas(enc, f"__pq_id {id_type}, codes array<int>").select(
        F.col("__pq_id").alias(id_col), "codes"
    )


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ approximate k-NN by asymmetric distance computation: the
    query matrix (small by contract, like ``knn_join_vectorized``) is
    collected once; per query a m×k LUT of subspace dot products is
    precomputed; each corpus vector then costs m table gathers — no
    d-dim arithmetic touches the corpus at query time, and the scan
    reads only the (id, codes) encoding. Scores are the reconstructed
    cosine: ``Σⱼ q̂ⱼ·c(codeⱼ) / (|q|·|x̂|)`` with ``|x̂|`` exact from the
    per-codeword norms (subspaces are an orthogonal decomposition).
    Output contract matches the family: (cosine_adc rounded 6, ties by
    id), rank ≤ k."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    cb = np.asarray(codebooks)
    m, _, sub = cb.shape
    q_rows = queries.select(query_id, vec_col).collect()
    q_ids = [r[query_id] for r in q_rows]
    q_mat = np.asarray([list(r[vec_col]) for r in q_rows], dtype=np.float64)
    # query norms as an explicit LEFT FOLD (not np.linalg.norm/BLAS):
    # the SQL witness left-folds list_reduce the same 64 terms, and the
    # query set is contract-small so the python loop is free
    import functools

    q_norm = np.asarray(
        [
            (lambda s: s if s else 1.0)(
                functools.reduce(lambda a, b: a + b, (row * row).tolist())
            )
            for row in q_mat
        ]
    )
    q_norm = np.sqrt(q_norm)
    # LUT (m × k × Q): subspace-dot of every query against every
    # codeword. Elementwise-multiply-then-sequential-sum (length-8
    # reductions stay left-to-right in numpy) rather than BLAS matmul,
    # so each LUT entry is bit-identical to the witness's left fold
    lut = np.stack(
        [
            (
                q_mat[:, j * sub : (j + 1) * sub][:, None, :]
                * cb[j][None, :, :]
            ).sum(axis=2)
            for j in range(m)
        ]
    ).transpose(0, 2, 1)
    n2 = (cb * cb).sum(axis=2)  # m × k codeword norms²
    jj = np.arange(m)

    codes_df = pq_encode(corpus, codebooks, corpus_id, vec_col)

    @pandas_udf("array<double>")
    def score_all(codes: pd.Series) -> pd.Series:
        c = np.stack(codes.to_numpy()).astype(np.int64)
        if len(c) == 0:
            return pd.Series([], dtype=object)
        dots = lut[jj[None, :], c, :].sum(axis=1)  # n × Q
        rnorm = np.sqrt(n2[jj[None, :], c].sum(axis=1))
        rnorm[rnorm == 0.0] = 1.0
        sims = dots / (rnorm[:, None] * q_norm[None, :])
        return pd.Series(list(np.round(sims, 6)))

    scored = codes_df.select(
        F.col(corpus_id), score_all(F.col("codes")).alias("__s")
    ).select(corpus_id, F.posexplode("__s").alias("__qi", "cosine_adc"))
    qmap = F.array(*[F.lit(i) for i in q_ids])
    scored = scored.select(
        F.element_at(qmap, F.col("__qi") + 1).alias(query_id),
        corpus_id,
        "cosine_adc",
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine_adc").desc(), F.col(corpus_id).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
