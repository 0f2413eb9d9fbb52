"""Vector/embedding column math (A10 support).

Replaces pgvector's cosine ops
(/root/reference/sql/timescaledb_schema.sql:272, 285-286) with pure
Spark SQL higher-order functions — ``zip_with`` + ``aggregate`` run
JVM-side inside codegen; no UDF, no Arrow transfer.

All helpers promote to DOUBLE before accumulating so results are
engine-portable (same fold order and precision as DuckDB's
list_dot_product over DOUBLE[]).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dbl(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """NULL-safe cosine similarity; NULL when either norm is 0."""
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom)


def l2_distance(a: Column | str, b: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(_dbl(a), _dbl(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def pca_variance(
    emb, top: int = 3, id_col: str = "vec_id", vec_col: str = "embedding"
):
    """Distributed PCA spectrum of an embedding corpus: per-partition
    partial (count, mean-sum, covariance-outer-product) moments via one
    Arrow-batched pass, combined on the driver into the d×d covariance
    (d² floats — tiny for any embedding dim), then eigendecomposed with
    numpy. Returns a DataFrame of the top eigenvalues with explained
    variance ratios — the intrinsic-dimensionality / anisotropy
    diagnostic a curation pipeline checks before cosine-based dedup
    (near-rank-collapse embeddings make cosine thresholds meaningless).

    Scale: the corpus never shuffles; partials are O(#partitions·d²)
    and the eigensolve is driver-side on d×d. The same moment-combine
    pattern as `kmeans_centroids`' Lloyd pass.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    spark = emb.sparkSession
    vecs = emb.select(F.col(vec_col).cast("array<double>").alias("v"))

    def partials(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf["v"].to_numpy())
            yield pd.DataFrame(
                {
                    "n": [mat.shape[0]],
                    "s": [mat.sum(axis=0).tolist()],
                    "ss": [(mat.T @ mat).reshape(-1).tolist()],
                }
            )

    rows = vecs.mapInPandas(
        partials, "n long, s array<double>, ss array<double>"
    ).collect()
    n = sum(r["n"] for r in rows)
    d = len(rows[0]["s"])
    s = np.zeros(d)
    ss = np.zeros((d, d))
    for r in rows:
        s += np.array(r["s"])
        ss += np.array(r["ss"]).reshape(d, d)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    evals = np.linalg.eigvalsh(cov)[::-1]
    total = float(evals.sum())
    out = [
        (
            i + 1,
            round(float(evals[i]), 6),
            round(float(evals[i] / total), 6) if total > 0 else None,
            round(float(evals[: i + 1].sum() / total), 6)
            if total > 0
            else None,
        )
        for i in range(min(top, d))
    ]
    return spark.createDataFrame(
        out,
        "component bigint, eigenvalue double, explained_ratio double, "
        "cum_explained double",
    )
