"""State-space filtering — local-level Kalman filter per key.

The reference's feature plane stops at the EWM recurrence
(sql/timescaledb_schema.sql:103-138); a local-level Kalman filter is
its adaptive-gain generalization: the gain k_t starts high (trust the
data while the level estimate is uncertain) and converges to the
steady-state alpha the Riccati equation fixes, so early observations
are absorbed faster than a fixed-alpha EWM while the asymptotic
behavior is identical.

Like the EWM (SURVEY §7 hard part 1), the recurrence cannot be
expressed with Spark's built-in window frames — this is a deliberate
``applyInPandas``: one shuffle on the key, Arrow-batched, sequential
only *within* a key (keys parallelize, which is the same parallelism
limit any engine has for a per-key recurrence). The arithmetic is an
explicit double-precision loop, bit-identical to the DuckDB
struct-fold oracle in ``__spark_entry__.py``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def kalman_local_level(
    trades: DataFrame,
    q: float = 0.01,
    r: float = 1.0,
    p_init: float = 1.0,
    key_col: str = "symbol",
    value_col: str = "price",
    order_cols: tuple[str, ...] = ("time", "trade_id"),
) -> DataFrame:
    """Filtered level / posterior variance / gain per row.

    Local-level model: x_t = x_{t-1} + w (var q), y_t = x_t + v (var r).
    Update: pp = p + q; k = pp/(pp+r); m += k·(y−m); p = (1−k)·pp.
    Seeded with the first observation (m1 = y1, p1 = ``p_init``); the
    first row has no gain (NULL).

    The posterior variance sequence is data-independent, so the gain
    deterministically converges to the Riccati fixed point
    p* = (−q + sqrt(q² + 4qr))/2, k* = (p*+q)/(p*+q+r) — pinned by
    tests/test_invariants.py.
    """
    cols = [*order_cols, key_col, value_col]

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order_cols)).reset_index(drop=True)
        m = None
        p = None
        levels, variances, gains = [], [], []
        for y in pdf[value_col].to_numpy():
            y = float(y)
            if m is None:
                m, p = y, float(p_init)
                gains.append(None)
            else:
                pp = p + q
                k = pp / (pp + r)
                m = m + k * (y - m)
                p = (1.0 - k) * pp
                gains.append(k)
            levels.append(m)
            variances.append(p)
        pdf["kf_level"] = levels
        pdf["kf_var"] = variances
        pdf["kf_gain"] = gains
        return pdf[cols + ["kf_level", "kf_var", "kf_gain"]]

    # Derive pass-through dtypes from the input relation instead of
    # hardcoding them — a numeric key or a date order column keeps its
    # real type (ADVICE r2: the hardcoded list silently miscast those).
    projected = trades.select(*cols)
    out_schema = T.StructType(
        list(projected.schema.fields)
        + [
            T.StructField("kf_level", T.DoubleType()),
            T.StructField("kf_var", T.DoubleType()),
            T.StructField("kf_gain", T.DoubleType()),
        ]
    )
    return projected.groupBy(key_col).applyInPandas(compute, out_schema)


def dtw_pair_distances(
    aligned_pairs: DataFrame,
    band: int = 5,
    key_cols: tuple[str, str] = ("symbol_a", "symbol_b"),
    order_col: str = "d",
    value_cols: tuple[str, str] = ("va", "vb"),
) -> DataFrame:
    """Dynamic-time-warping distance per key pair over pre-aligned
    series rows, with a Sakoe–Chiba band.

    DTW's DP table is inherently sequential per pair — the one shape
    (like the EWM/Kalman recurrences) that justifies applyInPandas:
    one shuffle on the pair key, Arrow-batched, O(n·band) numpy DP
    inside. Pairs parallelize; n is bounded by the series grain
    (days here), so the per-group work is small at any corpus scale.

    Euclidean distance on the aligned rows is returned alongside —
    DTW ≤ Euclidean always (the band includes the identity
    alignment); pinned in tests/test_invariants.py.
    """
    import numpy as np

    ka, kb = key_cols
    va, vb = value_cols

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        x = pdf[va].to_numpy(dtype=float)
        y = pdf[vb].to_numpy(dtype=float)
        n = len(x)
        inf = float("inf")
        prev = np.full(n + 1, inf)
        prev[0] = 0.0
        for i in range(1, n + 1):
            cur = np.full(n + 1, inf)
            lo = max(1, i - band)
            hi = min(n, i + band)
            for j in range(lo, hi + 1):
                c = abs(x[i - 1] - y[j - 1])
                cur[j] = c + min(prev[j], cur[j - 1], prev[j - 1])
            prev = cur
        dtw = float(prev[n])
        eucl = float(np.abs(x - y).sum())
        return pd.DataFrame(
            {
                ka: [pdf[ka].iloc[0]],
                kb: [pdf[kb].iloc[0]],
                "n_points": [n],
                "dtw_dist": [dtw],
                "euclidean_l1": [eucl],
            }
        )

    out_schema = (
        f"{ka} string, {kb} string, n_points long,"
        " dtw_dist double, euclidean_l1 double"
    )
    return aligned_pairs.groupBy(ka, kb).applyInPandas(compute, out_schema)


def holt_linear(
    trades: DataFrame,
    alpha: float = 0.5,
    one_minus_alpha: float = 0.5,
    beta: float = 0.3,
    one_minus_beta: float = 0.7,
    key_col: str = "symbol",
    value_col: str = "price",
    order_cols: tuple[str, ...] = ("time", "trade_id"),
) -> DataFrame:
    """Holt's linear-trend (double) exponential smoothing per key:
    level ``l_t = α·y_t + (1−α)·(l_{t−1}+b_{t−1})``, trend
    ``b_t = β·(l_t−l_{t−1}) + (1−β)·b_{t−1}``, one-step-ahead forecast
    ``l_t + b_t``. Seed: l₁ = y₁, b₁ = 0. The same deliberate-
    sequential budget as the Kalman/EWM recurrences: ONE shuffle on the
    key, Arrow-batched applyInPandas, everything else built-in.

    Witness-parity contract: the complements (1−α), (1−β) are passed as
    EXPLICIT literals, never computed — ``1.0 − 0.3`` is
    0.7000000000000001 in binary, and the DuckDB oracle unrolls the
    identical recurrence with the same literal 0.7, so computing the
    complement on either side breaks bit-parity. The reduce is a left
    fold — identical to DuckDB ``list_reduce`` ordered by
    ``order_cols``."""
    cols = [*order_cols, key_col, value_col]

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order_cols)).reset_index(drop=True)
        level = None
        trend = 0.0
        levels, trends, fcs = [], [], []
        for y in pdf[value_col].to_numpy():
            y = float(y)
            if level is None:
                level, trend = y, 0.0
            else:
                prev = level
                level = alpha * y + one_minus_alpha * (prev + trend)
                trend = beta * (level - prev) + one_minus_beta * trend
            levels.append(level)
            trends.append(trend)
            fcs.append(level + trend)
        pdf["hw_level"] = levels
        pdf["hw_trend"] = trends
        pdf["hw_forecast"] = fcs
        return pdf[cols + ["hw_level", "hw_trend", "hw_forecast"]]

    projected = trades.select(*cols)
    out_schema = T.StructType(
        list(projected.schema.fields)
        + [
            T.StructField("hw_level", T.DoubleType()),
            T.StructField("hw_trend", T.DoubleType()),
            T.StructField("hw_forecast", T.DoubleType()),
        ]
    )
    return projected.groupBy(key_col).applyInPandas(compute, out_schema)
