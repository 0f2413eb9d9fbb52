"""G12 — PnL simulation + canary/shadow model comparison.

Reference: /root/reference/src/serving/triton_canary.py:60-96 and
ARCHITECTURE.md:68-79 — simulate PnL for shadow vs canary prediction
sequences over the same price path; reject the canary when the PnL
divergence exceeds 10%.

An ordered per-model scan is a genuine sequential fold, so this is an
``applyInPandas`` per (model) group — models parallelize; the fold is
vectorized numpy inside each group.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pnl_fn(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("time").reset_index(drop=True)
    price = pdf["price"].to_numpy()
    pred = pdf["prediction"].to_numpy()
    # long 1 unit when prediction > 0, short when < 0, flat otherwise;
    # PnL accrues on the next price move
    import numpy as np

    pos = np.sign(pred[:-1])
    pnl = float((pos * (price[1:] - price[:-1])).sum()) if len(price) > 1 else 0.0
    return pd.DataFrame(
        {"model": [pdf["model"].iloc[0]], "pnl": [pnl], "n_trades": [len(pdf)]}
    )


def simulate_pnl(signals: DataFrame) -> DataFrame:
    """signals: (model, time, price, prediction) → (model, pnl, n_trades)."""
    return signals.select("model", "time", "price", "prediction").groupBy(
        "model"
    ).applyInPandas(_pnl_fn, schema="model string, pnl double, n_trades long")


def canary_gate(
    signals: DataFrame,
    shadow: str = "shadow",
    canary: str = "canary",
    max_divergence: float = 0.10,
) -> DataFrame:
    """One row: both PnLs + relative divergence + promote/reject verdict
    (reject when |canary − shadow| > max_divergence · max(|shadow|, ε))."""
    pnl = simulate_pnl(signals)
    s = pnl.filter(F.col("model") == shadow).select(
        F.col("pnl").alias("shadow_pnl")
    )
    c = pnl.filter(F.col("model") == canary).select(
        F.col("pnl").alias("canary_pnl")
    )
    joined = s.crossJoin(c)
    divergence = F.abs(F.col("canary_pnl") - F.col("shadow_pnl")) / F.greatest(
        F.abs(F.col("shadow_pnl")), F.lit(1e-9)
    )
    return joined.select(
        "shadow_pnl",
        "canary_pnl",
        divergence.alias("divergence"),
        (divergence <= max_divergence).alias("promote"),
    )
