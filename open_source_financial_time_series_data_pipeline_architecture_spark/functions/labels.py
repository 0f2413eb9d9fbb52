"""Supervised-learning label construction over bar series — the
training-data plane's "y column" factory.

``triple_barrier`` implements the triple-barrier labeling method
(López de Prado, *Advances in Financial Machine Learning* ch. 3): for
each bar, look at the next ``horizon`` bars and label +1 if the upper
profit-taking barrier is touched first, −1 if the lower stop-loss
barrier is touched first, 0 if neither is touched within the horizon.
The reference stops at feature materialization
(spark/batch_feature_calculation.py); labels are the natural next
table its feature registry would feed a trainer with.

Physical strategy: the forward price path is materialized per row as a
bounded ``collect_list`` over a ROWS BETWEEN 1 FOLLOWING AND h
FOLLOWING frame — a fixed-width sliding frame Spark's window operator
maintains incrementally (O(n·h) per partition, one shuffle on symbol).
Barrier hits are then pure array expressions (`transform` +
`array_position`), whole-stage codegen, no UDF. At 100 TB the state per
row is h doubles — bounded by contract, never the whole partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def triple_barrier(
    bars: DataFrame,
    horizon: int = 10,
    up_pct: float = 0.002,
    dn_pct: float = 0.002,
    price_col: str = "close",
    order_col: str = "bucket",
) -> DataFrame:
    """Label each bar by which barrier its next-``horizon`` closes touch
    first. Only rows with a full forward window are emitted (the tail
    of each symbol's series has no defined label).

    Output: (symbol, bucket, close, up_idx, dn_idx, label,
    horizon_ret) where up_idx/dn_idx are the 1-based offset of the
    first touch (0 = never) and horizon_ret the full-horizon return.
    """
    w = (
        Window.partitionBy("symbol")
        .orderBy(order_col)
        .rowsBetween(1, horizon)
    )
    p = F.col(price_col)
    base = (
        bars.withColumn("future", F.collect_list(price_col).over(w))
        .filter(F.size("future") == horizon)
        .withColumn("up_lvl", p * (1.0 + up_pct))
        .withColumn("dn_lvl", p * (1.0 - dn_pct))
    )
    # `future` / `up_lvl` / `dn_lvl` are projected columns, so the
    # lambdas do not re-evaluate upstream expressions (CLAUDE.md).
    up_idx = F.array_position(
        F.transform("future", lambda x: x >= F.col("up_lvl")), F.lit(True)
    )
    dn_idx = F.array_position(
        F.transform("future", lambda x: x <= F.col("dn_lvl")), F.lit(True)
    )
    labeled = base.withColumn("up_idx", up_idx).withColumn("dn_idx", dn_idx)
    label = (
        F.when(
            (F.col("up_idx") > 0)
            & ((F.col("dn_idx") == 0) | (F.col("up_idx") < F.col("dn_idx"))),
            F.lit(1),
        )
        .when(
            (F.col("dn_idx") > 0)
            & ((F.col("up_idx") == 0) | (F.col("dn_idx") < F.col("up_idx"))),
            F.lit(-1),
        )
        .otherwise(F.lit(0))
    )
    horizon_ret = F.when(
        p > 0, F.element_at("future", horizon) / p - 1.0
    )
    return labeled.select(
        "symbol",
        F.col(order_col),
        F.round(p, 6).alias(price_col),
        F.col("up_idx").cast("bigint").alias("up_idx"),
        F.col("dn_idx").cast("bigint").alias("dn_idx"),
        label.cast("int").alias("label"),
        F.round(horizon_ret, 6).alias("horizon_ret"),
    )
