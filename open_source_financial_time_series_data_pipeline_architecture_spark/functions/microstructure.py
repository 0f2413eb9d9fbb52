"""Market-microstructure diagnostics over the canonical trades table.

Three classics the reference's feature registry is shaped to grow into
(its A6/A8 large-trade and imbalance features are the first steps of
this family; reference sql/timescaledb_schema.sql:218-239):

- ``volume_bucket_imbalance`` — VPIN-style order-flow toxicity (Easley,
  López de Prado, O'Hara, "Flow Toxicity and Liquidity in a High-
  Frequency World", RFS 2012): partition the tape into equal-VOLUME
  buckets and measure |buy − sell| / total per bucket. Volume clock,
  not wall clock.
- ``effective_spread_stats`` — effective spread 2·|price − mid| vs the
  quoted spread, plus price-improvement share (trades inside the
  quote).
- heartbeat/uptime lives in `statetrack.gap_uptime` (TimescaleDB
  toolkit heartbeat_agg analog).

All pure window/aggregate expressions — one shuffle on symbol each,
whole-stage codegen, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def volume_bucket_imbalance(
    trades: DataFrame, bucket_volume: float = 50.0, trailing: int = 5
) -> DataFrame:
    """Per equal-volume bucket: buy/sell split and the VPIN-style
    imbalance |buy − sell| / total, plus a trailing-``trailing``-bucket
    mean (the VPIN estimate).

    Bucket id = floor(cumulative volume BEFORE the trade / V): a trade
    whose volume straddles a boundary is assigned wholly to the bucket
    it started in (whole-trade assignment — the common simplification;
    sub-trade splitting changes little and costs an explode). One
    running-sum window (incremental growing frame, O(n)) + one hash
    aggregate + one small window over buckets.
    """
    w = Window.partitionBy("symbol").orderBy("time", "trade_id")
    cum_before = F.coalesce(
        F.sum("volume").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0.0),
    )
    bucketed = trades.withColumn(
        "bucket_id", F.floor(cum_before / bucket_volume).cast("long")
    )
    side_vol = lambda s: F.sum(  # noqa: E731
        F.when(F.col("side") == s, F.col("volume")).otherwise(0.0)
    )
    per_bucket = bucketed.groupBy("symbol", "bucket_id").agg(
        F.round(side_vol("buy"), 6).alias("buy_volume"),
        F.round(side_vol("sell"), 6).alias("sell_volume"),
        F.round(F.sum("volume"), 6).alias("total_volume"),
        F.count(F.lit(1)).cast("bigint").alias("n_trades"),
    )
    imb = F.abs(F.col("buy_volume") - F.col("sell_volume")) / F.nullif(
        F.col("total_volume"), F.lit(0.0)
    )
    wb = Window.partitionBy("symbol").orderBy("bucket_id").rowsBetween(
        -(trailing - 1), 0
    )
    return per_bucket.withColumn("imbalance", imb).select(
        "symbol",
        "bucket_id",
        "buy_volume",
        "sell_volume",
        "total_volume",
        "n_trades",
        F.round("imbalance", 6).alias("imbalance"),
        F.round(F.avg("imbalance").over(wb), 6).alias("vpin"),
    )


def effective_spread_stats(trades: DataFrame) -> DataFrame:
    """Per symbol: mean quoted spread, mean effective spread
    (2·|price − mid|), and the share of trades executed strictly inside
    the quoted spread (price improvement). Quote-less rows (NULL
    bid/ask) are excluded — the same null-guard as the A7 feature.
    One filtered hash aggregate.
    """
    mid = (F.col("bid") + F.col("ask")) / 2.0
    eff = 2.0 * F.abs(F.col("price") - mid)
    quoted = F.col("ask") - F.col("bid")
    inside = (F.col("price") > F.col("bid")) & (F.col("price") < F.col("ask"))
    return (
        trades.filter(F.col("bid").isNotNull() & F.col("ask").isNotNull())
        .groupBy("symbol")
        .agg(
            F.round(F.avg(quoted), 6).alias("avg_quoted_spread"),
            F.round(F.avg(eff), 6).alias("avg_effective_spread"),
            F.round(
                F.count(F.when(inside, 1)) / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("price_improvement_rate"),
            F.count(F.lit(1)).cast("bigint").alias("n_quoted_trades"),
        )
    )


def liquidity_measures(trades: DataFrame) -> DataFrame:
    """Three canonical liquidity/impact estimators per symbol, one
    window pass + one hash aggregate:

    - Kyle's lambda (Kyle, Econometrica 1985): regression slope of the
      trade-to-trade price change on signed volume (buy = +v,
      sell = −v; unsigned rows excluded from the regression by NULLing
      the regressor pair).
    - Amihud illiquidity (Amihud, J. Fin. Markets 2002): mean
      |return| / dollar volume, scaled ×1e6 for readability.
    - Roll's implied spread (Roll, J. Finance 1984):
      2·√(−cov(Δp_t, Δp_{t−1})) when the serial covariance is
      negative, else NULL (the model is undefined on positive
      autocovariance).
    """
    w = Window.partitionBy("symbol").orderBy("time", "trade_id")
    dp = F.col("price") - F.lag("price").over(w)
    prev_price = F.lag("price").over(w)
    ret = F.when(
        (F.col("price") > 0) & (prev_price > 0),
        F.log(F.col("price") / prev_price),
    )
    signed_vol = F.when(F.col("side") == "buy", F.col("volume")).when(
        F.col("side") == "sell", -F.col("volume")
    )
    base = (
        trades.withColumn("dp", dp)
        .withColumn("dp_prev", F.lag("dp").over(w))
        .withColumn("ret", ret)
        .withColumn("sv", signed_vol)
        .withColumn("dollar_vol", F.col("price") * F.col("volume"))
    )
    agg = base.groupBy("symbol").agg(
        F.round(F.regr_slope("dp", "sv"), 6).alias("kyle_lambda"),
        F.round(
            F.avg(
                F.when(
                    F.col("dollar_vol") > 0,
                    F.abs(F.col("ret")) / F.col("dollar_vol") * 1e6,
                )
            ),
            6,
        ).alias("amihud_illiq"),
        F.covar_samp("dp", "dp_prev").alias("_serial_cov"),
        F.count(F.lit(1)).cast("bigint").alias("n_trades"),
    )
    roll = F.when(
        F.col("_serial_cov") < 0, 2.0 * F.sqrt(-F.col("_serial_cov"))
    )
    return agg.select(
        "symbol",
        "kyle_lambda",
        "amihud_illiq",
        F.round(roll, 6).alias("roll_spread"),
        "n_trades",
    )


def dollar_bars(trades: DataFrame, threshold: float = 50_000.0) -> DataFrame:
    """Information-driven bar sampling on a DOLLAR clock (López de
    Prado, *Advances in Financial Machine Learning* ch. 2): a new bar
    starts each time cumulative traded dollar value crosses a multiple
    of ``threshold``, so bars carry roughly equal information content
    instead of equal wall-clock time. The reference's continuous
    aggregates are wall-clock only (sql/timescaledb_schema.sql:44-57);
    this is the sampling the ML plane wants on top of the same tape.

    bar_id = floor(cum_dollar_before_this_trade / threshold) — the
    cumulative window sum is computed incrementally per symbol
    partition (one shuffle, O(n)); bar OHLC then falls out of one hash
    aggregate with min_by/max_by struct keys (no second sort).
    """
    w = (
        Window.partitionBy("symbol")
        .orderBy("time", "trade_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pv = F.col("price") * F.col("volume")
    base = trades.withColumn("pv", pv).withColumn(
        "bar_id",
        F.floor((F.sum("pv").over(w) - F.col("pv")) / F.lit(threshold)),
    )
    key = F.struct(F.col("time"), F.col("trade_id"))
    return base.groupBy("symbol", "bar_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_trades"),
        F.min("time").alias("bar_start"),
        F.max("time").alias("bar_end"),
        F.round(F.min_by("price", key), 6).alias("open"),
        F.round(F.max("price"), 6).alias("high"),
        F.round(F.min("price"), 6).alias("low"),
        F.round(F.max_by("price", key), 6).alias("close"),
        F.round(F.sum("pv"), 6).alias("dollar_volume"),
    )


def tick_rule_classification(trades: DataFrame) -> DataFrame:
    """Tick-rule trade-sign inference (the tick test of Lee & Ready,
    JF 1991): an uptick is a buy, a downtick a sell, and a zero tick
    inherits the last non-zero tick direction. Scored per symbol
    against the labeled ``side`` column where present — the validation
    a venue runs before trusting inferred aggressor flags on feeds
    that lack them.

    Two window passes over ONE (symbol, time, trade_id) sort (lag +
    ignore-nulls carry), then a hash aggregate; whole-stage codegen
    throughout.
    """
    w = Window.partitionBy("symbol").orderBy("time", "trade_id")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dp = F.col("price") - F.lag("price").over(w)
    tick = F.when(F.signum(dp) != 0, F.signum(dp))
    base = trades.withColumn("__tick", tick).withColumn(
        "__carried", F.last("__tick", ignorenulls=True).over(wc)
    )
    inferred = (
        F.when(F.col("__carried") > 0, F.lit("buy"))
        .when(F.col("__carried") < 0, F.lit("sell"))
    )
    scored = base.withColumn("__inferred", inferred)
    comparable = F.col("side").isNotNull() & F.col("__inferred").isNotNull()
    return scored.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_trades"),
        F.count("__inferred").cast("bigint").alias("n_inferred"),
        F.count(F.when(comparable, F.lit(1))).cast("bigint").alias("n_comparable"),
        F.count(F.when(F.col("side") == F.col("__inferred"), F.lit(1)))
        .cast("bigint")
        .alias("n_match"),
        F.round(
            F.count(F.when(F.col("side") == F.col("__inferred"), F.lit(1)))
            / F.nullif(
                F.count(F.when(comparable, F.lit(1))).cast("double"), F.lit(0.0)
            ),
            6,
        ).alias("accuracy"),
    )


def epps_realized_correlation(
    trades: DataFrame,
    scales: tuple[int, ...] = (60, 300, 900),
    rets_override: dict[int, DataFrame] | None = None,
) -> DataFrame:
    """Epps effect diagnostic (Epps 1979): realized correlation of every
    symbol pair at several sampling scales — pairwise correlation decays
    toward zero at fine scales because ticks are asynchronous, so a
    cross-asset risk model must pick its sampling width consciously.

    For each scale: close = last price per (symbol, bucket), log return
    per bucket, then an equi-join of the RETURN table with itself on
    bucket (sym_a < sym_b) and corr() per pair. The join input is bars,
    not ticks — |symbols|·|buckets| rows — so the pair join is tiny
    relative to the scan at every SF; output is
    O(|symbols|²·|scales|).
    """
    out = None
    for s in scales:
        if rets_override is not None and s in rets_override:
            # caller-provided per-bucket return frame (the entry layer's
            # cached 1m returns): same bucket arithmetic — truncating
            # unix_timestamp before the /s division never moves the
            # floor for positive times — same max_by close, same
            # guarded log-return expression, so rows are bit-identical
            # to the inline build below.
            rets = rets_override[s].select("symbol", "bucket", "ret").filter(
                F.col("ret").isNotNull()
            )
        else:
            bucket = F.timestamp_seconds(
                (F.floor(F.col("time").cast("double") / s) * s).cast("long")
            )
            bars = (
                trades.withColumn("bucket", bucket)
                .groupBy("symbol", "bucket")
                .agg(
                    F.max_by(
                        "price", F.struct(F.col("time"), F.col("trade_id"))
                    ).alias("close")
                )
            )
            w = Window.partitionBy("symbol").orderBy("bucket")
            prev = F.lag("close").over(w)
            rets = bars.withColumn(
                "ret",
                F.when(
                    (F.col("close") > 0) & (prev > 0),
                    F.log(F.col("close") / prev),
                ),
            ).filter(F.col("ret").isNotNull())
        a = rets.select(
            F.col("symbol").alias("sym_a"), "bucket", F.col("ret").alias("ret_a")
        )
        b = rets.select(
            F.col("symbol").alias("sym_b"), "bucket", F.col("ret").alias("ret_b")
        )
        pairs = (
            a.join(b, "bucket")
            .filter(F.col("sym_a") < F.col("sym_b"))
            .groupBy("sym_a", "sym_b")
            .agg(
                F.round(F.corr("ret_a", "ret_b"), 6).alias("realized_corr"),
                F.count(F.lit(1)).cast("bigint").alias("n_obs"),
            )
            .withColumn("scale_sec", F.lit(s).cast("bigint"))
        )
        out = pairs if out is None else out.unionByName(pairs)
    return out.select("sym_a", "sym_b", "scale_sec", "realized_corr", "n_obs")


def quote_revision_imbalance(
    trades: DataFrame, bucket_seconds: int = 1800
) -> DataFrame:
    """Quote-revision (midpoint uptick/downtick) imbalance per
    (symbol, bucket): the price-only order-flow-pressure proxy when
    quoted sizes are unavailable (this feed quotes prices only —
    schema.py bid/ask). Rows lacking either quote are excluded BEFORE
    the lag, so revisions compare consecutive *valid* quotes.

    One symbol-partitioned window pass + one hash aggregate.
    """
    q = trades.filter(F.col("bid").isNotNull() & F.col("ask").isNotNull())
    mid = (F.col("bid") + F.col("ask")) / 2.0
    w = Window.partitionBy("symbol").orderBy("time", "trade_id")
    base = q.withColumn("mid", mid).withColumn(
        "dmid", F.col("mid") - F.lag("mid").over(w)
    )
    bucket = F.timestamp_seconds(
        (
            F.floor(F.col("time").cast("double") / bucket_seconds)
            * bucket_seconds
        ).cast("long")
    )
    g = (
        base.filter(F.col("dmid").isNotNull())
        .withColumn("bucket", bucket)
        .groupBy("symbol", "bucket")
        .agg(
            F.sum(F.when(F.col("dmid") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_up"),
            F.sum(F.when(F.col("dmid") < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_down"),
            F.count(F.lit(1)).cast("bigint").alias("n_revisions"),
        )
    )
    denom = (F.col("n_up") + F.col("n_down")).cast("double")
    return g.withColumn(
        "revision_imbalance",
        F.round(
            F.when(denom > 0, (F.col("n_up") - F.col("n_down")) / denom), 6
        ),
    )


def volatility_signature(
    trades: DataFrame, scales: tuple[int, ...] = (60, 300, 900)
) -> DataFrame:
    """Volatility signature plot (Andersen, Bollerslev, Diebold & Labys
    2000): realized variance per symbol at several sampling scales —
    microstructure noise inflates RV at fine scales, so the plateau
    locates the unbiased sampling frequency (the same diagnostic role
    the Epps curve plays for correlations).

    Per scale: one bar aggregate + one window pass + one symbol
    aggregate — bars only, never tick-level joins.
    """
    out = None
    for s in scales:
        bucket = F.timestamp_seconds(
            (F.floor(F.col("time").cast("double") / s) * s).cast("long")
        )
        bars = (
            trades.withColumn("bucket", bucket)
            .groupBy("symbol", "bucket")
            .agg(
                F.max_by(
                    "price", F.struct(F.col("time"), F.col("trade_id"))
                ).alias("close")
            )
        )
        w = Window.partitionBy("symbol").orderBy("bucket")
        prev = F.lag("close").over(w)
        ret = F.when(
            (F.col("close") > 0) & (prev > 0), F.log(F.col("close") / prev)
        )
        g = (
            bars.withColumn("ret", ret)
            .filter(F.col("ret").isNotNull())
            .groupBy("symbol")
            .agg(
                F.round(F.sum(F.col("ret") * F.col("ret")), 6).alias(
                    "realized_var"
                ),
                F.round(F.avg(F.abs("ret")), 6).alias("mean_abs_ret"),
                F.count(F.lit(1)).cast("bigint").alias("n_returns"),
            )
            .withColumn("scale_sec", F.lit(s).cast("bigint"))
        )
        out = g if out is None else out.unionByName(g)
    return out.select(
        "symbol", "scale_sec", "realized_var", "mean_abs_ret", "n_returns"
    )


def side_runs_test(trades: DataFrame) -> DataFrame:
    """Wald-Wolfowitz runs test on the buy/sell sequence per symbol:
    too few runs ⇒ herding/momentum in order flow, too many ⇒
    contrarian alternation. z = (R − μ)/σ with the exact two-sample
    runs moments. Unsigned rows are excluded before the lag. One
    window pass + one aggregate.
    """
    s = trades.filter(F.col("side").isNotNull())
    w = Window.partitionBy("symbol").orderBy("time", "trade_id")
    prev = F.lag("side").over(w)
    run_start = F.when(
        prev.isNull() | (F.col("side") != prev), 1
    ).otherwise(0)
    base = s.withColumn("run_start", run_start)
    agg = base.groupBy("symbol").agg(
        F.sum("run_start").cast("bigint").alias("n_runs"),
        F.sum(F.when(F.col("side") == "buy", 1).otherwise(0))
        .cast("bigint")
        .alias("n_buy"),
        F.sum(F.when(F.col("side") == "sell", 1).otherwise(0))
        .cast("bigint")
        .alias("n_sell"),
    )
    n1 = F.col("n_buy").cast("double")
    n2 = F.col("n_sell").cast("double")
    n = n1 + n2
    mu = 2.0 * n1 * n2 / n + 1.0
    var = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / (n * n * (n - 1.0))
    )
    z = F.when(var > 0, (F.col("n_runs") - mu) / F.sqrt(var))
    return agg.select(
        "symbol",
        "n_runs",
        "n_buy",
        "n_sell",
        F.round(mu, 6).alias("expected_runs"),
        F.round(z, 6).alias("runs_z"),
    )


def hawkes_intensity(
    trades: DataFrame,
    mu: float = 0.1,
    alpha: float = 0.3,
    beta: float = 0.05,
) -> DataFrame:
    """Self-exciting (Hawkes) arrival intensity at each trade time with
    an exponential kernel (Hawkes, Biometrika 1971; the standard model
    for order-flow clustering): λ(tᵢ) = μ + gᵢ where the excitation
    state folds as g₁ = 0, gᵢ = (gᵢ₋₁ + α)·e^{−β·(tᵢ − tᵢ₋₁)}.

    Like the EWM/GARCH features this is an exact O(n) recurrence per
    symbol (the naive definition is an O(n²) sum over all prior
    trades); parameter fitting is offline MLE, filtering with fixed
    (μ, α, β) is the per-event production op — the real-time "is flow
    clustering right now" signal feeding the same alerting plane as the
    CEP large-trade detector. Timestamps enter as fractional epoch
    seconds (µs precision — matches DuckDB epoch()).

    Scale: sequential within a symbol, symbols parallelize; state is
    two doubles per group.
    """
    import math

    import pandas as pd

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["t", "trade_id"]).reset_index(drop=True)
        g = 0.0
        prev_t = None
        out = []
        for t in pdf["t"].to_numpy(dtype=float):
            if prev_t is not None:
                g = (g + alpha) * math.exp(-beta * (t - prev_t))
            out.append(mu + g)
            prev_t = t
        pdf["hawkes_intensity"] = out
        return pdf[["symbol", "trade_id", "hawkes_intensity"]]

    rows = (
        trades.select(
            "symbol", "trade_id", F.col("time").cast("double").alias("t")
        )
        .groupBy("symbol")
        .applyInPandas(
            compute,
            schema="symbol string, trade_id string, hawkes_intensity double",
        )
    )
    return rows.select(
        "symbol",
        "trade_id",
        F.round("hawkes_intensity", 6).alias("hawkes_intensity"),
    )


def lee_ready_classification(trades: DataFrame) -> DataFrame:
    """Lee–Ready (J. Finance 1991) aggressor-side inference scored
    against the labeled side column — the quote rule (trade above/below
    the prevailing midquote) with tick-rule fallback for at-mid trades
    and quoteless rows; the standard upgrade over the pure tick rule
    (`tick_rule_classification`).

    Midquote comparisons are exact doubles: both engines derive
    bid/ask/price from the same canonical mapping, so price = mid
    resolves identically (no epsilon — an epsilon would just move the
    boundary, and parity holds either way).

    One window pass (tick sign + carried last non-null) and one hash
    aggregate per symbol; all built-in expressions.
    """
    w = Window.partitionBy("symbol").orderBy("time", "trade_id")
    wg = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dp = F.col("price") - F.lag("price").over(w)
    tick = F.when(dp > 0, F.lit(1.0)).when(dp < 0, F.lit(-1.0))
    mid = F.when(
        F.col("bid").isNotNull() & F.col("ask").isNotNull(),
        (F.col("bid") + F.col("ask")) / F.lit(2.0),
    )
    base = (
        trades.withColumn("_tick", tick)
        .withColumn("_carried", F.last("_tick", ignorenulls=True).over(wg))
        .withColumn("_mid", mid)
    )
    quote_side = F.when(F.col("price") > F.col("_mid"), "buy").when(
        F.col("price") < F.col("_mid"), "sell"
    )
    tick_side = F.when(F.col("_carried") > 0, "buy").when(
        F.col("_carried") < 0, "sell"
    )
    classified = base.withColumn("_qside", quote_side).withColumn(
        "inferred", F.coalesce(F.col("_qside"), tick_side)
    )
    comparable = F.col("side").isNotNull() & F.col("inferred").isNotNull()
    return classified.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_trades"),
        F.count("_qside").cast("bigint").alias("n_quote_rule"),
        F.count(
            F.when(F.col("_qside").isNull() & F.col("inferred").isNotNull(), 1)
        )
        .cast("bigint")
        .alias("n_tick_rule"),
        F.count(F.when(comparable, 1)).cast("bigint").alias("n_comparable"),
        F.count(F.when(F.col("side") == F.col("inferred"), 1))
        .cast("bigint")
        .alias("n_match"),
        F.round(
            F.count(F.when(F.col("side") == F.col("inferred"), 1))
            / F.nullif(
                F.count(F.when(comparable, 1)).cast("double"), F.lit(0.0)
            ),
            6,
        ).alias("accuracy"),
    )


def lee_ready_prevailing_labels(trades: DataFrame) -> DataFrame:
    """Per-trade Lee–Ready labels under the PREVAILING-quote convention
    (price vs the PREVIOUS trade's midquote; at-mid/quoteless rows fall
    back to the carried zero-tick direction). Returns one row per trade
    with the inferred ``cls`` — the row-level form the aggregate query
    and the streaming keyed-state classifier (streaming/cep.py
    streaming_lee_ready) must both reproduce exactly.

    One window pass: lag(mid), lag(price) and the growing ignore-nulls
    last() share a single (symbol, time, trade_id) sort."""
    w = Window.partitionBy("symbol").orderBy("time", "trade_id")
    wg = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mid_prev = F.lag((F.col("bid") + F.col("ask")) / 2).over(w)
    dp = F.col("price") - F.lag("price").over(w)
    base = trades.select(
        "symbol",
        "time",
        "trade_id",
        "price",
        "side",
        mid_prev.alias("mid_prev"),
        F.last(
            F.when(dp > 0, F.lit(1)).when(dp < 0, F.lit(-1)), ignorenulls=True
        )
        .over(wg)
        .alias("tickdir"),
    )
    cls = (
        F.when(
            F.col("mid_prev").isNotNull() & (F.col("price") > F.col("mid_prev")),
            F.lit("buy"),
        )
        .when(
            F.col("mid_prev").isNotNull() & (F.col("price") < F.col("mid_prev")),
            F.lit("sell"),
        )
        .when(F.col("tickdir") == 1, F.lit("buy"))
        .when(F.col("tickdir") == -1, F.lit("sell"))
    )
    return base.withColumn("cls", cls)
