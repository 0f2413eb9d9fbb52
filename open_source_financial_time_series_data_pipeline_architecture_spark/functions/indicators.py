"""Technical indicators beyond the reference's 11-feature contract —
the indicator family its feature registry is designed to grow into
(reference src/features/smartdb_contract.py keeps the list open-ended;
sql/timescaledb_schema.sql's continuous aggregates are the same
window-over-time shape).

All pure window/aggregate expressions (whole-stage codegen, one shuffle
on symbol per indicator); deterministic ordering by (time, trade_id)
per the repo convention.

Scale: each indicator is ONE window pass over the symbol partition —
trailing-row frames are computed incrementally by Spark's window
operator (UNBOUNDED PRECEDING and fixed-width trailing frames are both
O(n) per partition; see CLAUDE.md note on leading frames, avoided
here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _w(symbol_col: str = "symbol"):
    return Window.partitionBy(symbol_col).orderBy("time", "trade_id")


def max_drawdown(trades: DataFrame) -> DataFrame:
    """Per-symbol maximum drawdown magnitude: max over t of
    1 − price_t / runmax_t (0.0 where the running max is 0 — sf0.1 has
    price=0 rows; the guard keeps both engines off divide-by-zero).

    The running max is an incremental growing frame: one window pass +
    one hash aggregate.
    """
    runmax = F.max("price").over(
        _w().rowsBetween(Window.unboundedPreceding, 0)
    )
    dd = F.when(runmax > 0, 1 - F.col("price") / runmax).otherwise(F.lit(0.0))
    return (
        trades.withColumn("dd", dd)
        .groupBy("symbol")
        .agg(F.round(F.max("dd"), 6).alias("max_drawdown"))
    )


def rsi(trades: DataFrame, n: int = 14) -> DataFrame:
    """Simple (SMA-based) RSI over a trailing n-delta frame.

    delta = price − lag(price); RSI = 100·avg_gain/(avg_gain+avg_loss)
    over the last n deltas. All-gain windows hit the loss=0 branch — it
    is made explicit (100.0) so both engines agree instead of relying
    on divide-by-zero semantics.
    """
    w = _w()
    frame = w.rowsBetween(-(n - 1), 0)
    delta = F.col("price") - F.lag("price").over(w)
    out = (
        trades.withColumn("delta", delta)
        .withColumn("gain", F.greatest(F.col("delta"), F.lit(0.0)))
        .withColumn("loss", F.greatest(-F.col("delta"), F.lit(0.0)))
        .withColumn("avg_gain", F.avg("gain").over(frame))
        .withColumn("avg_loss", F.avg("loss").over(frame))
    )
    rsi_col = F.when(F.col("avg_gain").isNull(), None).otherwise(
        F.when(F.col("avg_loss") == 0.0, 100.0).otherwise(
            100.0 * F.col("avg_gain") / (F.col("avg_gain") + F.col("avg_loss"))
        )
    )
    return out.select(
        "symbol",
        "trade_id",
        F.round(rsi_col, 6).alias(f"rsi_{n}"),
    )


def bollinger(trades: DataFrame, n: int = 20, k: float = 2.0) -> DataFrame:
    """Bollinger bands over a trailing n-row frame; rows emitted only
    once the frame is FULL (count == n) so the sample stddev is always
    defined and both engines agree on the band values."""
    frame = _w().rowsBetween(-(n - 1), 0)
    mid = F.avg("price").over(frame)
    sd = F.stddev_samp("price").over(frame)
    cnt = F.count("price").over(frame)
    return (
        trades.select(
            "symbol",
            "trade_id",
            F.round(mid, 6).alias("mid"),
            F.round(mid + k * sd, 6).alias("upper"),
            F.round(mid - k * sd, 6).alias("lower"),
            cnt.alias("__cnt"),
        )
        .filter(F.col("__cnt") == n)
        .drop("__cnt")
    )


def obv(trades: DataFrame) -> DataFrame:
    """On-balance volume: running sum of volume signed by the price
    delta's direction (first row contributes 0)."""
    w = _w()
    delta = F.col("price") - F.lag("price").over(w)
    signed = (
        F.when(delta > 0, F.col("volume"))
        .when(delta < 0, -F.col("volume"))
        .otherwise(0.0)
    )
    run = _w().rowsBetween(Window.unboundedPreceding, 0)
    return trades.withColumn("signed", signed).select(
        "symbol",
        "trade_id",
        F.round(F.sum("signed").over(run), 6).alias("obv"),
    )


def pairwise_minute_correlation(trades: DataFrame) -> DataFrame:
    """Pearson correlation of per-minute mean prices for every symbol
    pair (sym_a < sym_b) over buckets where BOTH traded.

    Shape: O(|symbols|²) output but the join input is the minute-bucket
    aggregate — |buckets|·|symbols| rows, tiny relative to trades — so
    the self-join is a bucket-key equi-join of pre-aggregated data, and
    at production symbol counts the per-pair corr is a hash aggregate
    over aligned buckets (no all-trades shuffle beyond the first agg).
    """
    per_min = trades.groupBy(
        F.floor(F.col("time").cast("double") / 60).alias("bucket"),
        "symbol",
    ).agg(F.avg("price").alias("px"))
    a = per_min.select(
        "bucket", F.col("symbol").alias("sym_a"), F.col("px").alias("px_a")
    )
    b = per_min.select(
        "bucket", F.col("symbol").alias("sym_b"), F.col("px").alias("px_b")
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("sym_a") < F.col("sym_b"))
        .groupBy("sym_a", "sym_b")
        .agg(
            F.round(F.corr("px_a", "px_b"), 6).alias("price_corr"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
    )


def candlestick_patterns(bars: DataFrame, doji_ratio: float = 0.1) -> DataFrame:
    """Per-bar candlestick pattern flags over OHLC bars: doji (body no
    larger than ``doji_ratio`` of the range) and bullish/bearish
    engulfing (current body swallows the previous bar's opposite-signed
    body).

    Input: OHLC bars (bucket, symbol, open, high, low, close) — child
    buckets unique per symbol so lag ordering is deterministic without a
    tiebreak. One window pass (lag only), all comparisons codegen'd;
    first bar per symbol has no engulfing flags (NULL lag → false).
    """
    w = Window.partitionBy("symbol").orderBy("bucket")
    po, pc = F.lag("open").over(w), F.lag("close").over(w)
    body = F.col("close") - F.col("open")
    rng = F.col("high") - F.col("low")
    doji = (rng > 0) & (F.abs(body) <= doji_ratio * rng)
    bullish = (
        (pc < po)
        & (body > 0)
        & (F.col("open") <= pc)
        & (F.col("close") >= po)
    )
    bearish = (
        (pc > po)
        & (body < 0)
        & (F.col("open") >= pc)
        & (F.col("close") <= po)
    )
    return bars.select(
        "bucket",
        "symbol",
        doji.alias("doji"),
        F.coalesce(bullish, F.lit(False)).alias("bullish_engulfing"),
        F.coalesce(bearish, F.lit(False)).alias("bearish_engulfing"),
    )


def atr(bars: DataFrame, n: int = 14) -> DataFrame:
    """Average True Range with Wilder smoothing over OHLC bars.

    true range = greatest(high−low, |high−prev_close|, |low−prev_close|)
    (first bar: high−low); ATR is the exact Wilder recurrence
    ``atr = atr_prev + (tr − atr_prev)/n`` seeded with the first bar's
    TR. The recurrence is genuinely sequential per symbol, so it runs as
    ONE Arrow-batched applyInPandas pass (same kernel contract as
    `functions.features.ewm`) — bit-identical to a DuckDB list_reduce
    fold because both sides evaluate ``acc + (x − acc)/n`` in doubles.

    Scale: sequential only within a symbol; symbols parallelize. Input
    is bars (≥60× smaller than trades), so per-group state is bounded.
    """
    import pandas as pd

    nf = float(n)

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket").reset_index(drop=True)
        prev_close = pdf["close"].shift(1)
        tr = pd.concat(
            [
                pdf["high"] - pdf["low"],
                (pdf["high"] - prev_close).abs(),
                (pdf["low"] - prev_close).abs(),
            ],
            axis=1,
        ).max(axis=1)
        acc = None
        out = []
        for x in tr.to_numpy():
            x = float(x)
            acc = x if acc is None else acc + (x - acc) / nf
            out.append(acc)
        pdf["atr"] = out
        return pdf[["symbol", "bucket", "atr"]]

    rows = (
        bars.select("symbol", "bucket", "high", "low", "close")
        .groupBy("symbol")
        .applyInPandas(compute, schema="symbol string, bucket timestamp, atr double")
    )
    return rows.select(
        "symbol", "bucket", F.round("atr", 6).alias(f"atr_{n}")
    )


def macd(
    trades: DataFrame,
    alpha_fast: float = 0.15,
    alpha_slow: float = 0.075,
    alpha_signal: float | None = None,
) -> DataFrame:
    """MACD line: EMA_fast(price) − EMA_slow(price), both the exact
    recurrence y = α·x + (1−α)·y seeded with the first price (same
    kernel contract as `functions.features.ewm`, bit-identical to a
    DuckDB list_reduce fold).

    With ``alpha_signal`` set, the signal line (EMA of the raw macd
    series, seeded with the first macd value) and histogram
    (macd − signal) are emitted too — a recurrence OVER a recurrence,
    still ONE applyInPandas pass and one symbol shuffle total.
    Sequential only within a symbol; symbols parallelize.
    """
    import pandas as pd

    bf, bs = 1.0 - alpha_fast, 1.0 - alpha_slow
    asig = alpha_signal
    bsig = None if asig is None else 1.0 - asig

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["time", "trade_id"]).reset_index(drop=True)
        fast = slow = sig = None
        out, sig_out = [], []
        for x in pdf["price"].to_numpy():
            x = float(x)
            fast = x if fast is None else alpha_fast * x + bf * fast
            slow = x if slow is None else alpha_slow * x + bs * slow
            m = fast - slow
            out.append(m)
            if asig is not None:
                sig = m if sig is None else asig * m + bsig * sig
                sig_out.append(sig)
        # raw values out; rounding happens with F.round downstream (the
        # repo's Spark-round ≡ DuckDB-ROUND convention — Python round()
        # is half-even and would diverge)
        pdf["macd"] = out
        if asig is not None:
            pdf["signal"] = sig_out
            return pdf[["symbol", "trade_id", "macd", "signal"]]
        return pdf[["symbol", "trade_id", "macd"]]

    if asig is None:
        rows = (
            trades.select("time", "symbol", "trade_id", "price")
            .groupBy("symbol")
            .applyInPandas(
                compute, schema="symbol string, trade_id string, macd double"
            )
        )
        return rows.select("symbol", "trade_id", F.round("macd", 6).alias("macd"))
    rows = (
        trades.select("time", "symbol", "trade_id", "price")
        .groupBy("symbol")
        .applyInPandas(
            compute,
            schema="symbol string, trade_id string, macd double, signal double",
        )
    )
    return rows.select(
        "symbol",
        "trade_id",
        F.round("macd", 6).alias("macd"),
        F.round("signal", 6).alias("signal"),
        F.round(F.col("macd") - F.col("signal"), 6).alias("histogram"),
    )


def return_autocorrelation(bars: DataFrame, lag: int = 1) -> DataFrame:
    """Per-symbol lag-k autocorrelation of 1-minute log close returns —
    the mean-reversion/momentum diagnostic quants run next to the A4
    volatility feature (reference sql/timescaledb_schema.sql:141-158
    computes the same log returns; the autocorrelation is the natural
    follow-on statistic).

    Input: OHLC bars (bucket, symbol, close). Log returns guard
    close > 0 on BOTH the numerator and the lagged denominator
    explicitly (sf0.1 has price=0 rows; ANSI off means ln() would go
    NULL silently — the guard makes the semantics engine-portable).
    One window pass for returns + the lagged return, then corr() per
    symbol — a single shuffle on symbol.
    """
    w = Window.partitionBy("symbol").orderBy("bucket")
    prev_close = F.lag("close").over(w)
    ret = F.when(
        (F.col("close") > 0) & (prev_close > 0),
        F.log(F.col("close") / prev_close),
    )
    with_ret = bars.withColumn("ret", ret)
    ret_lagged = F.lag("ret", lag).over(w)
    return (
        with_ret.withColumn("ret_prev", ret_lagged)
        .filter(F.col("ret").isNotNull() & F.col("ret_prev").isNotNull())
        .groupBy("symbol")
        .agg(
            F.round(F.corr("ret", "ret_prev"), 6).alias("autocorr"),
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        )
    )


def hurst_exponent(
    bars: DataFrame, scales: tuple[int, ...] = (1, 2, 4, 8, 16)
) -> DataFrame:
    """Hurst exponent per symbol via the variance-of-aggregated-returns
    method: for a self-affine process, Var[r_k] ~ k^(2H), so H is half
    the OLS slope of ln Var[r_k] on ln k across scales k (in minute
    BARS — row offsets on the per-symbol minute series; calendar gaps
    are deliberately row-counted, documented). H≈0.5 random walk,
    >0.5 trending, <0.5 mean-reverting — the regime diagnostic behind
    the reference's regime_tag feature (A9).

    One sort per symbol computes all k lags (same window spec → Spark
    reuses the single shuffle+sort), then one hash aggregate takes the
    five variances and the regression slope is closed-form constant
    arithmetic. Null H when any scale's variance is non-positive.
    """
    import math

    w = Window.partitionBy("symbol").orderBy("bucket")
    lnp = F.when(F.col("close") > 0, F.log("close"))
    base = bars.withColumn("lnp", lnp)
    for k in scales:
        base = base.withColumn(f"r_{k}", F.col("lnp") - F.lag("lnp", k).over(w))
    aggs = [
        F.var_samp(f"r_{k}").alias(f"v_{k}") for k in scales
    ] + [F.count(F.lit(1)).cast("bigint").alias("n_bars")]
    per_sym = base.groupBy("symbol").agg(*aggs)
    # OLS slope of ln(v_k) on ln(k): slope = sum(c_k * ln(v_k)) with
    # centered-x constants c_k — computed once here; oracle SQL embeds
    # the identical literals (hurst_slope_coeffs).
    coeffs = hurst_slope_coeffs(scales)
    valid = None
    for k in scales:
        cond = F.col(f"v_{k}") > 0
        valid = cond if valid is None else (valid & cond)
    slope = None
    for k, c in zip(scales, coeffs):
        term = F.lit(c) * F.log(F.col(f"v_{k}"))
        slope = term if slope is None else (slope + term)
    h = F.when(valid, slope / 2.0)
    return per_sym.select(
        "symbol",
        "n_bars",
        *[F.round(F.col(f"v_{k}"), 6).alias(f"var_{k}m") for k in scales],
        F.round(h, 6).alias("hurst"),
    )


def hurst_slope_coeffs(scales: tuple[int, ...]) -> list[float]:
    """Centered-x OLS coefficients: slope = Σ c_i·y_i with
    c_i = (x_i − x̄)/Σ(x_j − x̄)², x_i = ln(scale_i)."""
    import math

    xs = [math.log(float(k)) for k in scales]
    xbar = sum(xs) / len(xs)
    sxx = sum((x - xbar) ** 2 for x in xs)
    return [(x - xbar) / sxx for x in xs]


def bipower_jump_stats(bars: DataFrame) -> DataFrame:
    """Realized-variance jump decomposition per symbol (Barndorff-
    Nielsen & Shephard 2004): RV = Σ r², bipower variation
    BV = (π/2)·Σ|r_t||r_{t−1}| (robust to jumps), jump component
    J = max(0, RV − BV) and the relative jump share J/RV.

    The reference's volatility feature (sql/timescaledb_schema.sql:
    141-158) is plain realized vol; this is its diffusion-vs-jump
    split — the standard next diagnostic on the same log returns.

    Input: 1-minute bars (bucket, symbol, close). One window pass for
    (ret, prev ret), one hash aggregate per symbol — single shuffle.
    """
    import math

    w = Window.partitionBy("symbol").orderBy("bucket")
    prev_close = F.lag("close").over(w)
    ret = F.when(
        (F.col("close") > 0) & (prev_close > 0),
        F.log(F.col("close") / prev_close),
    )
    with_ret = bars.withColumn("ret", ret)
    base = with_ret.withColumn("ret_prev", F.lag("ret").over(w))
    agg = base.groupBy("symbol").agg(
        F.sum(F.col("ret") * F.col("ret")).alias("_rv"),
        (
            F.lit(math.pi / 2.0)
            * F.sum(F.abs("ret") * F.abs("ret_prev"))
        ).alias("_bv"),
        F.count("ret").cast("bigint").alias("n_returns"),
    )
    # explicit null guard: Spark's greatest() IGNORES nulls (would turn
    # an undefined BV into jump=0), while the oracle must see NULL —
    # keep both engines on the same CASE semantics
    jump = F.when(
        F.col("_rv").isNotNull() & F.col("_bv").isNotNull(),
        F.greatest(F.lit(0.0), F.col("_rv") - F.col("_bv")),
    )
    return agg.select(
        "symbol",
        F.round("_rv", 6).alias("realized_var"),
        F.round("_bv", 6).alias("bipower_var"),
        F.round(jump, 6).alias("jump_var"),
        F.round(
            F.when(F.col("_rv") > 0, jump / F.col("_rv")), 6
        ).alias("jump_share"),
        "n_returns",
    )


def ulcer_index(bars: DataFrame) -> DataFrame:
    """Ulcer index per symbol (Martin & McCann 1989): RMS percentage
    drawdown from the running peak of the close series — the
    downside-risk companion to `max_drawdown` (which reports only the
    single worst excursion; the ulcer index integrates ALL of them).

    One growing-frame window pass (running max — incremental O(n)),
    then one hash aggregate. Peaks guard close > 0 (sf0.1 has
    price=0 rows).
    """
    w = (
        Window.partitionBy("symbol")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    peak = F.max("close").over(w)
    dd_pct = F.when(peak > 0, (F.col("close") - peak) / peak * 100.0)
    base = bars.withColumn("dd_pct", dd_pct)
    return base.groupBy("symbol").agg(
        F.round(F.sqrt(F.avg(F.col("dd_pct") * F.col("dd_pct"))), 6).alias(
            "ulcer_index"
        ),
        F.round(F.min("dd_pct"), 6).alias("worst_dd_pct"),
        F.count("dd_pct").cast("bigint").alias("n_bars"),
    )


def permutation_entropy(bars: DataFrame) -> DataFrame:
    """Order-3 permutation entropy per symbol (Bandt & Pompe, PRL
    2002): classify each consecutive close triple into one of six
    ordinal patterns, then take the Shannon entropy of the pattern
    distribution, normalized by ln(6) into [0, 1] (1 = white noise,
    0 = monotone). A complexity/regime diagnostic computed with two
    lags + a CASE ladder — no UDF.

    Tie policy: the first-match CASE ladder below resolves equal
    closes deterministically (earlier index wins), identically in
    Spark and any ANSI engine — keep the ladder order in lockstep
    with the oracle SQL.
    """
    import math

    w = Window.partitionBy("symbol").orderBy("bucket")
    c2 = F.col("close")
    c1 = F.lag("close", 1).over(w)
    c0 = F.lag("close", 2).over(w)
    pattern = (
        F.when(c0.isNull() | c1.isNull(), None)
        .when((c0 <= c1) & (c1 <= c2), "012")
        .when((c0 <= c2) & (c2 < c1), "021")
        .when((c1 < c0) & (c0 <= c2), "102")
        .when((c1 <= c2) & (c2 < c0), "120")
        .when((c2 < c0) & (c0 <= c1), "201")
        .otherwise("210")
    )
    pats = bars.withColumn("pattern", pattern).filter(
        F.col("pattern").isNotNull()
    )
    counts = pats.groupBy("symbol", "pattern").agg(
        F.count(F.lit(1)).alias("n_pat")
    )
    totals = counts.groupBy("symbol").agg(F.sum("n_pat").alias("n_triples"))
    p = F.col("n_pat") / F.col("n_triples")
    return (
        counts.join(totals, "symbol")
        .groupBy("symbol")
        .agg(
            F.round(
                -F.sum(p * F.log(p)) / F.lit(math.log(6.0)), 6
            ).alias("perm_entropy"),
            F.max("n_triples").cast("bigint").alias("n_triples"),
            F.count(F.lit(1)).cast("bigint").alias("n_patterns"),
        )
    )


def realized_moments(bars: DataFrame) -> DataFrame:
    """Realized skewness and kurtosis per symbol (Amaya, Christoffersen,
    Jacobs & Vasquez, JFE 2015): higher moments of the intraday
    log-return distribution from power sums —
    RSkew = √n·Σr³ / RV^{3/2}, RKurt = n·Σr⁴ / RV² — the tail-risk
    companions to the A4 realized-variance feature.

    Explicit power sums (not the engines' skewness()/kurtosis(), whose
    sample-correction conventions differ) so Spark and any ANSI oracle
    compute bit-comparable values. One window pass + one hash agg.
    """
    w = Window.partitionBy("symbol").orderBy("bucket")
    prev_close = F.lag("close").over(w)
    ret = F.when(
        (F.col("close") > 0) & (prev_close > 0),
        F.log(F.col("close") / prev_close),
    )
    base = bars.withColumn("ret", ret).filter(F.col("ret").isNotNull())
    agg = base.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_returns"),
        F.sum(F.pow("ret", F.lit(2))).alias("_s2"),
        F.sum(F.pow("ret", F.lit(3))).alias("_s3"),
        F.sum(F.pow("ret", F.lit(4))).alias("_s4"),
    )
    n = F.col("n_returns").cast("double")
    rv = F.col("_s2")
    rskew = F.when(rv > 0, F.sqrt(n) * F.col("_s3") / F.pow(rv, F.lit(1.5)))
    rkurt = F.when(rv > 0, n * F.col("_s4") / (rv * rv))
    return agg.select(
        "symbol",
        "n_returns",
        F.round(rv, 6).alias("realized_var"),
        F.round(rskew, 6).alias("realized_skew"),
        F.round(rkurt, 6).alias("realized_kurt"),
    )


def garch11_vol(
    bars: DataFrame,
    omega: float = 1e-6,
    alpha: float = 0.1,
    beta: float = 0.85,
) -> DataFrame:
    """GARCH(1,1) conditional-volatility filter with fixed canonical
    parameters (Bollerslev, J. Econometrics 1986) over per-symbol
    minute-bar log returns: h ← ω + α·r² + β·h, seeded with the first
    squared return. The emitted value at bar t is the NEXT-bar
    volatility forecast √h_{t+1|t} — the value a risk engine would act
    on after seeing bar t.

    Parameter FITTING is an offline MLE (out of engine scope, like the
    reference's model-training plane — spark/batch_feature_calculation.py
    computes features, not fits); filtering with fixed params is the
    per-bar production op. Same exact-recurrence contract as
    `features.ewm`: the fold is bit-identical to a DuckDB list_reduce
    with the same operand order (ω + α·x + β·acc).

    Scale: sequential only within a symbol; symbols parallelize; input
    is bars (≥60× smaller than trades), so per-group state is bounded.
    """
    import numpy as np
    import pandas as pd

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket").reset_index(drop=True)
        close = pdf["close"].to_numpy(dtype=float)
        prev = np.roll(close, 1)
        prev[0] = np.nan
        with np.errstate(invalid="ignore", divide="ignore"):
            r = np.where((close > 0) & (prev > 0), np.log(close / prev), np.nan)
        keep = ~np.isnan(r)
        pdf = pdf[keep].reset_index(drop=True)
        acc = None
        out = []
        for x in r[keep]:
            x2 = float(x) * float(x)
            acc = x2 if acc is None else omega + alpha * x2 + beta * acc
            out.append(acc)
        pdf["garch_var_next"] = out
        return pdf[["symbol", "bucket", "garch_var_next"]]

    rows = (
        bars.select("symbol", "bucket", "close")
        .groupBy("symbol")
        .applyInPandas(
            compute, schema="symbol string, bucket timestamp, garch_var_next double"
        )
    )
    return rows.select(
        "symbol",
        "bucket",
        F.round(F.sqrt("garch_var_next"), 6).alias("garch_vol_next"),
    )


def periodogram(bars: DataFrame, periods: tuple[int, ...] = (5, 15, 60)) -> DataFrame:
    """Schuster periodogram energy at fixed candidate periods (in bars)
    per symbol: for period P, power = C² + S² with
    C = Σ rₙ·cos(2πn/P), S = Σ rₙ·sin(2πn/P) over the index-ordered
    return series — the intraday-cycle detector (is there a 15-minute
    cycle in this symbol's flow?).

    Reported as `power_frac` = (C²+S²) / Σr² — the fraction of total
    return energy at that period, unitless and scale-free. All
    JVM-side: one row_number window to index the series, one hash
    aggregate computing every period's sums in a single pass (a
    few-frequency Goertzel, not an FFT — no gather of the series
    anywhere).
    """
    import math

    w = Window.partitionBy("symbol").orderBy("bucket")
    prev_close = F.lag("close").over(w)
    ret = F.when(
        (F.col("close") > 0) & (prev_close > 0),
        F.log(F.col("close") / prev_close),
    )
    base = (
        bars.withColumn("ret", ret)
        .filter(F.col("ret").isNotNull())
        .withColumn("n", F.row_number().over(w) - F.lit(1))
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_returns"),
        F.sum(F.col("ret") * F.col("ret")).alias("_e"),
    ]
    for p in periods:
        ang = F.col("n").cast("double") * F.lit(2.0 * math.pi) / F.lit(float(p))
        aggs.append(F.sum(F.col("ret") * F.cos(ang)).alias(f"_c{p}"))
        aggs.append(F.sum(F.col("ret") * F.sin(ang)).alias(f"_s{p}"))
    agg = base.groupBy("symbol").agg(*aggs)
    stack_items = ", ".join(
        f"{p}L, _c{p} * _c{p} + _s{p} * _s{p}" for p in periods
    )
    stacked = agg.select(
        "symbol",
        "n_returns",
        "_e",
        F.expr(
            f"stack({len(periods)}, {stack_items}) AS (period_bars, _pw)"
        ),
    )
    return stacked.select(
        "symbol",
        "period_bars",
        "n_returns",
        F.round(
            F.when(F.col("_e") > 0, F.col("_pw") / F.col("_e")), 6
        ).alias("power_frac"),
    )


_Z95 = 1.6448536269514722  # Φ⁻¹(0.95), hard-coded so both engines share it


def cornish_fisher_var(bars: DataFrame) -> DataFrame:
    """Parametric 95% VaR with the Cornish-Fisher expansion (Cornish &
    Fisher 1938; the standard moment-corrected VaR in risk practice) —
    the closed-form companion to the empirical `var_es_95` query:
    adjusts the Gaussian quantile for the return distribution's skew
    and excess kurtosis.

    Central moments come from raw power sums (one hash aggregate, no
    two-pass mean-centering): m2 = Σr²/n − μ², m3/m4 by the binomial
    expansion; population (÷n) convention throughout, stated here so
    the oracle matches. Lower-tail quantile uses z = −1.6448536…,
    z_cf = z + (z²−1)s/6 + (z³−3z)κ/24 − (2z³−5z)s²/36,
    VaR = −(μ + z_cf·σ). One aggregate + scalar projections; no UDF.
    """
    w = Window.partitionBy("symbol").orderBy("bucket")
    prev_close = F.lag("close").over(w)
    ret = F.when(
        (F.col("close") > 0) & (prev_close > 0),
        F.log(F.col("close") / prev_close),
    )
    base = bars.withColumn("ret", ret).filter(F.col("ret").isNotNull())
    agg = base.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_returns"),
        F.sum("ret").alias("_s1"),
        F.sum(F.pow("ret", F.lit(2))).alias("_s2"),
        F.sum(F.pow("ret", F.lit(3))).alias("_s3"),
        F.sum(F.pow("ret", F.lit(4))).alias("_s4"),
    )
    n = F.col("n_returns").cast("double")
    m1 = F.col("_s1") / n
    m2 = F.col("_s2") / n - m1 * m1
    m3 = F.col("_s3") / n - F.lit(3.0) * m1 * (F.col("_s2") / n) + F.lit(2.0) * m1 * m1 * m1
    m4 = (
        F.col("_s4") / n
        - F.lit(4.0) * m1 * (F.col("_s3") / n)
        + F.lit(6.0) * m1 * m1 * (F.col("_s2") / n)
        - F.lit(3.0) * m1 * m1 * m1 * m1
    )
    sd = F.sqrt(m2)
    skew = F.when(m2 > 0, m3 / F.pow(m2, F.lit(1.5)))
    exkurt = F.when(m2 > 0, m4 / (m2 * m2) - F.lit(3.0))
    z = F.lit(-_Z95)
    z_cf = (
        z
        + (z * z - F.lit(1.0)) * skew / F.lit(6.0)
        + (z * z * z - F.lit(3.0) * z) * exkurt / F.lit(24.0)
        - (F.lit(2.0) * z * z * z - F.lit(5.0) * z) * skew * skew / F.lit(36.0)
    )
    return agg.select(
        "symbol",
        "n_returns",
        F.round(m1, 6).alias("mean_ret"),
        F.round(sd, 6).alias("sd_ret"),
        F.round(skew, 6).alias("skew"),
        F.round(exkurt, 6).alias("excess_kurt"),
        F.round(-(m1 + z * sd), 6).alias("var95_normal"),
        F.round(-(m1 + z_cf * sd), 6).alias("var95_cf"),
    )
