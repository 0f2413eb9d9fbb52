"""Data-quality operators (SURVEY §2.5 G1–G11) and the expectations
mini-framework (F7).

Re-expresses the reference's quality plane — conditional-count checks
(/root/reference/scripts/check_data_quality.py:35-171), the Great
Expectations suite (/root/reference/src/quality/great_expectations_setup.py:20-340)
and the composite DQ score — as single-pass DataFrame aggregations.

Scale notes: every check is a conditional aggregate (`count(when(...))`)
so a full-table DQ sweep is ONE scan + ONE partial-agg shuffle of a few
rows, regardless of input size. The KS test sorts only the distinct
value set (grouped first), not the raw rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _rate(cond: Column) -> Column:
    return F.count(F.when(cond, 1)) / F.count(F.lit(1))


def quality_counts(trades: DataFrame) -> DataFrame:
    """G1/G2/G3 — one-row health summary of the raw trades table.

    Reference: scripts/check_data_quality.py:35-44, 72-80, 130-138,
    162-171.
    """
    return trades.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("symbol").isNull(), 1)).alias("null_symbols"),
        F.count(F.when(F.col("price") <= 0, 1)).alias("nonpos_prices"),
        F.count(F.when(F.col("volume") <= 0, 1)).alias("nonpos_volumes"),
        F.count(F.when(F.col("side").isNull(), 1)).alias("null_sides"),
        F.countDistinct("symbol").alias("distinct_symbols"),
        (F.count(F.lit(1)) - F.countDistinct("trade_id")).alias("duplicate_trade_ids"),
    )


def completeness(df: DataFrame, cols: list[str]) -> DataFrame:
    """G9 — per-column null rate and composite completeness score
    (1 − nulls/cells). Reference: great_expectations_setup.py:162-171."""
    null_rates = [
        _rate(F.col(c).isNull()).alias(f"null_rate_{c}") for c in cols
    ]
    total_nulls = sum(F.count(F.when(F.col(c).isNull(), 1)) for c in cols)
    cells = F.count(F.lit(1)) * len(cols)
    return df.agg(
        *null_rates,
        (1 - total_nulls / cells).alias("completeness_score"),
    )


def ohlc_consistency(ohlc_df: DataFrame) -> DataFrame:
    """G10 — pairwise OHLC violations (high<low, high<open, low>close…).
    Reference: great_expectations_setup.py:173-195."""
    v_hl = F.col("high") < F.col("low")
    v_ho = F.col("high") < F.col("open")
    v_hc = F.col("high") < F.col("close")
    v_lo = F.col("low") > F.col("open")
    v_lc = F.col("low") > F.col("close")
    any_v = v_hl | v_ho | v_hc | v_lo | v_lc
    return ohlc_df.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.count(F.when(v_hl, 1)).alias("high_lt_low"),
        F.count(F.when(v_ho, 1)).alias("high_lt_open"),
        F.count(F.when(v_hc, 1)).alias("high_lt_close"),
        F.count(F.when(v_lo, 1)).alias("low_gt_open"),
        F.count(F.when(v_lc, 1)).alias("low_gt_close"),
        (1 - _rate(any_v)).alias("consistency_score"),
    )


def accuracy_zscore(
    df: DataFrame, value_col: str = "price", key: str = "symbol", z: float = 3.0
) -> DataFrame:
    """G7 — per-key outlier rate via z-score > z; accuracy = 1 − rate.
    Reference: great_expectations_setup.py:197-213.

    Two-pass formulation (stats agg + broadcast join back) rather than a
    window — the stats table is |keys| rows, so the fact table is
    scanned twice but never shuffled on a window sort.
    """
    stats = df.groupBy(key).agg(
        F.avg(value_col).alias("__mean"), F.stddev_samp(value_col).alias("__std")
    )
    flagged = df.join(F.broadcast(stats), key).withColumn(
        "__outlier",
        F.when(
            F.col("__std") > 0,
            (F.abs(F.col(value_col) - F.col("__mean")) / F.col("__std")) > z,
        ).otherwise(F.lit(False)),
    )
    return flagged.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("__outlier"), 1)).alias("n_outliers"),
        (1 - _rate(F.col("__outlier"))).alias("accuracy_score"),
    )


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    tag_col: Column,
    key: str | None = None,
    prefix_buckets: int = 32,
) -> DataFrame:
    """G8 — two-sample Kolmogorov–Smirnov statistic
    D = max_x |F1(x) − F2(x)| (reference uses scipy.stats.ks_2samp,
    great_expectations_setup.py:319-340; Spark ML's KS test is
    one-sample only, so this is a custom empirical-CDF build).

    ``tag_col`` must evaluate to 1 (sample A) or 0 (sample B). Distinct
    values are aggregated first, so cumulative counts over |distinct x|
    rows give both ECDFs.

    Scale shape: with no ``key`` the ECDF would otherwise be one
    unpartitioned window over every distinct value — a total order
    that grows with the data. Instead the prefix sums are EXACT and
    distributed: distinct values are range-bucketed by
    ``percentile_approx`` cutpoints (any monotone bucketing preserves
    exactness — equal x always land together), cumulated WITHIN each
    bucket by a partitioned window, and each bucket adds the summed
    totals of all smaller buckets via a broadcast O(B²) prefix join —
    the same carry idiom as the peak-concurrency sweep. All-integer
    arithmetic until the final division, so values are bit-identical
    to the single-window form.
    """
    keys = [key] if key else []
    tagged = df.select(
        *keys, F.col(value_col).alias("x"), tag_col.cast("int").alias("t")
    )
    pts = tagged.groupBy(*keys, "x").agg(
        F.sum("t").alias("c1"), F.sum(1 - F.col("t")).alias("c2")
    )
    if key is not None:
        w = Window.partitionBy(*keys).orderBy("x").rowsBetween(
            Window.unboundedPreceding, 0
        )
        wk = Window.partitionBy(*keys)
        cum = pts.select(
            *keys,
            (F.sum("c1").over(w) / F.sum("c1").over(wk)).alias("f1"),
            (F.sum("c2").over(w) / F.sum("c2").over(wk)).alias("f2"),
        )
        return cum.groupBy(*keys).agg(
            F.max(F.abs(F.col("f1") - F.col("f2"))).alias("ks_stat")
        )
    qs = [i / prefix_buckets for i in range(1, prefix_buckets)]
    cuts = pts.agg(
        F.percentile_approx(F.col("x").cast("double"), qs, 10000).alias(
            "cuts"
        )
    )
    b = pts.crossJoin(F.broadcast(cuts)).select(
        "x",
        "c1",
        "c2",
        F.size(
            F.filter(F.col("cuts"), lambda c: c <= F.col("x"))
        ).alias("bkt"),
    )
    wb = Window.partitionBy("bkt").orderBy("x").rowsBetween(
        Window.unboundedPreceding, 0
    )
    within = b.select(
        "bkt",
        F.sum("c1").over(wb).alias("w1"),
        F.sum("c2").over(wb).alias("w2"),
    )
    btot = b.groupBy("bkt").agg(
        F.sum("c1").alias("t1"), F.sum("c2").alias("t2")
    )
    off = (
        btot.select("bkt")
        .join(
            F.broadcast(
                btot.select(
                    F.col("bkt").alias("pb"),
                    F.col("t1").alias("pt1"),
                    F.col("t2").alias("pt2"),
                )
            ),
            F.col("pb") < F.col("bkt"),
            "left",
        )
        .groupBy("bkt")
        .agg(
            F.coalesce(F.sum("pt1"), F.lit(0)).alias("o1"),
            F.coalesce(F.sum("pt2"), F.lit(0)).alias("o2"),
        )
    )
    grand = pts.agg(
        F.sum("c1").alias("g1"), F.sum("c2").alias("g2")
    )
    return (
        within.join(F.broadcast(off), "bkt")
        .crossJoin(F.broadcast(grand))
        .agg(
            F.max(
                F.abs(
                    (F.col("w1") + F.col("o1")) / F.col("g1")
                    - (F.col("w2") + F.col("o2")) / F.col("g2")
                )
            ).alias("ks_stat")
        )
    )


def sharpe_ratio(
    trades: DataFrame, risk_free: float = 0.0, periods: int = 252
) -> DataFrame:
    """G6 — per-symbol Sharpe ratio over log returns
    (mean(excess)/stddev(excess)·√periods). Reference:
    src/utils/helpers.py:58-74."""
    w = Window.partitionBy("symbol").orderBy(F.col("time").asc(), F.col("trade_id").asc())
    prev = F.lag("price").over(w)
    rets = trades.withColumn(
        "ret",
        F.when((prev > 0) & (F.col("price") > 0), F.log(F.col("price") / prev)),
    ).filter(F.col("ret").isNotNull())
    return rets.groupBy("symbol").agg(
        (
            (F.avg("ret") - F.lit(risk_free))
            / F.stddev_samp("ret")
            * F.sqrt(F.lit(float(periods)))
        ).alias("sharpe_ratio"),
        F.count(F.lit(1)).alias("n_returns"),
    )


def value_quantiles(
    df: DataFrame, value_col: str, key: str, quantiles: list[float] | None = None
) -> DataFrame:
    """G5 — exact p50/p95/p99 per key (reference benchmarks use
    statistics.quantiles / np.percentile). At 100 TB switch to
    percentile_approx — same call shape, sketch-based single pass."""
    qs = quantiles or [0.5, 0.95, 0.99]
    aggs = [
        F.expr(f"percentile({value_col}, {q})").alias(
            f"p{str(q).replace('0.', '')}"
        )
        for q in qs
    ]
    return df.groupBy(key).agg(*aggs)


def dq_score(
    trades: DataFrame, ohlc_df: DataFrame, required_cols: list[str] | None = None
) -> DataFrame:
    """G11 — composite DQ score = mean(completeness, consistency,
    accuracy), pass threshold 0.85. Reference:
    great_expectations_setup.py:123-160, 247-316. (Timeliness is a
    wall-clock property — reported by `freshness`, not folded into the
    deterministic score.)
    """
    cols = required_cols or ["symbol", "price", "volume", "trade_id"]
    # Fused stats pass (scan discipline, 3 trades scans -> 2): the
    # z-score leg's per-key stats aggregate also carries per-key row
    # and null counts, so the completeness score derives from the tiny
    # cached stats frame by exact integer regrouping (sum of per-key
    # counts == the global counts `completeness()` takes directly;
    # groupBy retains the NULL-key group, so no row goes missing) —
    # identical doubles, one fewer full-table scan.
    stats = (
        trades.groupBy("symbol")
        .agg(
            F.avg("price").alias("__mean"),
            F.stddev_samp("price").alias("__std"),
            F.count(F.lit(1)).alias("__n"),
            *[
                F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{c}")
                for c in cols
            ],
        )
        .cache()  # |keys| rows feeding the comp aggregate + the join.
        # Accepted leak: never unpersisted — the frame is answer-sized
        # (|symbols| rows) and repeat invocations build an identical
        # logical plan, so the CacheManager reuses ONE entry per input
        # rather than accumulating ("already cached" warning, not a
        # second copy).
    )
    total_nulls = sum(F.sum(f"__null_{c}") for c in cols)
    comp = stats.agg(
        (1 - total_nulls / (F.sum("__n") * len(cols))).alias(
            "completeness_score"
        )
    )
    cons = ohlc_consistency(ohlc_df)
    flagged = trades.join(
        F.broadcast(stats.select("symbol", "__mean", "__std")), "symbol"
    ).withColumn(
        "__outlier",
        F.when(
            F.col("__std") > 0,
            (F.abs(F.col("price") - F.col("__mean")) / F.col("__std")) > 3.0,
        ).otherwise(F.lit(False)),
    )
    acc = (
        flagged.groupBy("symbol")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (1 - _rate(F.col("__outlier"))).alias("accuracy_score"),
        )
        .agg(
            (F.sum(F.col("accuracy_score") * F.col("n_rows")) / F.sum("n_rows")).alias(
                "accuracy_score"
            )
        )
    )
    joined = (
        comp.select("completeness_score")
        .crossJoin(cons.select("consistency_score"))
        .crossJoin(acc)
    )
    return joined.select(
        "completeness_score",
        "consistency_score",
        "accuracy_score",
        (
            (
                F.col("completeness_score")
                + F.col("consistency_score")
                + F.col("accuracy_score")
            )
            / 3
        ).alias("dq_score"),
    ).withColumn("passed", F.col("dq_score") >= 0.85)


def freshness(df: DataFrame, time_col: str = "time", now=None) -> DataFrame:
    """G4 — max(ts) + age vs now (reference src/utils/helpers.py:91-120)."""
    now_col = F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()
    return df.agg(
        F.max(time_col).alias("latest_ts"),
        (F.unix_timestamp(now_col) - F.unix_timestamp(F.max(time_col))).alias(
            "age_seconds"
        ),
    )


# ---------------------------------------------------------------------------
# F7 — expectations mini-framework: named checks compiled to predicates.
# Reference: src/quality/data_contracts.py:15-96 and
# great_expectations_validator.py:29-271 (schema/range/set/uniqueness/
# pair/increasing checks evaluated dynamically by name).
# ---------------------------------------------------------------------------


@dataclass
class Expectation:
    name: str
    kind: str
    violation: Column | None = None   # row-level predicate: True = violation
    agg_violations: Column | None = None  # aggregate violation count
    meta: dict = field(default_factory=dict)


def expect_not_null(col: str) -> Expectation:
    return Expectation(f"not_null_{col}", "not_null", violation=F.col(col).isNull())


def expect_between(col: str, lo, hi) -> Expectation:
    return Expectation(
        f"between_{col}",
        "between",
        violation=~F.col(col).between(lo, hi) | F.col(col).isNull(),
        meta={"lo": lo, "hi": hi},
    )


def expect_in_set(col: str, values: list) -> Expectation:
    return Expectation(
        f"in_set_{col}",
        "in_set",
        violation=F.col(col).isNotNull() & ~F.col(col).isin(values),
    )


def expect_unique(cols: list[str]) -> Expectation:
    return Expectation(
        "unique_" + "_".join(cols),
        "unique",
        agg_violations=F.count(F.lit(1)) - F.countDistinct(*[F.col(c) for c in cols]),
    )


def expect_pair(name: str, violation: Column) -> Expectation:
    return Expectation(name, "pair", violation=violation)


def expect_increasing(col: str, partition_by: str | None = None) -> Expectation:
    # O4 — expect_column_values_to_be_increasing via lag
    w = (
        Window.partitionBy(partition_by) if partition_by else Window.partitionBy()
    ).orderBy(F.col(col).asc())
    return Expectation(
        f"increasing_{col}",
        "increasing",
        meta={"window": w, "col": col},
    )


def validate(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Evaluate all expectations in a single aggregation pass (plus one
    window pass if any `increasing` checks are present). Returns one row
    per expectation: (expectation, kind, n_violations, passed)."""
    aggs = []
    names = []
    work = df
    for e in expectations:
        if e.kind == "increasing":
            marker = f"__dec_{e.name}"
            work = work.withColumn(
                marker,
                F.when(
                    F.lag(e.meta["col"]).over(e.meta["window"]) > F.col(e.meta["col"]),
                    1,
                ),
            )
            aggs.append(F.count(F.col(marker)).alias(e.name))
        elif e.agg_violations is not None:
            aggs.append(e.agg_violations.alias(e.name))
        else:
            aggs.append(F.count(F.when(e.violation, 1)).alias(e.name))
        names.append((e.name, e.kind))
    row = work.agg(*aggs)
    stacked = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("expectation"),
                        F.lit(k).alias("kind"),
                        F.col(n).cast("long").alias("n_violations"),
                    )
                    for n, k in names
                ]
            )
        ).alias("r")
    ).select("r.*")
    return stacked.withColumn("passed", F.col("n_violations") == 0)


def mad_outlier_stats(
    df: DataFrame,
    value_col: str = "price",
    key: str = "symbol",
    z_threshold: float = 3.0,
) -> DataFrame:
    """Robust anomaly accounting per key: median, MAD (median absolute
    deviation), and how many rows exceed ``z_threshold`` robust
    z-scores (|x − med| / (1.4826·MAD)) — the outlier detector the
    reference's z-score accuracy check (G7,
    src/quality/data_quality_framework.py) should be using where the
    distribution has fat tails: mean/stddev are themselves dragged by
    the outliers being hunted.

    Two aggregate passes (median, then MAD over the residuals) with the
    tiny per-key stats broadcast back — no window, no sort of the fact
    table; both joins are broadcast at any realistic key count.
    """
    med = df.groupBy(key).agg(
        F.percentile(F.col(value_col), F.lit(0.5)).alias("med")
    )
    with_med = df.join(F.broadcast(med), key)
    mad = with_med.groupBy(key).agg(
        F.percentile(F.abs(F.col(value_col) - F.col("med")), F.lit(0.5)).alias(
            "mad"
        )
    )
    scored = with_med.join(F.broadcast(mad), key)
    robust_z = F.abs(F.col(value_col) - F.col("med")) / (
        1.4826 * F.nullif(F.col("mad"), F.lit(0.0))
    )
    return (
        scored.withColumn("is_outlier", robust_z > z_threshold)
        .groupBy(key)
        .agg(
            F.round(F.min("med"), 6).alias("median"),
            F.round(F.min("mad"), 6).alias("mad"),
            F.count(F.when(F.col("is_outlier"), 1)).cast("bigint").alias(
                "n_outliers"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
    )


def winsorized_stats(
    df: DataFrame,
    value_col: str = "price",
    key: str = "symbol",
    lo: float = 0.01,
    hi: float = 0.99,
) -> DataFrame:
    """Winsorized vs raw mean per key: clip values to the [p_lo, p_hi]
    quantiles and report both means plus how many rows were clipped on
    each side — the standard robust-mean preprocessing for feature
    columns feeding model training.

    One quantile aggregate (tiny, broadcast back) + one clipped
    aggregate over the fact — two shuffles total, both partial-agg.
    """
    q = df.groupBy(key).agg(
        F.percentile(F.col(value_col), F.lit(lo)).alias("q_lo"),
        F.percentile(F.col(value_col), F.lit(hi)).alias("q_hi"),
    )
    v = F.col(value_col)
    clipped = F.least(F.greatest(v, F.col("q_lo")), F.col("q_hi"))
    return (
        df.join(F.broadcast(q), key)
        .groupBy(key)
        .agg(
            F.round(F.avg(v), 6).alias("raw_mean"),
            F.round(F.avg(clipped), 6).alias("winsor_mean"),
            F.round(F.min("q_lo"), 6).alias("p_lo"),
            F.round(F.min("q_hi"), 6).alias("p_hi"),
            F.count(F.when(v < F.col("q_lo"), 1)).cast("bigint").alias(
                "n_clipped_low"
            ),
            F.count(F.when(v > F.col("q_hi"), 1)).cast("bigint").alias(
                "n_clipped_high"
            ),
        )
    )


def psi_drift(
    trades: DataFrame,
    value_col: str = "price",
    key_col: str = "symbol",
    ts_col: str = "time",
) -> DataFrame:
    """Population Stability Index per key between the earlier and later
    half of the observation window — the standard "has this feature's
    distribution moved" monitor a model-serving pipeline runs alongside
    the KS test (G8): decile bins are fit on the REFERENCE (earlier)
    half, both halves are histogrammed into them, and
    PSI = Σ (p_i − q_i)·ln(p_i/q_i) with +0.5 Laplace smoothing so
    empty bins stay defined. Rule of thumb: < 0.1 stable, > 0.25 major
    shift.

    Plan: one global min/max pass (2-value broadcast), one per-key
    decile aggregate on the reference half (9 doubles per key,
    broadcast back), one histogram aggregate per (key, half, bin), one
    k×10-row PSI aggregate. The big table is scanned twice (decile fit
    + histogram) and shuffled only by key — no row-level join anywhere.
    """
    halves = trades.select(
        F.col(key_col).alias("key"),
        F.col(value_col).alias("val"),
        F.col(ts_col).cast("double").alias("t"),
    )
    bounds_t = halves.agg(
        ((F.min("t") + F.max("t")) / 2.0).alias("t_mid")
    )
    tagged = halves.join(F.broadcast(bounds_t)).select(
        "key", "val", (F.col("t") <= F.col("t_mid")).alias("is_ref")
    )
    deciles = (
        tagged.filter("is_ref")
        .groupBy("key")
        .agg(
            F.percentile(
                "val",
                F.array(*[F.lit(i / 10.0) for i in range(1, 10)]),
            ).alias("bounds")
        )
    )
    # ONE histogram pass: both halves' counts come from conditional
    # sums in the same aggregate, so the fact table is scanned exactly
    # twice overall (decile fit + histogram) — never once per half
    binned = (
        tagged.join(F.broadcast(deciles), "key")
        .select(
            "key",
            "is_ref",
            F.size(
                F.filter(F.col("bounds"), lambda b: F.col("val") > b)
            ).alias("bin"),
        )
        .groupBy("key", "bin")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("n_ref"),
            F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).alias("n_cur"),
        )
    )
    grid = deciles.select(
        "key", F.explode(F.sequence(F.lit(0), F.lit(9))).alias("bin")
    )
    full = grid.join(F.broadcast(binned), ["key", "bin"], "left").na.fill(
        {"n_ref": 0, "n_cur": 0}
    )
    tot = full.groupBy("key").agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    p = (F.col("n_ref") + 0.5) / (F.col("t_ref") + 5.0)
    qq = (F.col("n_cur") + 0.5) / (F.col("t_cur") + 5.0)
    return (
        full.join(F.broadcast(tot), "key")
        .groupBy("key")
        .agg(
            F.max("t_ref").cast("bigint").alias("n_ref"),
            F.max("t_cur").cast("bigint").alias("n_cur"),
            F.round(F.sum((p - qq) * F.log(p / qq)), 6).alias("psi"),
        )
        .withColumnRenamed("key", key_col)
    )
