"""Mergeable sketch partials for continuous aggregates.

TimescaleDB Toolkit's headline pattern (``hyperloglog``/
``approx_count_distinct`` and ``percentile_agg`` INSIDE a continuous
aggregate): the cagg materializes a per-bucket SKETCH STATE instead of
a final number, a coarser rollup (cagg-on-cagg) MERGES the partials,
and the estimate is computed at read time. That is what makes
approximate aggregates hierarchical: a plain ``approx_count_distinct``
result cannot be re-combined, its sketch can.

Two families, same calling convention as any other cagg agg
(``aggs={"col": <partial>}`` at the finest level,
``aggs={"col": <merge>}`` on the rollup, ``<estimate>`` in the read
projection):

- **HLL (production)**: Spark's native Apache DataSketches
  HyperLogLog — ``hll_partial`` / ``hll_merge`` are JVM-side
  aggregates producing a compact ``binary`` state (rsd-bounded error
  at ANY cardinality; the partial never exceeds ~2^lgK bytes
  regardless of group size). Not SQL-reproducible in DuckDB → the
  driver query over it is rows-only, witnessed by the KMV family
  below (same plane, hash-exact).
- **KMV (witness)**: K-Minimum-Values (Bar-Yossef et al. 2002, the
  order-statistics ancestor of HLL) over md5 — both engines hash
  bit-identically, so partial, merge, and estimator arithmetic are
  all DuckDB-checkable. The partial is the k smallest distinct md5
  digests (a sorted ``array<string>``; hex sorts lexicographically ==
  numerically); the union of per-bucket k-smallest sets re-topped to
  k IS the k-smallest of the union (the KMV mergeability theorem —
  which is also why the oracle can skip the hierarchy and compute the
  k-th smallest over raw rows directly). Scale note: ``collect_set``
  materializes the group's distinct hash set before the slice, so the
  witness form is for bounded-cardinality buckets; the HLL form is
  the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "hll_partial",
    "hll_merge",
    "hll_estimate",
    "kmv_partial",
    "kmv_merge",
    "kmv_estimate",
    "hist_partial",
    "hist_merge",
    "hist_percentile",
    "with_hist_percentiles",
    "cms_partial",
    "cms_merge",
    "cms_estimate",
]


def hll_partial(col: str | Column, lg_k: int = 12) -> Column:
    """Per-group HyperLogLog sketch state (binary, mergeable)."""
    return F.hll_sketch_agg(col, F.lit(lg_k))


def hll_merge(col: str | Column, allow_different_lgk: bool = False) -> Column:
    """Union of HLL partials (the rollup aggregate). The boolean is
    Spark's ``allowDifferentLgConfigK`` — leave False so a mixed-lgK
    store is an error, not a silent precision downgrade."""
    return F.hll_union_agg(col, F.lit(allow_different_lgk))


def hll_estimate(col: str | Column) -> Column:
    """Distinct-count estimate from an HLL state (read-time)."""
    return F.hll_sketch_estimate(col)


def kmv_partial(col: str | Column, k: int = 64) -> Column:
    """The k smallest distinct md5 digests of ``col`` in the group —
    a sorted ``array<string>`` partial. ``col`` should already be a
    string (hash the same bytes the oracle hashes)."""
    return F.slice(F.array_sort(F.collect_set(F.md5(col))), 1, k)


def kmv_merge(col: str | Column, k: int = 64) -> Column:
    """Re-combine KMV partials: k smallest of the deduplicated union
    (== the k smallest over all underlying values, by mergeability)."""
    return F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list(col)))),
        1,
        k,
    )


def kmv_estimate(col: str | Column, k: int = 64) -> Column:
    """Distinct-count estimate from a KMV partial: ``(k−1)/u_k`` with
    ``u_k`` the k-th smallest digest mapped to [0,1) via its first 8
    hex chars; exact ``|partial|`` when the group held fewer than k
    distinct values (the partial IS the distinct set then)."""
    c = F.col(col) if isinstance(col, str) else col
    u_k = F.conv(F.substring(F.element_at(c, k), 1, 8), 16, 10).cast(
        "long"
    ) / F.lit(4294967296.0)
    return F.when(F.size(c) < k, F.size(c).cast("long")).otherwise(
        F.floor(F.lit(float(k - 1)) / u_k).cast("long")
    )


# -- fixed-grid histogram percentiles (percentile_agg analog) -----------
#
# TimescaleDB Toolkit's ``percentile_agg``/uddsketch pattern with an
# EXACTLY-combinable state: per-bucket bin counts over a fixed grid.
# Merge is elementwise addition (associative, commutative, loss-free),
# so two-level rollups equal the direct aggregation BIT-EXACTLY — and
# every step (binning, cumulative walk, edge arithmetic) is plain
# integer/double arithmetic DuckDB reproduces, so the driver query over
# it is hash-exact with no separate witness. Resolution is the grid
# step; values outside [lo, hi) clamp to the edge bins; NULLs count
# nowhere.


def _bin_index(col: str | Column, lo: float, hi: float, nbins: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    w = (hi - lo) / nbins
    raw = F.floor((c - F.lit(lo)) / F.lit(w))
    return F.least(
        F.lit(nbins - 1), F.greatest(F.lit(0), raw.cast("int"))
    )


def hist_partial(
    col: str | Column, lo: float, hi: float, nbins: int
) -> Column:
    """Per-group fixed-grid histogram partial: ``array<long>`` of bin
    counts (one aggregate expression per bin — keep nbins ≤ ~256)."""
    idx = _bin_index(col, lo, hi, nbins)
    return F.array(
        *[
            F.sum(F.when(idx == i, 1).otherwise(0)).cast("long")
            for i in range(nbins)
        ]
    )


def hist_merge(col: str | Column, nbins: int) -> Column:
    """Re-combine histogram partials: elementwise sum (exact)."""
    c = F.col(col) if isinstance(col, str) else col
    zero = F.array(*[F.lit(0).cast("long") for _ in range(nbins)])
    return F.aggregate(
        F.collect_list(c),
        zero,
        lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
    )


def hist_percentile(
    col: str | Column, q: float, lo: float, hi: float, nbins: int
) -> Column:
    """Grid-percentile estimate from a histogram partial: the LOWER
    EDGE of the first bin whose cumulative count reaches ``q × total``
    — resolution = one grid step, deterministic, and reproducible in
    SQL (cumulative window over per-bin counts).

    Column form = nested folds whose subexpressions codegen re-evaluates
    PER ELEMENT (O(nbins²) work per row, and interpreted at that) —
    fine ad hoc, 20s-per-100k-rows wrong in a hot path. Use
    ``with_hist_percentiles`` (the DataFrame form, which projects the
    cumulative array once) anywhere performance matters."""
    c = F.col(col) if isinstance(col, str) else col
    add = lambda a, x: a + x  # noqa: E731
    total = F.aggregate(c, F.lit(0).cast("long"), add)
    idxs = F.sequence(F.lit(0), F.lit(nbins - 1))
    chosen = F.array_min(
        F.filter(
            idxs,
            lambda i: F.aggregate(
                F.slice(c, 1, i + 1), F.lit(0).cast("long"), add
            )
            >= F.lit(q) * total,
        )
    )
    w = (hi - lo) / nbins
    return F.when(
        total > 0, F.lit(lo) + chosen.cast("double") * F.lit(w)
    )


def with_hist_percentiles(
    df,
    hist_col: str,
    qs: dict[str, float],
    lo: float,
    hi: float,
    nbins: int,
):
    """Add one grid-percentile column per ``qs`` entry (name → q) —
    the hot-path form of ``hist_percentile``. Total and thresholds are
    PROJECTED COLUMNS (inside a higher-order-function lambda Spark
    re-evaluates any non-column subexpression per element), and the
    bin selection is two O(nbins) folds — a plain-long total and one
    struct fold counting, per quantile, the bins whose running
    cumulative stays below the threshold. The naive nested-fold column
    form does O(nbins²) interpreted work per row per quantile
    (measured 20 s for two quantiles over ~100k source rows at
    nbins=64); a concat-built per-row cums array is O(nbins²) copies
    too. Arithmetic is identical to ``hist_percentile`` — same chosen
    bin, same edge — so oracles and tests transfer."""
    c = F.col(hist_col)
    out = df.withColumn(
        "__hist_total",
        F.aggregate(c, F.lit(0).cast("long"), lambda a, x: a + x),
    )
    total = F.col("__hist_total")
    names = list(qs)
    # thresholds as projected columns (inside a HOF lambda any
    # non-column subexpression re-evaluates per element)
    for i, name in enumerate(names):
        out = out.withColumn(
            f"__hist_t{i}", F.lit(qs[name]) * total.cast("double")
        )
    tcols = [F.col(f"__hist_t{i}") for i in range(len(names))]
    # Counts are non-negative, so the running cumulative is
    # non-decreasing and "first bin whose cumulative >= t" equals
    # "number of bins whose cumulative < t" — ONE O(nbins) fold for
    # every quantile, no O(nbins²) concat-built cums array per row.
    # Comparisons promote long→double exactly as the cums-array filter
    # did, so the chosen bin (and the edge) is identical.
    scan = F.aggregate(
        c,
        F.struct(
            F.lit(0).cast("long").alias("cum"),
            *[F.lit(0).alias(f"c{i}") for i in range(len(names))],
        ),
        lambda a, x: F.struct(
            (a["cum"] + x).alias("cum"),
            *[
                (
                    a[f"c{i}"]
                    + F.when((a["cum"] + x) < t, 1).otherwise(0)
                ).alias(f"c{i}")
                for i, t in enumerate(tcols)
            ],
        ),
    )
    out = out.withColumn("__hist_chosen", scan)
    w = (hi - lo) / nbins
    chosen = F.col("__hist_chosen")
    for i, name in enumerate(names):
        out = out.withColumn(
            name,
            F.when(
                total > 0,
                F.lit(lo) + chosen[f"c{i}"].cast("double") * F.lit(w),
            ),
        )
    return out.drop(
        "__hist_total",
        "__hist_chosen",
        *[f"__hist_t{i}" for i in range(len(names))],
    )


# -- count-min sketch (frequency / heavy hitters) ------------------------
#
# The third sketch leg (distinct = HLL/KMV, percentile = histogram,
# FREQUENCY = count-min): d salted-md5 hash rows × w counters, stored
# flat as array<long> of length d·w. Merge is elementwise addition
# (exact-combinable, like the histogram — hist_merge works verbatim);
# the point estimate for a value is the MIN over its d counters, which
# NEVER underestimates (Cormode & Muthukrishnan 2005) and overestimates
# by at most ε·N with ε = e/w at the usual confidence. md5 salting
# makes every step reproducible in DuckDB, so the witness is
# hash-exact. At 100 TB: word/entity frequencies come from map-side
# partials merged into d·w longs — no global shuffle on the value key.


def _cms_bucket(col: str | Column, j: int, w: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{j}|"), c)), 1, 8), 16, 10)
        .cast("long")
        % w
    )


def cms_partial(
    col: str | Column,
    d: int = 4,
    w: int = 64,
    weight: str | Column | None = None,
) -> Column:
    """Per-group count-min partial: flat ``array<long>`` of d·w
    counters (one aggregate expression per counter — keep d·w ≤ ~512).
    NULL values count nowhere. ``weight`` counts each row that many
    times (integer column) — feed PRE-AGGREGATED (value, count) rows
    so the md5 family evaluates once per distinct value, not per
    occurrence.

    Embedding the bucket expression in all d·w update expressions is
    deliberate: whole-stage codegen's subexpression elimination
    evaluates each salted md5 once per row (measured round 8: the
    embedded form beat an explicit pre-projection 4.7s vs 5.6s on 2M
    rows × d·w=256 — the HOF-lambda re-evaluation hazard does NOT
    apply to aggregate update expressions)."""
    buckets = [_cms_bucket(col, j, w) for j in range(d)]
    inc = (
        F.lit(1)
        if weight is None
        else (F.col(weight) if isinstance(weight, str) else weight)
    )
    return F.array(
        *[
            F.sum(F.when(buckets[j] == b, inc).otherwise(0)).cast("long")
            for j in range(d)
            for b in range(w)
        ]
    )


def cms_merge(col: str | Column, d: int = 4, w: int = 64) -> Column:
    """Re-combine count-min partials: elementwise sum (exact)."""
    return hist_merge(col, d * w)


def cms_from_counts(
    df,
    value_col: str,
    count_col: str,
    d: int = 4,
    w: int = 64,
):
    """Fully-merged count-min sketch (1-row DataFrame, ``s`` =
    ``array<long>`` of d·w counters) from a pre-aggregated
    (value, count) frame.

    Same counters as ``cms_partial`` + ``cms_merge`` — each counter is
    an integer sum of the counts hashing to it, invariant to grouping —
    but built as an EXPLODE to (position, count) rows plus one hash
    aggregate instead of d·w conditional aggregate expressions. The
    wide form costs Catalyst ~2 s of driver-side analysis/codegen per
    invocation at d·w=256 and evaluates d·w WHENs per input row; this
    shape is d struct constructions per row and a tiny groupBy, and is
    what a 100 TB build would run (the d·w-expression form is the
    right shape only as a per-group partial inside a cagg aggregate)."""
    pos = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.lit(j * w) + _cms_bucket(value_col, j, w))
                        .cast("int")
                        .alias("p"),
                        F.col(count_col).alias("c"),
                    )
                    for j in range(d)
                ]
            )
        ).alias("e")
    ).groupBy(F.col("e.p").alias("p")).agg(F.sum("e.c").alias("c"))
    m = pos.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("p"), F.col("c")))
        ).alias("m")
    )
    idx = F.sequence(F.lit(0), F.lit(d * w - 1))
    return m.select(
        F.transform(
            idx,
            lambda i: F.coalesce(
                F.element_at(F.col("m"), i), F.lit(0)
            ).cast("long"),
        ).alias("s")
    )


def cms_estimate(
    sketch: Column, value: str | Column, d: int = 4, w: int = 64
) -> Column:
    """Point frequency estimate for ``value``: min over the d counters
    it hashes to. Never below the true count; collisions only inflate."""
    return F.least(
        *[
            F.get(
                sketch,
                (F.lit(j * w) + _cms_bucket(value, j, w)).cast("int"),
            )
            for j in range(d)
        ]
    )
