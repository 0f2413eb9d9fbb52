"""Quantile-threshold bucketing — the scale-safe replacement for
global ``ntile``.

``ntile(k) OVER (ORDER BY x)`` puts a TOTAL ORDER over the input: Spark
moves every row into one partition (`WindowExec: No Partition Defined`)
and the frame grows O(N) — correct at driver-gate scale, fatal at
100 TB. The production form here computes the k−1 exact quantile
cutpoints in ONE aggregate (map-side partial, one reduce of a bounded
value→count state), broadcasts the one-row cutpoint frame, and buckets
with a codegen'd comparison chain:

    bucket(x) = 1 + Σ_i [x > cut_i]

Differences vs exact ntile, by design: ties share a bucket (no
(value, id) tie-break splits a run of equal values), so bucket sizes
equalize only up to tie mass. The exact-ntile forms survive as
``*_exact_witness`` queries in ``__spark_entry__.py``.

DuckDB oracle equivalence: Spark ``percentile`` ≡ DuckDB
``quantile_cont`` (linear interpolation) on DOUBLE inputs — the
cutpoints are bit-identical, so the bucket comparisons are too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantile_probs(n_buckets: int) -> list[float]:
    """The k−1 interior cut probabilities for k equal-probability
    buckets, as exact Python doubles (reuse `repr(p)` in oracle SQL so
    both engines parse the same binary64 literal)."""
    return [i / n_buckets for i in range(1, n_buckets)]


def bucket_expr(value: Column, cuts_col: str, n_buckets: int) -> Column:
    """1-based bucket index from a broadcast cutpoint array column:
    ``1 + Σ [value > cuts[i]]``. NULL values land in bucket 1 (the
    comparison is NULL → the WHEN falls to 0), matching the SQL
    ``CASE WHEN x > c THEN 1 ELSE 0 END`` chain in the oracles."""
    b: Column = F.lit(1)
    for i in range(1, n_buckets):
        b = b + F.when(value > F.element_at(cuts_col, i), 1).otherwise(0)
    return b


def with_quantile_buckets(
    df: DataFrame, specs: dict[str, tuple[str, int]]
) -> DataFrame:
    """Add one quantile-bucket column per spec: ``{out_col:
    (value_col, n_buckets)}``.

    ALL cutpoint arrays come from a single aggregate over ``df`` (one
    job, one pass), broadcast back via a 1-row cross join — the whole
    construct adds zero wide shuffles beyond that one aggregate.
    """
    cuts = df.agg(
        *[
            F.percentile(
                val, F.array(*[F.lit(p) for p in quantile_probs(n)])
            ).alias(f"__cuts_{out}")
            for out, (val, n) in specs.items()
        ]
    )
    out_df = df.crossJoin(F.broadcast(cuts))
    for out, (val, n) in specs.items():
        out_df = out_df.withColumn(
            out, bucket_expr(F.col(val), f"__cuts_{out}", n)
        )
    return out_df.drop(*[f"__cuts_{out}" for out in specs])


def quantile_cut_sql(value_sql: str, n_buckets: int) -> str:
    """DuckDB side of :func:`with_quantile_buckets`'s cutpoints: a
    ``quantile_cont`` call whose probability literals are the exact
    reprs of the Python doubles Spark embeds."""
    probs = ", ".join(repr(p) for p in quantile_probs(n_buckets))
    return f"quantile_cont(CAST({value_sql} AS DOUBLE), [{probs}])"


def bucket_sql(value_sql: str, cuts_sql: str, n_buckets: int) -> str:
    """DuckDB side of :func:`bucket_expr` (1-based array indexing)."""
    terms = " + ".join(
        f"(CASE WHEN {value_sql} > ({cuts_sql})[{i}] THEN 1 ELSE 0 END)"
        for i in range(1, n_buckets)
    )
    return f"(1 + {terms})"
