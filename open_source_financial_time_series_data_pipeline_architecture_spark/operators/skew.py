"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) handles most runtime skew; these operators are the explicit
form for the cases AQE cannot re-plan:

- ``salted_aggregate`` — two-phase aggregation for a hot grouping key
  (one symbol carrying 50% of a 100 TB feed): phase 1 aggregates by
  (key, salt) spreading the hot key over `n_salts` reducers, phase 2
  merges the partials. Only works for algebraic aggregates that
  decompose (sum/count/min/max → sum of partials; avg → sum+count).
- ``salted_join`` — fact⋈dim when the dim is too big to broadcast AND
  the fact is skewed: the fact side gets a random-but-deterministic
  salt (hash of a unique column), the dim side is replicated across all
  salts, and the join key becomes (key, salt) — the hot key's rows land
  on n_salts partitions instead of one.

Both are provably output-equivalent to their unsalted forms
(tests/test_skew.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    sums: list[str] | None = None,
    counts: bool = True,
    avgs: list[str] | None = None,
    maxs: list[str] | None = None,
    mins: list[str] | None = None,
    n_salts: int = 16,
    salt_on: str | Column | None = None,
) -> DataFrame:
    """Two-phase salted aggregation.

    Output columns: `sum_<c>`, `n_rows`, `avg_<c>`, `max_<c>`, `min_<c>`.
    `salt_on` (default: spark_partition_id) must be uniform-ish; a
    unique id column hashed with xxhash64 is ideal and deterministic.
    """
    sums, avgs, maxs, mins = sums or [], avgs or [], maxs or [], mins or []
    if salt_on is None:
        salt = F.spark_partition_id() % n_salts
    else:
        c = F.col(salt_on) if isinstance(salt_on, str) else salt_on
        salt = F.pmod(F.xxhash64(c), F.lit(n_salts))

    partial_aggs = (
        [F.sum(c).alias(f"__s_{c}") for c in set(sums + avgs)]
        + [F.count(F.lit(1)).alias("__n")]
        + [F.max(c).alias(f"__mx_{c}") for c in maxs]
        + [F.min(c).alias(f"__mn_{c}") for c in mins]
    )
    partial = df.withColumn(_SALT, salt).groupBy(*keys, _SALT).agg(*partial_aggs)

    final_aggs = []
    for c in sums:
        final_aggs.append(F.sum(f"__s_{c}").alias(f"sum_{c}"))
    if counts:
        final_aggs.append(F.sum("__n").alias("n_rows"))
    for c in avgs:
        final_aggs.append((F.sum(f"__s_{c}") / F.sum("__n")).alias(f"avg_{c}"))
    for c in maxs:
        final_aggs.append(F.max(f"__mx_{c}").alias(f"max_{c}"))
    for c in mins:
        final_aggs.append(F.min(f"__mn_{c}").alias(f"min_{c}"))
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    fact_salt_on: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skewed fact ⋈ dim with the dim replicated across n_salts.

    The fact's salt is deterministic (xxhash64 of `fact_salt_on`, or of
    all fact columns when omitted), so retries/replays produce identical
    partitioning. Dim replication multiplies the dim shuffle by n_salts
    — use only when the dim cannot broadcast.
    """
    if fact_salt_on is not None:
        fsalt = F.pmod(F.xxhash64(F.col(fact_salt_on)), F.lit(n_salts))
    else:
        fsalt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    f = fact.withColumn(_SALT, fsalt)
    d = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return f.join(d, [key, _SALT], how).drop(_SALT)
