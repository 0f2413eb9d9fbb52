"""Bucketed interval (range) join.

The reference's only temporal-join shapes are the as-of join (SURVEY
§2.3 J1-J3) and time-bucket aggregation; a general "rows of R within a
time window after each row of L" join appears in downstream analyses
(impact/forward-return style queries) and has no Spark built-in that
avoids a nested-loop plan: writing the range predicate directly gives
BroadcastNestedLoopJoin / CartesianProduct — O(|L|·|R|) compares, a
non-starter at 100 TB.

The scalable formulation makes the join EQUI on a derived time bucket:

- pick ``bucket_s`` ≥ the window length;
- each left row explodes to the 2 (or few) buckets its window
  ``(left_ts + lower_s, left_ts + upper_s]`` can touch;
- each right row maps to exactly ONE bucket — so a matching pair meets
  exactly once and no post-join dedup is needed;
- the join is ``(keys…, bucket)`` equality (hash-partitionable,
  AQE-skew-splittable) and the exact range predicate filters residual
  pairs inside the join.

Shuffle volume is |L|·(window/bucket + 1) + |R| rows — linear, never
quadratic; both sides co-partition on (keys, bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
    bucket_s: float | None = None,
) -> DataFrame:
    """Inner-join rows of ``right`` whose ``right_ts`` falls in
    ``(left_ts + lower_s, left_ts + upper_s]`` for each left row,
    matching additionally on the equality ``keys``.

    Column names of the two sides must be disjoint apart from ``keys``
    (pre-alias the right side). The helper bucket column is dropped
    from the result.
    """
    if upper_s <= lower_s:
        raise ValueError(f"empty interval: ({lower_s}, {upper_s}]")
    bucket_s = bucket_s or (upper_s - lower_s)

    # epoch as fractional seconds (matches DuckDB epoch()); floor-div to
    # the bucket id as a long
    def _bucket(col):
        return F.floor(F.col(col).cast("double") / F.lit(float(bucket_s)))

    lo = F.floor(
        (F.col(left_ts).cast("double") + F.lit(float(lower_s)))
        / F.lit(float(bucket_s))
    ).cast("long")
    hi = F.floor(
        (F.col(left_ts).cast("double") + F.lit(float(upper_s)))
        / F.lit(float(bucket_s))
    ).cast("long")
    l_exp = left.withColumn("__bucket", F.explode(F.sequence(lo, hi)))
    r_tag = right.withColumn("__bucket", _bucket(right_ts).cast("long"))

    range_pred = (
        r_tag[right_ts].cast("double")
        > l_exp[left_ts].cast("double") + F.lit(float(lower_s))
    ) & (
        r_tag[right_ts].cast("double")
        <= l_exp[left_ts].cast("double") + F.lit(float(upper_s))
    )
    cond = (l_exp["__bucket"] == r_tag["__bucket"]) & range_pred
    for k in keys:
        cond = cond & (l_exp[k] == r_tag[k])

    joined = l_exp.join(r_tag, cond)
    for k in keys:
        joined = joined.drop(r_tag[k])
    return joined.drop(l_exp["__bucket"]).drop(r_tag["__bucket"])
