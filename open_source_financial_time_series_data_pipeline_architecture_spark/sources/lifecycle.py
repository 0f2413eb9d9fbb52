"""Storage lifecycle tiering — the S15 cost plane, Spark-first.

The reference configures S3 lifecycle tiering and estimates per-tier
storage cost (reference src/cost/s3_lifecycle.py:11-88 — Standard 0-30d
→ Intelligent-Tiering 30-90d → Glacier >90d → delete >730d, per-prefix
rules; :90-120 cost estimate by storage class).  Applying a policy is
an object-store API call (boto3 there) — out of engine scope — but
everything decision-shaped is data work, and that belongs here:

- ``lifecycle_policy``: the same policy document, generated from a
  declarative rule list (pure function, no cloud SDK).
- ``assign_tier``: age → tier as a Catalyst CASE expression.
- ``partition_age_audit``: per-TIER rollup of a time-partitioned table
  (partitions, rows, estimated bytes, monthly cost).  At 100 TB this
  aggregates O(days × event-types) pre-combined rows — the shuffle
  carries partition metadata grain, never raw rows, because partial
  aggregation collapses each scan task's contribution first.

The audit is what turns a lifecycle policy from a guess into a plan:
run it before applying the policy and the per-tier GB × rate table IS
the cost estimate the reference hardcodes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# (tier, min_age_days, $/GB-month) — reference tiers and list prices
# (src/cost/s3_lifecycle.py:101-117); 'expired' models the 730-day
# deletion rule as a zero-cost tier so the audit surfaces reclaimable
# volume instead of silently dropping it.
DEFAULT_TIERS: tuple[tuple[str, int, float], ...] = (
    ("standard", 0, 0.023),
    ("intelligent_tiering", 30, 0.023),
    ("glacier", 90, 0.004),
    ("expired", 730, 0.0),
)


def lifecycle_policy(
    prefixes: tuple[str, ...] = ("feature-store/", "raw/"),
    tiers: tuple[tuple[str, int, float], ...] = DEFAULT_TIERS,
) -> dict:
    """Build the lifecycle policy document (reference
    src/cost/s3_lifecycle.py:23-70 shape): one transition rule per
    non-initial, non-expired tier per prefix, plus one expiration rule
    per prefix when an 'expired' tier is present."""
    storage_class = {
        "intelligent_tiering": "INTELLIGENT_TIERING",
        "glacier": "GLACIER",
    }
    rules = []
    for prefix in prefixes:
        slug = prefix.strip("/").replace("/", "-") or "root"
        for tier, min_age, _rate in tiers:
            if tier in storage_class:
                rules.append(
                    {
                        "Id": f"{slug}-to-{tier}-after-{min_age}d",
                        "Status": "Enabled",
                        "Filter": {"Prefix": prefix},
                        "Transitions": [
                            {
                                "Days": min_age,
                                "StorageClass": storage_class[tier],
                            }
                        ],
                    }
                )
            elif tier == "expired":
                rules.append(
                    {
                        "Id": f"{slug}-expire-after-{min_age}d",
                        "Status": "Enabled",
                        "Filter": {"Prefix": prefix},
                        "Expiration": {"Days": min_age},
                    }
                )
    return {"Rules": rules}


def assign_tier(
    age_days: Column,
    tiers: tuple[tuple[str, int, float], ...] = DEFAULT_TIERS,
) -> Column:
    """Age (days) → tier name as one CASE chain, highest threshold
    first so each age lands in the oldest tier it qualifies for.
    Negative ages (a caller-supplied ``asof`` older than some
    partitions) clamp to 0 — not-yet-aged data is 'standard', never a
    NULL tier with a NULL cost."""
    age_days = F.greatest(age_days, F.lit(0))
    expr = None
    for tier, min_age, _rate in sorted(tiers, key=lambda t: -t[1]):
        cond = age_days >= min_age
        expr = F.when(cond, tier) if expr is None else expr.when(cond, tier)
    return expr


def partition_age_audit(
    df: DataFrame,
    time_col: str = "ts",
    row_bytes: Column | None = None,
    tiers: tuple[tuple[str, int, float], ...] = DEFAULT_TIERS,
    asof: Column | None = None,
) -> DataFrame:
    """Per-tier storage rollup of a day-partitioned table.

    ``asof`` defaults to the table's own max day (deterministic on any
    snapshot — no wall clock, so the plan is reproducible and
    oracle-checkable).  ``row_bytes`` defaults to a schema-derived
    serialized-size estimate; pass an exact column when the table
    carries one.  Output: tier, n_days, n_rows, est_gb, monthly_cost.
    """
    day = F.to_date(F.col(time_col)).alias("day")
    if row_bytes is None:
        fixed = 0
        var_terms = []
        for f in df.schema.fields:
            t = f.dataType.simpleString()
            if t in ("string",):
                var_terms.append(
                    F.coalesce(F.octet_length(F.col(f.name)), F.lit(0))
                )
            elif t in ("double", "bigint", "timestamp", "timestamp_ntz"):
                fixed += 8
            elif t in ("int", "float", "date"):
                fixed += 4
            elif t in ("boolean",):
                fixed += 1
            else:  # structs/arrays/binary: leave to caller's row_bytes
                pass
        row_bytes = F.lit(fixed)
        for term in var_terms:
            row_bytes = row_bytes + term
    per_day = df.groupBy(day).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(row_bytes.cast("long")).alias("n_bytes"),
    )
    # the asof anchor is the table's own max day: an all-rows window
    # over the per-DAY aggregate (O(days) rows — broadcast-scale state,
    # not a second scan of the raw table)
    anchor = (
        asof if asof is not None else F.max("day").over(Window.partitionBy())
    )
    aged = per_day.withColumn("age_days", F.datediff(anchor, F.col("day")))
    rate = F.lit(None).cast("double")
    for tier, _min_age, tier_rate in tiers:
        rate = F.when(F.col("tier") == tier, F.lit(tier_rate)).otherwise(rate)
    return (
        aged.withColumn("tier", assign_tier(F.col("age_days"), tiers))
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.round(F.sum("n_bytes") / F.lit(1024.0**3), 6).alias("est_gb"),
        )
        .withColumn("monthly_cost", F.round(F.col("est_gb") * rate, 6))
    )
