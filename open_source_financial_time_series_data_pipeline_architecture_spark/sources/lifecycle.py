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
    # the asof anchor is the table's own max day — a broadcast 1-row
    # aggregate joined back (round 9: the earlier unpartitioned-window
    # form forced the per-day frame through a single partition; the
    # broadcast join keeps the same O(days) state with no
    # single-partition stage, and AQE reuses the per-day exchange for
    # both branches)
    if asof is not None:
        aged = per_day.withColumn(
            "age_days", F.datediff(asof, F.col("day"))
        )
    else:
        anchor = per_day.agg(F.max("day").alias("__asof"))
        aged = (
            per_day.crossJoin(F.broadcast(anchor))
            .withColumn(
                "age_days", F.datediff(F.col("__asof"), F.col("day"))
            )
            .drop("__asof")
        )
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


# -- cost budget + auto-scaling limits (reference src/cost/
# cost_budget.py:14-140) ---------------------------------------------------

#: the reference's monthly cost breakdown (cost_budget.py:26-35) minus
#: the two S3 lines — those are DERIVED from the data here (the
#: partition_age_audit per-tier costs replace the hardcoded 50/10).
DEFAULT_COMPUTE_BREAKDOWN: tuple[tuple[str, float], ...] = (
    ("timescaledb", 500.0),
    ("flink", 800.0),
    ("spark", 600.0),
    ("kafka", 400.0),
    ("gpu", 500.0),
    ("other", 540.0),
)

#: auto-scaling limits (cost_budget.py:100-128)
AUTOSCALING_LIMITS: dict[str, dict] = {
    "flink_taskmanagers": {"min": 2, "max": 10},
    "spark_executors": {"min": 2, "max": 20},
    "gpu_instances": {"min": 0, "max": 4},
    "kafka_brokers": {"min": 3, "max": 6},
}


def validate_scaling_request(resource_type: str, target_replicas: int) -> bool:
    """cost_budget.py:134-140 — a scaling request outside the
    [min, max] band (or for an unknown resource) is rejected; the
    band caps cost explosion regardless of autoscaler enthusiasm."""
    policy = AUTOSCALING_LIMITS.get(resource_type)
    if not policy:
        return False
    return policy["min"] <= target_replicas <= policy["max"]


def budget_enforcement(
    df: DataFrame,
    time_col: str = "ts",
    monthly_budget: float = 3000.0,
    breakdown: tuple[tuple[str, float], ...] = DEFAULT_COMPUTE_BREAKDOWN,
    tiers: tuple[tuple[str, int, float], ...] = DEFAULT_TIERS,
) -> DataFrame:
    """The reference's ``check_budget_violation`` + ``enforce_budget``
    (cost_budget.py:48-97) as one deterministic report: month-to-date
    cost = daily rate × days elapsed, where days elapsed is the DATA's
    own span (max day − min day + 1 — no wall clock) and the two S3
    storage lines come from the live ``partition_age_audit`` instead
    of the reference's hardcoded estimates. Rows:

    - ``(item, 'component_cost', mtd_cost, NULL)`` per component;
    - budget rows: current_cost / budget / utilization_percent /
      remaining / violated (1.0 or 0.0);
    - when violated, the reference's three enforcement actions
      (``scale_down_spark`` → 1 replica, ``scale_down_gpu`` → 0,
      ``enable_s3_lifecycle`` → glacier), amount = target replicas.

    Scale shape: the audit is the only data-touching leg (per-day
    partial agg); everything else is arithmetic over one broadcast
    1-row frame and an exploded literal array."""
    audit = partition_age_audit(df, time_col=time_col, tiers=tiers)
    s3 = audit.agg(
        F.sum(
            F.when(
                F.col("tier").isin("standard", "intelligent_tiering"),
                F.col("monthly_cost"),
            ).otherwise(0.0)
        ).alias("s3_standard"),
        F.sum(
            F.when(F.col("tier") == "glacier", F.col("monthly_cost"))
            .otherwise(0.0)
        ).alias("s3_glacier"),
    )
    days = df.agg(
        (
            F.datediff(
                F.to_date(F.max(time_col)), F.to_date(F.min(time_col))
            )
            + 1
        ).alias("days")
    )
    one = days.crossJoin(F.broadcast(s3))
    fixed_total = sum(r for _, r in breakdown)
    monthly = (
        F.lit(float(fixed_total)) + F.col("s3_standard") + F.col("s3_glacier")
    )
    current = monthly / 30.0 * F.col("days")
    violated = current > F.lit(float(monthly_budget))
    mtd = lambda rate: rate / 30.0 * F.col("days")  # noqa: E731

    def ent(item, kind, amount, detail):
        return F.struct(
            item.alias("item") if isinstance(item, Column) else F.lit(item).alias("item"),
            F.lit(kind).alias("kind"),
            F.round(amount, 6).cast("double").alias("amount"),
            (detail if isinstance(detail, Column) else F.lit(detail))
            .cast("string")
            .alias("detail"),
        )

    entries = [
        ent(name, "component_cost", mtd(F.lit(rate)), None)
        for name, rate in breakdown
    ]
    entries.append(
        ent("s3_standard", "component_cost", mtd(F.col("s3_standard")), None)
    )
    entries.append(
        ent("s3_glacier", "component_cost", mtd(F.col("s3_glacier")), None)
    )
    entries.append(ent("current_cost", "budget", current, None))
    entries.append(
        ent("budget", "budget", F.lit(float(monthly_budget)), None)
    )
    entries.append(
        ent(
            "utilization_percent",
            "budget",
            current * 100.0 / F.lit(float(monthly_budget)),
            None,
        )
    )
    entries.append(
        ent(
            "remaining", "budget", F.lit(float(monthly_budget)) - current,
            None,
        )
    )
    entries.append(
        ent(
            "violated", "budget",
            F.when(violated, 1.0).otherwise(0.0), None,
        )
    )
    # enforcement actions (cost_budget.py:77-92): emitted only when
    # violated — the item is NULLed otherwise and filtered after the
    # explode, so the report stays one projection
    for item, target, detail in (
        ("scale_down_spark", 1.0, "Budget exceeded"),
        ("scale_down_gpu", 0.0, "Budget exceeded"),
        ("enable_s3_lifecycle", None, "glacier"),
    ):
        entries.append(
            ent(
                F.when(violated, item),
                "action",
                F.lit(target).cast("double"),
                detail,
            )
        )
    return (
        one.select(F.explode(F.array(*entries)).alias("e"))
        .select("e.*")
        .filter(F.col("item").isNotNull())
    )
