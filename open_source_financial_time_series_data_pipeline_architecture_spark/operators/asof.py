"""Point-in-time (as-of) join machinery — the system's defining queries.

Re-implements, Spark-first:

- J1  `feature_pit_snapshot(symbol, as_of_ts)` — the 9-CTE
  latest-row-per-feature stored procedure
  (/root/reference/sql/timescaledb_schema.sql:292-411) → `pit_snapshot`.
- J2  Feast `get_historical_features(entity_df, features)` — the
  vectorized as-of join (/root/reference/feast_repo/feature_definitions.py:34-228,
  tests/test_feast_pit_correctness.py:42-151) → `asof_join` /
  `get_historical_features`.

Design: the vectorized as-of join is the **union-and-window** pattern,
not a range join. Entity and feature rows are unioned per key and a
single `last(value, ignorenulls=True)` running window carries the most
recent feature value forward onto each entity row.

Scale notes (100 TB design):
- One shuffle total, on the join key — a theta/range join would either
  explode (row-range cross product) or fall to broadcast-nested-loop.
  The union-and-window plan is O(n log n) per key partition and AQE
  handles key skew.
- `last(..., ignorenulls=True)` over an UNBOUNDED PRECEDING frame is
  computed incrementally by Spark's window operator (no per-row
  re-scan).
- Equal-timestamp semantics match the reference's `ts <= as_of`:
  feature rows sort BEFORE entity probes at the same instant.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class FutureTimestampError(ValueError):
    """PIT guard: as-of timestamps in the future are rejected.

    Mirrors /root/reference/src/features/smartdb_contract.py:200-201.
    """


_TIME, _TAG = "__asof_ts", "__asof_tag"


def asof_join(
    entity: DataFrame,
    feature: DataFrame,
    key: str = "symbol",
    entity_time: str = "event_timestamp",
    feature_time: str = "time",
    values: list[str] | None = None,
    ttl_seconds: float | None = None,
    matched_time_col: str | None = None,
    tiebreak_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each entity row, attach the latest feature row with
    ``feature_time <= entity_time`` (within ``ttl_seconds`` if given).

    Returns the entity rows with the requested ``values`` columns
    appended (NULL when no feature row qualifies — Feast LEFT-join
    semantics).

    ``tiebreak_cols``: feature-side columns (must be in ``values``)
    appended to the carry window's ordering so several feature rows
    sharing the same (key, timestamp) resolve deterministically — the
    repo-wide '(time, trade_id)' determinism convention. Without it the
    carried value among exact-timestamp ties is engine-order dependent.

    ``direction``: ``"backward"`` (default — latest feature row at or
    before the probe, Feast/kdb ``aj`` semantics) or ``"forward"`` —
    the EARLIEST feature row with ``feature_time >= entity_time``
    (next-quote / forward-fill lookup). Forward uses the identical
    single-shuffle union-and-window plan with the timeline traversed
    DESC; the growing UNBOUNDED PRECEDING frame stays incremental in
    either direction (a following-frame formulation would recompute
    per row). With ``ttl_seconds``, a forward match further than ttl
    AFTER the probe is masked to NULL. Equal-timestamp feature rows
    resolve to the row sorting LAST in tiebreak order (largest
    tiebreak) in both directions, matching ``latest_per_key``'s
    ``max_by`` convention.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    values = values or [c for c in feature.columns if c not in (key, feature_time)]
    clash = set(values) & set(entity.columns)
    if clash:
        raise ValueError(f"value columns {sorted(clash)} already exist on entity side")

    e = entity.withColumn(_TIME, F.col(entity_time)).withColumn(_TAG, F.lit(1))
    for v in values:
        e = e.withColumn(v, F.lit(None))
    e = e.withColumn("__ft", F.lit(None).cast("timestamp"))

    f = feature.select(
        F.col(key),
        F.col(feature_time).alias(_TIME),
        F.lit(0).alias(_TAG),
        *[F.col(v) for v in values],
        F.col(feature_time).alias("__ft"),
    )
    for c in entity.columns:
        if c not in (key,):
            f = f.withColumn(c, F.lit(None))

    unioned = e.unionByName(f.select(*e.columns))
    # Feature rows (tag 0) sort before entity probes (tag 1) at the same
    # timestamp → `<=` (backward) / `>=` (forward) semantics, same as
    # the reference PIT proc. Forward traverses the timeline DESC so the
    # growing frame still carries "nearest qualifying feature row".
    if tiebreak_cols:
        missing = set(tiebreak_cols) - set(values)
        if missing:
            raise ValueError(
                f"tiebreak_cols must be value columns, got extras: {sorted(missing)}"
            )
    # tiebreaks only order feature rows among themselves: entity probes
    # carry NULL there and are already separated by the tag column
    time_order = (
        F.col(_TIME).desc() if direction == "forward" else F.col(_TIME).asc()
    )
    order_cols = [time_order, F.col(_TAG).asc()] + [
        F.col(c).asc_nulls_first() for c in (tiebreak_cols or [])
    ]
    w = (
        Window.partitionBy(key)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *[c for c in unioned.columns if c not in values and c != "__ft"],
        *[F.last(v, ignorenulls=True).over(w).alias(v) for v in values],
        F.last("__ft", ignorenulls=True).over(w).alias("__ft"),
    )
    out = carried.filter(F.col(_TAG) == 1)
    if ttl_seconds is not None:
        ttl = F.expr(f"INTERVAL {ttl_seconds} SECONDS")
        if direction == "forward":
            expired = F.col("__ft") > (F.col(entity_time) + ttl)
        else:
            expired = F.col("__ft") < (F.col(entity_time) - ttl)
        out = out.select(
            *[c for c in out.columns if c not in values],
            *[F.when(~expired, F.col(v)).alias(v) for v in values],
        )
    if matched_time_col:
        out = out.withColumn(matched_time_col, F.col("__ft"))
    return out.drop(_TIME, _TAG, "__ft")


def get_historical_features(
    entity: DataFrame,
    features: dict[str, tuple[DataFrame, str]],
    key: str = "symbol",
    entity_time: str = "event_timestamp",
    ttl_seconds: float | None = None,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Feast-style vectorized PIT retrieval over any number of feature
    views in **one shuffle**: all feature rows are unioned with the
    entity probes into a single per-key timeline, and one window pass
    carries every view's latest values forward independently
    (`last(col, ignorenulls=True)` skips rows from other views because
    their columns are NULL there).

    ``features`` maps view name → (DataFrame, time column); every
    non-key, non-time column of each view is attached. Value column
    names must be globally unique across views.

    Scale: F feature views cost ONE exchange + ONE sort regardless of F
    (a chained per-view as-of join would cost F shuffles).
    """
    value_cols: dict[str, list[str]] = {}
    seen: set[str] = set()
    for name, (fdf, tcol) in features.items():
        vals = [c for c in fdf.columns if c not in (key, tcol)]
        clash = (set(vals) & seen) | (set(vals) & set(entity.columns))
        if clash:
            raise ValueError(f"duplicate value columns across views: {sorted(clash)}")
        seen.update(vals)
        value_cols[name] = vals
    all_vals = [v for vals in value_cols.values() for v in vals]

    # entity probes: tag 1, all feature value columns NULL
    e = entity.withColumn(_TIME, F.col(entity_time)).withColumn(_TAG, F.lit(1))
    for v in all_vals:
        e = e.withColumn(v, F.lit(None))
    for name in features:
        e = e.withColumn(f"__ft_{name}", F.lit(None).cast("timestamp"))

    unioned = e
    for name, (fdf, tcol) in features.items():
        f = fdf.select(
            F.col(key),
            F.col(tcol).alias(_TIME),
            F.lit(0).alias(_TAG),
            *[F.col(v) for v in value_cols[name]],
            F.col(tcol).alias(f"__ft_{name}"),
        )
        for c in e.columns:
            if c not in f.columns:
                f = f.withColumn(c, F.lit(None))
        unioned = unioned.unionByName(f.select(*e.columns))

    # optional deterministic tiebreak among equal-timestamp feature rows
    # (columns must exist across the union; NULL on probes/other views)
    w = (
        Window.partitionBy(key)
        .orderBy(
            F.col(_TIME).asc(),
            F.col(_TAG).asc(),
            *[F.col(c).asc_nulls_first() for c in (tiebreak_cols or [])],
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carry = [F.last(v, ignorenulls=True).over(w).alias(v) for v in all_vals]
    carry += [
        F.last(f"__ft_{name}", ignorenulls=True).over(w).alias(f"__ft_{name}")
        for name in features
    ]
    passthrough = [
        c
        for c in unioned.columns
        if c not in all_vals and not c.startswith("__ft_")
    ]
    out = unioned.select(*passthrough, *carry).filter(F.col(_TAG) == 1)

    if ttl_seconds is not None:
        ttl = F.expr(f"INTERVAL {ttl_seconds} SECONDS")
        masked = []
        for name in features:
            expired = F.col(f"__ft_{name}") < (F.col(entity_time) - ttl)
            masked += [
                F.when(~expired, F.col(v)).alias(v) for v in value_cols[name]
            ]
        keep = [c for c in out.columns if c not in all_vals]
        out = out.select(*keep, *masked)
    return out.drop(_TIME, _TAG, *[f"__ft_{name}" for name in features])


def latest_per_key(
    df: DataFrame,
    key_cols: list[str],
    time_col: str,
    as_of=None,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """O1 latest-row-per-key (`ORDER BY ts DESC LIMIT 1` per key,
    /root/reference/sql/timescaledb_schema.sql:314-385) as a single
    hash aggregate: ``max_by(struct(*), (time, tiebreaks))`` — no sort,
    no shuffle beyond the aggregation itself.
    """
    if as_of is not None:
        df = df.filter(F.col(time_col) <= F.lit(as_of))
    payload = F.struct(*[F.col(c) for c in df.columns])
    order_key = F.struct(
        F.col(time_col), *[F.col(c) for c in (tiebreak_cols or [])]
    )
    agg = df.groupBy(*key_cols).agg(F.max_by(payload, order_key).alias("__row"))
    return agg.select("__row.*")


def pit_snapshot(
    spark: SparkSession,
    features: dict[str, tuple[DataFrame, str, list[str]]],
    symbol: str,
    as_of,
    key: str = "symbol",
    now=None,
    tiebreak_cols: dict[str, list[str]] | None = None,
) -> DataFrame:
    """A11/J1 — scalar PIT snapshot: one wide row for (symbol, as_of).

    ``features`` maps a label → (DataFrame, time column, value columns);
    value columns must be pre-aliased to globally-unique names. Each
    feature contributes its latest row ≤ as_of; missing features are
    NULL, matching the reference's `LEFT JOIN ... ON TRUE` of 1-row
    CTEs (/root/reference/sql/timescaledb_schema.sql:401-409).

    Raises FutureTimestampError for as_of in the future — the contract's
    leakage guard (smartdb_contract.py:200-201).
    """
    now = now or _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
    as_of_ts = as_of if isinstance(as_of, _dt.datetime) else _dt.datetime.fromisoformat(str(as_of))
    if as_of_ts > now:
        raise FutureTimestampError(
            f"as_of {as_of_ts!r} is in the future (now={now!r})"
        )

    out = spark.createDataFrame(
        [(symbol, as_of_ts)], f"{key} string, snapshot_time timestamp"
    )
    for label, (fdf, tcol, vals) in features.items():
        one = latest_per_key(
            fdf.filter(F.col(key) == symbol),
            [key],
            tcol,
            as_of=as_of_ts,
            tiebreak_cols=(tiebreak_cols or {}).get(label),
        ).select(*vals)
        # LEFT JOIN ON TRUE: an empty feature contributes NULLs, not an
        # empty result (reference schema.sql:401-409).
        out = out.join(F.broadcast(one), F.lit(True), "left")
    return out
