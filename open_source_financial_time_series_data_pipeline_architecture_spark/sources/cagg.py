"""Continuous aggregates: incrementally-maintained materialized
aggregates over a versioned table.

The reference's centerpiece feature: its 11 "Smart-DB" features are
TimescaleDB continuous aggregates with refresh policies
(sql/timescaledb_schema.sql:44-65 ``ohlc_1m_agg``, :84-99, :141-159,
:162-178, :218-238 — ``CREATE MATERIALIZED VIEW ... WITH
(timescaledb.continuous)`` + ``add_continuous_aggregate_policy``).
TimescaleDB maintains them by INVALIDATION: writes to the hypertable
log which time ranges they dirtied, and a refresh re-aggregates ONLY
the invalidated buckets, merging the result into the materialized
store. This module is that model rebuilt Spark-first on the versioned
(Delta-lite) table:

- the **invalidation log is the change data feed**: ``refresh()`` reads
  ``read_changes(base, last_refreshed, head)`` — O(touched commits),
  never a base-table scan — and the distinct ``(bucket, group...)``
  keys in it are exactly the dirty buckets;
- the **dirty buckets are recomputed from the base table** under a
  time-envelope predicate (manifest min/max data skipping prunes every
  file outside the dirty window) plus a semi-join on the dirty keys —
  at 100 TB a refresh after an hour of appends reads that hour's
  files, not the decade;
- the **materialized store is itself a versioned table**, updated with
  one MERGE (file-level merge pruning: only the agg files whose key
  envelopes overlap the dirty buckets rewrite) and, when deletions
  emptied a bucket, one key-scoped delete-merge;
- the **high-water mark is the base table's commit version**, recorded
  in the agg table's ``txn`` map (the same idempotent-sink mechanism
  streaming uses) — a crashed refresh replays safely because
  recompute-and-merge of the same range is a PURE function of the base
  snapshot (at-least-once + idempotent = exactly-once effect).

Recompute-not-decrement is the TimescaleDB design and the reason any
aggregate works here: min/max/percentiles cannot be decremented when
rows are deleted, but re-aggregating only the dirty buckets sidesteps
subtraction entirely — DELETEs, UPDATEs (copy-on-write or
deletion-vector), MERGEs and OVERWRITEs of the base all flow through
the same CDF → dirty-keys → recompute path.

``read_realtime()`` is TimescaleDB's real-time continuous aggregate:
materialized rows for clean buckets UNION an on-the-fly recompute of
the buckets dirtied since the last refresh — exact results with zero
refresh lag, at the cost of aggregating only the unrefreshed tail.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.sources import (
    versioned as V,
)

#: below this many dirty (bucket, group) keys the semi-/anti-join side
#: is broadcast; beyond it (a huge backfill dirtied everything) fall
#: back to a shuffled join rather than a driver-sized broadcast
_DIRTY_BROADCAST_MAX_KEYS = 100_000

#: above this many distinct out-of-window dirty buckets, store their
#: min/max ENVELOPE as one pending range instead of collecting every
#: epoch to the driver — over-invalidation is always safe here
#: (recompute-not-decrement), unbounded collects are not
_PENDING_COLLECT_MAX = 10_000


def _coalesce_ranges(ranges: list) -> list[list[int]]:
    """Sort and merge overlapping/adjacent [lo, hi) epoch ranges."""
    out: list[list[int]] = []
    for lo, hi in sorted([int(r[0]), int(r[1])] for r in ranges):
        if out and lo <= out[-1][1]:
            out[-1][1] = max(out[-1][1], hi)
        else:
            out.append([lo, hi])
    return out


def _clip_ranges(
    ranges: list, ws: int | None, we: int | None, inside: bool
) -> list[list[int]]:
    """The parts of [lo, hi) ranges inside (or outside) window
    [ws, we) — None bounds are unbounded."""
    lo_b = ws if ws is not None else -(2**62)
    hi_b = we if we is not None else 2**62
    out: list[list[int]] = []
    for lo, hi in ranges:
        if inside:
            lo2, hi2 = max(lo, lo_b), min(hi, hi_b)
            if lo2 < hi2:
                out.append([lo2, hi2])
        else:
            if lo < lo_b:
                out.append([lo, min(hi, lo_b)])
            if hi > hi_b:
                out.append([max(lo, hi_b), hi])
    return _coalesce_ranges(out)


class ContinuousAggregate:
    """An incrementally-refreshed time-bucketed aggregate of a
    versioned table (TimescaleDB continuous-aggregate analog).

    ``aggs`` maps output column names to Spark aggregate Columns over
    the base table's columns (e.g. ``{"n": F.count(F.lit(1)),
    "sum_vol": F.sum("volume")}``). ``bucket_col`` (default
    ``bucket_start``) is a timestamp column holding
    ``time_bucket(bucket_seconds, time_col)`` — epoch-floor bucketing,
    exactly TimescaleDB's ``time_bucket``.
    """

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        agg_dir: str,
        *,
        time_col: str,
        bucket_seconds: int,
        group_cols: list[str],
        aggs: dict,
        bucket_col: str = "bucket_start",
        app_id: str | None = None,
        ignore_retention: bool = True,
        enrich=None,
    ):
        if not aggs:
            raise ValueError("aggs must name at least one aggregate")
        overlap = {bucket_col, *group_cols} & set(aggs)
        if overlap:
            raise ValueError(f"aggs collide with key columns: {overlap}")
        self.spark = spark
        self.base_dir = base_dir
        self.agg_dir = agg_dir
        self.time_col = time_col
        self.bucket_seconds = int(bucket_seconds)
        self.group_cols = list(group_cols)
        self.aggs = dict(aggs)
        self.bucket_col = bucket_col
        self.app_id = app_id or f"cagg:{os.path.basename(agg_dir)}"
        #: TimescaleDB semantics (default): ``drop_chunks`` retention
        #: commits on the base do NOT invalidate the aggregate — the
        #: materialized history outlives the raw data it summarized.
        #: False opts into strict base-mirroring (retention deletes
        #: un-materialize their buckets like any other delete).
        self.ignore_retention = ignore_retention
        #: CAGG WITH JOINS (TimescaleDB 2.10+): ``enrich`` is a
        #: callable applied to RAW BASE ROWS on every read path
        #: (create, refresh recompute, invalidation keying, realtime)
        #: before bucketing — the canonical use is a broadcast
        #: equi-join onto a dimension table so ``group_cols``/``aggs``
        #: can reference dimension columns. TimescaleDB's contract
        #: carries over exactly: invalidation tracks ONLY the
        #: hypertable (base CDF); a dimension change does NOT dirty
        #: existing buckets — the next refresh of a dirty bucket sees
        #: the CURRENT dimension (call refresh over a window to force
        #: re-enrichment after a dim change).
        self.enrich = enrich
        #: set by on_cagg() — the parent aggregate in a hierarchy
        self.parent: "ContinuousAggregate | None" = None
        #: head-version-memoized commit-log scans (_scan_user_meta):
        #: pending-invalidation state on the agg store, retention
        #: horizon on the base — each refresh/read pays only the
        #: commits that landed since the previous call
        self._pending_cache: dict = {}
        self._retention_cache: dict = {}

    @classmethod
    def on_cagg(
        cls,
        parent: "ContinuousAggregate",
        agg_dir: str,
        *,
        bucket_seconds: int,
        aggs: dict,
        group_cols: list[str] | None = None,
        bucket_col: str | None = None,
        app_id: str | None = None,
    ) -> "ContinuousAggregate":
        """HIERARCHICAL continuous aggregate (TimescaleDB's
        cagg-on-cagg — the 1m→5m→1h bar-rollup family, reference
        sql/timescaledb_schema.sql:44-57,162-178): the child's base IS
        the parent's materialized store. That store is itself a
        versioned table with a change feed, so the invalidation
        plumbing is IDENTICAL — a parent refresh that merges new 1m
        buckets (or delete-merges emptied ones) produces CDF rows, and
        the child's refresh reads exactly those to find its dirty 5m
        buckets. Nothing ever re-reads the raw base table at the
        child's level.

        Contracts (the same ones TimescaleDB imposes):
        - ``bucket_seconds`` must be a whole multiple of the parent's —
          otherwise a child bucket would split a parent bucket and the
          rollup would be unanswerable from parent partials;
        - ``aggs`` must be expressed over the parent's PARTIALS
          (counts/sums re-sum, min/max re-min/re-max, avg = sum/count
          carried as two partials) — combinability is the user's
          declaration, exactly like a TimescaleDB hierarchical cagg;
        - ``group_cols`` must be a subset of the parent's (a column the
          parent aggregated away cannot reappear);
        - the child's view of the world is the parent's MATERIALIZED
          store: refresh the parent first (``refresh_hierarchy()``) for
          end-to-end freshness. ``read_realtime()`` on the child is
          exact w.r.t. the parent store's head, not the raw base —
          TimescaleDB's ``materialized_only`` caveat for hierarchies.
        """
        if bucket_seconds % parent.bucket_seconds != 0:
            raise ValueError(
                f"child bucket ({bucket_seconds}s) must be a whole "
                f"multiple of the parent bucket ({parent.bucket_seconds}s)"
            )
        gcols = parent.group_cols if group_cols is None else list(group_cols)
        extra = set(gcols) - set(parent.group_cols)
        if extra:
            raise ValueError(
                f"child group_cols not in the parent aggregate: {extra}"
            )
        child = cls(
            parent.spark,
            parent.agg_dir,
            agg_dir,
            time_col=parent.bucket_col,
            bucket_seconds=bucket_seconds,
            group_cols=gcols,
            aggs=aggs,
            bucket_col=bucket_col or parent.bucket_col,
            app_id=app_id,
        )
        child.parent = parent
        return child

    def refresh_hierarchy(self, reports: list | None = None) -> dict:
        """Refresh the whole ancestor chain base-most first, then this
        aggregate — one invalidation-driven refresh per level, each
        reading only the level below's change feed. ``reports`` (a
        list, optional) collects one refresh report dict per level,
        root first."""
        if self.parent is not None:
            self.parent.refresh_hierarchy(reports)
        rep: dict | None = None if reports is None else {}
        out = self.refresh(report=rep)
        if reports is not None:
            reports.append(rep)
        return out

    # -- bucketing ---------------------------------------------------

    def _bucket(self, col) -> Column:
        """``time_bucket(bucket_seconds, col)``: floor the epoch to the
        bucket grid, back to a timestamp. Pure arithmetic — the same
        expression aggregates the base scan and keys the change rows,
        so a row always lands in the same bucket on both paths."""
        s = F.lit(self.bucket_seconds)
        return F.timestamp_seconds(
            F.floor(F.col(col).cast("double") / s).cast("long") * s
        )

    def _keys(self) -> list[str]:
        return [self.bucket_col, *self.group_cols]

    def _enriched(self, rows: DataFrame) -> DataFrame:
        """Raw base rows through the optional JOIN enrichment — the one
        seam every base-reading path shares, so dimension columns exist
        wherever group keys are computed."""
        return self.enrich(rows) if self.enrich is not None else rows

    def _aggregate(self, rows: DataFrame) -> DataFrame:
        """bucket + group + the user aggregates, over base-table rows.
        Rows with a NULL time are excluded on EVERY path (create,
        refresh, realtime): a NULL bucket key can never be semi-joined,
        merged, or deleted (SQL NULL-key semantics), so a NULL-bucket
        row materialized once would be unmaintainable forever — better
        to state the contract: the aggregate covers timestamped rows."""
        return (
            self._enriched(rows)
            .filter(F.col(self.time_col).isNotNull())
            .withColumn(self.bucket_col, self._bucket(self.time_col))
            .groupBy(*self._keys())
            .agg(*[c.alias(n) for n, c in self.aggs.items()])
        )

    # -- lifecycle ---------------------------------------------------

    def create(self) -> dict:
        """Materialize the aggregate from the CURRENT base snapshot and
        record the consumed base version — one full aggregation, the
        only time the whole base table is ever read."""
        base_head = V._list_versions(self.base_dir)[-1]
        df = self._aggregate(V.read_version(self.spark, self.base_dir))
        return V.commit(
            df,
            self.agg_dir,
            mode="overwrite",
            txn=(self.app_id, base_head),
        )

    def last_refreshed_version(self) -> int:
        v = V.last_txn_version(self.agg_dir, self.app_id)
        if v is None:
            raise FileNotFoundError(
                f"continuous aggregate at {self.agg_dir} was never "
                "created (no high-water mark for app_id "
                f"{self.app_id!r}) — call create() first"
            )
        return v

    def _retention_versions(self, last: int, head: int) -> set[int]:
        """Base commits in (last, head] carrying RETENTION_METADATA —
        drop_chunks commits the invalidation walk skips when
        ``ignore_retention`` (never read, not read-then-filtered)."""
        if not self.ignore_retention:
            return set()
        return {
            v
            for v in V._list_versions(self.base_dir)
            if last < v <= head
            and V.is_retention_metadata(
                V._read_segment(self.base_dir, v).get("user_metadata")
            )
        }

    def _base_retention_horizon(self) -> float | None:
        """The base table's retention horizon for ``time_col`` (epoch
        seconds): the largest cutoff any ``drop_chunks`` commit
        recorded. Buckets wholly below it can no longer be re-derived
        (their raw rows are gone), so under ``ignore_retention`` the
        refresh/realtime paths refuse to treat them as dirty — the
        materialized history stands as final, TimescaleDB's
        aggregates-outlive-raw contract made safe even when a policy
        window or pending range reaches below the horizon. Cached by
        head version: each call walks only the commits that landed
        since the last one (never re-pays history)."""

        def _extract(um):
            return V.retention_horizon_from_metadata(um, self.time_col)

        def _combine(old, new):
            return new if old is None else max(old, new)

        return self._scan_user_meta(
            self.base_dir,
            self._retention_cache,
            _extract,
            _combine,
            first_only=False,  # horizons need not be monotone across
            # manual drop_chunks calls — fold EVERY unseen commit's
            # cutoff through max, never just the newest
        )

    def _horizon_grid(self) -> int | None:
        """The retention horizon rounded UP to the bucket grid: a
        bucket the cutoff lands inside may have lost some of its rows
        (a chunk wholly below the cutoff can hold part of a straddling
        bucket), so it is unrefreshable too — only buckets that start
        at or after the ceiling are provably intact."""
        hz = self._base_retention_horizon()
        if hz is None:
            return None
        import math

        b = self.bucket_seconds
        return int(math.ceil(hz / b)) * b

    def _scan_user_meta(
        self,
        table_dir: str,
        cache: dict,
        extract,
        combine,
        first_only: bool = True,
    ) -> object:
        """Newest-wins backward commit-log scan for user_metadata state,
        memoized by head version: repeated calls cost O(commits since
        the last call), not O(history) — the repo's O(touched) contract
        (round-8 fix: a store that never carried the key used to re-walk
        its ENTIRE log on every refresh/read_realtime). ``extract(um)``
        returns a value or None; ``combine(cached, found)`` merges a
        newly found value with the cached one (newest-wins states pass
        ``lambda old, new: new``; monotone ones pass max)."""
        versions = V._list_versions(table_dir)
        if not versions:
            return cache.get("val")
        head = versions[-1]
        floor = cache.get("head")
        if floor is not None and head <= floor:
            return cache.get("val")
        found = None
        for v in reversed(versions):
            if floor is not None and v <= floor:
                break
            um = V._read_segment(table_dir, v).get("user_metadata")
            if not um:
                continue
            val = extract(um)
            if val is None:
                continue
            if first_only:  # newest-wins state: the first backward hit
                found = val
                break
            # fold semantics: an older unseen commit may still dominate
            found = val if found is None else combine(found, val)
        cache["head"] = head
        if found is not None:
            cache["val"] = combine(cache.get("val"), found)
        return cache.get("val")

    def _dirty_keys(self, last: int, head: int) -> DataFrame:
        """The distinct (bucket, group...) keys touched by base commits
        in (last, head] — the invalidation set, straight off the change
        feed (inserts AND deletes both dirty their bucket). Retention
        commits are skipped under ``ignore_retention`` (TimescaleDB:
        aggregates outlive dropped raw chunks)."""
        ch = V.read_changes(
            self.spark,
            self.base_dir,
            last,
            head,
            skip_versions=self._retention_versions(last, head),
        )
        return (
            self._enriched(ch)
            .filter(F.col(self.time_col).isNotNull())
            .withColumn(self.bucket_col, self._bucket(self.time_col))
            .select(*self._keys())
            .distinct()
        )

    def _recompute(self, dirty: DataFrame, head: int, n_dirty: int, report: dict | None) -> DataFrame:
        """Re-aggregate ONLY the dirty buckets from the base table at
        version ``head``: a time-envelope predicate prunes files via
        manifest min/max skipping, then a semi-join scopes rows to the
        dirty keys. O(data in dirty buckets), not O(base)."""
        lo, hi = dirty.agg(
            F.min(self.bucket_col), F.max(self.bucket_col)
        ).first()
        prune: dict = {}
        rows = V.read_version(
            self.spark,
            self.base_dir,
            version=head,
            predicates=[
                (self.time_col, ">=", lo),
                # rows of the max bucket run to its exclusive end
                (
                    self.time_col,
                    "<",
                    hi + datetime.timedelta(seconds=self.bucket_seconds),
                ),
            ],
            prune_report=prune,
        )
        if report is not None:
            report["base_files_total"] = prune.get("files_total")
            report["base_files_read"] = prune.get("files_kept")
        side = (
            F.broadcast(dirty)
            if n_dirty <= _DIRTY_BROADCAST_MAX_KEYS
            else dirty
        )
        scoped = (
            self._enriched(rows)
            .withColumn(self.bucket_col, self._bucket(self.time_col))
            .join(side, self._keys(), "left_semi")
        )
        return (
            scoped.groupBy(*self._keys())
            .agg(*[c.alias(n) for n, c in self.aggs.items()])
        )

    def refresh(
        self,
        report: dict | None = None,
        *,
        window_start=None,
        window_end=None,
        force: bool = False,
    ) -> dict:
        """One invalidation-driven refresh: CDF since the last consumed
        base version → dirty keys → recompute those buckets → MERGE
        into the materialized table (+ delete buckets that emptied).
        Idempotent under replay — recompute-and-merge of the same range
        is a pure function of the base snapshot; the base version
        high-water lands in the agg table's txn map with the merge.
        Returns the agg table's head snapshot.

        ``window_start`` / ``window_end`` scope the refresh to buckets
        with ``bucket_start`` in ``[window_start, window_end)`` —
        TimescaleDB's ``refresh_continuous_aggregate(start, end)`` /
        policy ``start_offset``/``end_offset`` (the reference's own
        policy calls, sql/timescaledb_schema.sql:60-65). Bounds are
        epoch seconds or datetimes (naive = UTC), floored to the bucket
        grid; ``None`` is unbounded. Dirty buckets OUTSIDE the window
        are NOT lost: they persist as PENDING INVALIDATION RANGES
        (TimescaleDB's materialization invalidation log) in the agg
        table's commit ``user_metadata`` — transactional with the
        refresh itself — and materialize when a later refresh window
        covers them; ``read_realtime()`` treats them as dirty
        meanwhile. The version high-water always advances to ``head``:
        the pending ranges, not the watermark, carry what remains.

        ``force=True`` (TimescaleDB 2.13's ``refresh_continuous_
        aggregate(..., force => true)``): re-materialize EVERY bucket
        in the window — base keys AND already-materialized keys — even
        if nothing invalidated them. The one way to re-derive buckets
        whose group keys no longer flow from the base: after a
        dimension change under an ``enrich`` join (stale sectors), or
        after editing the aggregate definition. An unbounded force
        refresh covers the union of the base's and the store's time
        envelopes (manifest stats, no data scan), so orphaned
        materialized keys delete-detect too. The retention guard still
        applies: below-horizon buckets keep their history."""
        last = self.last_refreshed_version()
        versions = V._list_versions(self.base_dir)
        head = versions[-1]
        ws, we = self._win_bounds(window_start, window_end)
        pending = self._pending_ranges()
        hz = None
        if self.ignore_retention:
            # retention guard (round 8): a pending range whose raw rows
            # were drop_chunks-expired would recompute from an EMPTY
            # base and delete-merge its materialized history away (the
            # TimescaleDB policy-window-below-retention foot-gun).
            # Clip pending at the base's recorded horizon — those
            # buckets' materialized values stand as final; the clipped
            # state is what gets re-persisted below. ignore_retention=
            # False is the escape hatch (strict base-mirroring).
            hz = self._horizon_grid()
            if hz is not None:
                pending = _clip_ranges(pending, hz, None, inside=True)
        pend_in = _clip_ranges(pending, ws, we, inside=True)
        pend_out = _clip_ranges(pending, ws, we, inside=False)
        if force:
            # forced re-materialization: fold the whole in-window
            # envelope (base ∪ store, manifest stats — no data scan)
            # into the range-scoped dirty set; _keys_in_ranges already
            # unions BASE and MATERIALIZED keys, so stale group keys
            # that no longer derive from the base delete-detect too
            env = self._force_envelope(ws, we, hz)
            if env:
                pend_in = _coalesce_ranges(pend_in + env)
        if report is not None:
            report.update({"from_version": last, "to_version": head})
        if head <= last and not pend_in:
            if report is not None:
                report["refreshed"] = False
            return V._snapshot(
                self.agg_dir, V._list_versions(self.agg_dir)[-1],
                with_stats=False,
            )
        b = self.bucket_seconds
        new_out: list[list[int]] = []
        cdf_in = None
        if head > last:
            cdf = self._dirty_keys(last, head)
            if ws is not None or we is not None:
                ep = F.col(self.bucket_col).cast("double").cast("long")
                in_cond = F.lit(True)
                if ws is not None:
                    in_cond = in_cond & (ep >= ws)
                if we is not None:
                    in_cond = in_cond & (ep < we)
                out_df = (
                    cdf.filter(~in_cond).select(ep.alias("e")).distinct()
                )
                n_out = out_df.count()
                if n_out > _PENDING_COLLECT_MAX:
                    # collapse PER SIDE of the window — one envelope
                    # spanning both sides would also cover the region
                    # this very refresh just materialized, re-dirtying
                    # it for the next covering refresh (round-8 fix)
                    e = F.col("e")
                    sides = []
                    if ws is not None:
                        sides.append(F.when(e < ws, e))
                    if we is not None:
                        sides.append(F.when(e >= we, e))
                    row = out_df.agg(
                        *[
                            a
                            for s in sides
                            for a in (F.min(s), F.max(s))
                        ]
                    ).first()
                    new_out = [
                        [int(row[i]), int(row[i + 1]) + b]
                        for i in range(0, len(row), 2)
                        if row[i] is not None
                    ]
                elif n_out:
                    new_out = _coalesce_ranges(
                        [[r[0], r[0] + b] for r in out_df.collect()]
                    )
                cdf_in = cdf.filter(in_cond)
            else:
                cdf_in = cdf
        new_pending = _coalesce_ranges(pend_out + new_out)
        meta = self._pending_meta(new_pending, pending)
        # this refresh's txn mark: only when the base head advanced —
        # a pure pending-range drain at an unchanged head must not be
        # swallowed by the exactly-once replay check
        txn = (self.app_id, head) if head > last else None

        dirty = cdf_in
        if pend_in:
            in_range = self._keys_in_ranges(pend_in, head)
            dirty = (
                in_range if dirty is None
                else dirty.unionByName(in_range).distinct()
            )
        dirty = dirty.persist()
        try:
            n_dirty = dirty.count()
            if report is not None:
                report["buckets_dirty"] = n_dirty
                report["refreshed"] = True
                report["pending_after"] = len(new_pending)
            if n_dirty == 0:
                # optimize/metadata-only commits (or pending ranges
                # whose content vanished everywhere): nothing to
                # recompute, but advance the high-water / pending state
                # so the next refresh does not re-walk these segments.
                return self._advance_highwater(head, txn, meta)
            fresh = self._recompute(dirty, head, n_dirty, report)
            # buckets whose rows were ALL deleted produce no recomputed
            # row — they must leave the materialized table
            dead_keys = dirty.join(fresh, self._keys(), "left_anti")
            dead = dead_keys
            for name in self.aggs:  # align schema for the delete-merge
                # cast through the exact DataType object, not its string
                # form: "array<string>" parses with containsNull=true,
                # which silently differs from a collect_set-produced
                # containsNull=false column and fails the merge schema
                # check the first time a DELETE empties a sketch bucket
                dead = dead.withColumn(
                    name, F.lit(None).cast(fresh.schema[name].dataType)
                )
            n_dead = dead.count()
            if report is not None:
                report["buckets_deleted"] = n_dead
            if n_dead:
                V.merge(
                    self.spark,
                    self.agg_dir,
                    dead,
                    keys=self._keys(),
                    when_matched="delete",
                    when_not_matched="ignore",
                )
            if n_dead == n_dirty:
                # EVERY dirty bucket emptied (a restore/overwrite that
                # dropped a whole load): `fresh` is empty and a MERGE
                # with an empty source publishes nothing — the txn
                # high-water must land via the zero-row append instead,
                # or every later refresh re-walks these segments
                # forever (found by the policy-across-restore test).
                return self._advance_highwater(head, txn, meta)
            return V.merge(
                self.spark,
                self.agg_dir,
                fresh,
                keys=self._keys(),
                txn=txn,
                user_metadata=meta,
            )
        finally:
            dirty.unpersist()

    # -- windowed refresh / pending invalidations ----------------------

    def _win_bounds(self, window_start, window_end):
        """Normalize window bounds to bucket-grid-floored epoch seconds
        (int) or None. Accepts epoch numbers or datetimes (naive=UTC)."""
        import calendar
        import math

        b = self.bucket_seconds

        def _ep(x):
            if x is None:
                return None
            if isinstance(x, (int, float)):
                e = float(x)
            elif isinstance(x, datetime.datetime):
                e = (
                    x.timestamp()
                    if x.tzinfo is not None
                    else calendar.timegm(x.timetuple())
                    + x.microsecond / 1e6
                )
            else:
                raise TypeError(
                    f"window bound must be epoch seconds or datetime, "
                    f"got {type(x).__name__}"
                )
            return int(math.floor(e / b)) * b

        ws, we = _ep(window_start), _ep(window_end)
        if ws is not None and we is not None and ws >= we:
            raise ValueError("window_start must be before window_end")
        return ws, we

    def _pending_ranges(self) -> list[list[int]]:
        """The persisted pending-invalidation ranges: the most recent
        agg-store commit whose user_metadata carries ``cagg_pending``
        (this aggregate's app_id namespaces the key, so several caggs
        could share a store dir without clashing). Memoized by head
        version (``_scan_user_meta``) AND every refresh commit now
        restates the key — even as ``[]`` — so the backward walk stops
        at the last refresh instead of re-reading a year of history on
        every refresh()/read_realtime() (round-8 O(touched) fix)."""
        import json as _json

        key = f"cagg_pending:{self.app_id}"

        def _extract(um):
            try:
                d = _json.loads(um)
            except ValueError:
                return None
            if isinstance(d, dict) and key in d:
                return _coalesce_ranges(d[key])  # [] = "present, empty"
            return None

        val = self._scan_user_meta(
            self.agg_dir,
            self._pending_cache,
            _extract,
            lambda old, new: new,  # newest commit's state wins outright
        )
        return [list(r) for r in val] if val else []

    def _pending_meta(
        self, new_pending: list[list[int]], old_pending: list[list[int]]
    ) -> str:
        """user_metadata recording the new pending state. ALWAYS
        restated — an explicit ``[]`` on every refresh commit bounds
        ``_pending_ranges``'s backward walk at the most recent refresh
        (and keeps the state alive across a vacuum that drops the
        commit that last carried it)."""
        import json as _json

        return _json.dumps({f"cagg_pending:{self.app_id}": new_pending})

    def _keys_in_ranges(self, ranges: list[list[int]], head: int) -> DataFrame:
        """ALL (bucket, group...) keys living in the given epoch ranges
        — in the base at ``head`` (inserts/updates) plus in the
        materialized store (so buckets whose rows vanished get delete-
        detected). Range-scoped pending refreshes recompute whole
        regions, TimescaleDB-style, because per-key invalidation detail
        was deliberately dropped when the range was deferred."""
        import functools
        import operator

        lo = min(r[0] for r in ranges)
        hi = max(r[1] for r in ranges)
        rows = V.read_version(
            self.spark,
            self.base_dir,
            version=head,
            predicates=[
                (
                    self.time_col,
                    ">=",
                    datetime.datetime.utcfromtimestamp(lo),
                ),
                (self.time_col, "<", datetime.datetime.utcfromtimestamp(hi)),
            ],
        )
        ep = F.col(self.bucket_col).cast("double").cast("long")
        in_ranges = functools.reduce(
            operator.or_, [(ep >= r0) & (ep < r1) for r0, r1 in ranges]
        )
        base_keys = (
            self._enriched(rows)
            .filter(F.col(self.time_col).isNotNull())
            .withColumn(self.bucket_col, self._bucket(self.time_col))
            .filter(in_ranges)
            .select(*self._keys())
            .distinct()
        )
        mat_keys = (
            self.read().filter(in_ranges).select(*self._keys()).distinct()
        )
        return base_keys.unionByName(mat_keys).distinct()

    def _force_envelope(
        self, ws: int | None, we: int | None, hz: int | None
    ) -> list[list[int]]:
        """The bucket-grid range a ``force=True`` refresh must
        re-materialize: the caller's window, defaulting per side to the
        union of the base's and the store's time envelopes (manifest
        min/max stats — metadata only, no data scan), clipped at the
        retention horizon."""
        b = self.bucket_seconds
        lo_us = hi_us = None
        if ws is None or we is None:
            for tdir, col in (
                (self.base_dir, self.time_col),
                (self.agg_dir, self.bucket_col),
            ):
                env = self._stats_envelope(tdir, col)
                if env is None:
                    continue
                lo_us = env[0] if lo_us is None else min(lo_us, env[0])
                hi_us = env[1] if hi_us is None else max(hi_us, env[1])
        import math

        lo = (
            ws
            if ws is not None
            else (
                int(math.floor(lo_us / 1e6 / b)) * b
                if lo_us is not None
                else None
            )
        )
        hi = (
            we
            if we is not None
            else (
                int(math.floor(hi_us / 1e6 / b)) * b + b
                if hi_us is not None
                else None
            )
        )
        if lo is None or hi is None or lo >= hi:
            return []
        if hz is not None:
            return _clip_ranges([[lo, hi]], hz, None, inside=True)
        return [[lo, hi]]

    def _stats_envelope(
        self, table_dir: str, col: str
    ) -> tuple[float, float] | None:
        """(min, max) of ``col`` over a table's head snapshot from the
        MANIFEST stats (epoch micros for timestamps) — O(files) driver
        metadata, no data read. Falls back to one min/max scan when no
        file carries stats for the column."""
        versions = V._list_versions(table_dir)
        if not versions:
            return None
        m = V._snapshot(table_dir, versions[-1], with_stats=True)
        if not m["files"]:
            return None
        phys = (V._phys_cols([col], m.get("colmap")) or [col])[0]
        lo = hi = None
        partial = False
        for f in m["files"]:
            fs = (m.get("stats") or {}).get(f) or {}
            c = fs.get("cols", {}).get(phys)
            if not c or c.get("min") is None or c.get("max") is None:
                # zero-row files cannot widen the envelope; any OTHER
                # file missing stats (pre-evolution schema, legacy
                # INT96 staging) makes the manifest envelope a LOWER
                # bound only — fall back to the scan, or force-refresh
                # repair / health() lag would under-cover the range
                if fs.get("rows", None) != 0:
                    partial = True
                continue
            lo = c["min"] if lo is None else min(lo, c["min"])
            hi = c["max"] if hi is None else max(hi, c["max"])
        if lo is None or partial:
            row = (
                V.read_version(self.spark, table_dir)
                .agg(
                    (F.min(col).cast("double") * 1e6),
                    (F.max(col).cast("double") * 1e6),
                )
                .first()
            )
            if row[0] is None:
                return None
            lo, hi = float(row[0]), float(row[1])
        return (float(lo), float(hi))

    def _advance_highwater(
        self, head: int, txn, meta: str | None = None
    ) -> dict:
        """Record base version ``head`` as consumed (and/or the new
        pending-invalidation state) without publishing any data: a
        zero-row append carrying the txn mark (a MERGE with an empty
        source provably touches nothing and publishes no commit). Built
        from the STORED schema: a parquet read would relax non-nullable
        aggregate columns to nullable and fail the append check."""
        import json as _json

        from pyspark.sql import types as _T

        agg_head = V._list_versions(self.agg_dir)[-1]
        if txn is None and meta is None:
            return V._snapshot(self.agg_dir, agg_head, with_stats=False)
        stored = V._snapshot(self.agg_dir, agg_head, with_stats=False)[
            "schema"
        ]
        empty = self.spark.createDataFrame(
            [], _T.StructType.fromJson(_json.loads(stored))
        )
        return V.commit(
            empty,
            self.agg_dir,
            mode="append",
            txn=txn,
            user_metadata=meta,
        )

    # -- refresh policy ------------------------------------------------

    def refresh_policy_writer(
        self,
        checkpoint_dir: str,
        *,
        start_offset: int | None = None,
        end_offset: int | None = None,
        now_fn=None,
    ):
        """TimescaleDB's ``add_continuous_aggregate_policy`` as a
        Structured Streaming job: follow the BASE table's commit-log
        tick stream (one metadata row per commit — no data read) and
        run one ``refresh()`` per micro-batch. The caller picks the
        cadence: ``.trigger(processingTime='5 minutes').start()`` is
        the standing policy; ``.trigger(availableNow=True)`` is a
        catch-up run. Safe under replay/overlap: refresh() reads its
        own high-water from the agg table's txn map and is a no-op
        when nothing advanced.

        ``start_offset``/``end_offset`` (seconds) are the reference's
        own policy parameters (sql/timescaledb_schema.sql:60-65:
        ``start_offset => INTERVAL '1 hour', end_offset => INTERVAL
        '1 minute'``): each tick refreshes the window
        ``[now − start_offset, now − end_offset)`` — the end offset
        keeps the hot, still-mutating tail OUT of the materialized
        store (real-time reads serve it), the start offset bounds how
        far back a tick looks; out-of-window invalidations persist as
        pending ranges. ``now_fn`` injects the clock (tests)."""
        import time as _time

        ticks = V.VersionedTable(self.spark, self.base_dir).stream_commits()

        def _tick(batch_df, _bid):
            # the tick content is irrelevant — the refresh reads the
            # commit log directly; an empty batch still costs nothing
            kw = {}
            if start_offset is not None or end_offset is not None:
                now = (now_fn or _time.time)()
                if start_offset is not None:
                    kw["window_start"] = now - start_offset
                if end_offset is not None:
                    kw["window_end"] = now - end_offset
            self.refresh(**kw)

        return (
            ticks.writeStream.foreachBatch(_tick)
            .option("checkpointLocation", checkpoint_dir)
        )

    # -- reads ---------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        """The materialized aggregate as of its last refresh."""
        return V.read_version(self.spark, self.agg_dir, version=version)

    def health(self, lag_threshold_s: float = 120.0) -> dict:
        """The reference's TimescaleDB health row for THIS aggregate
        (health_dashboard.py:109-137 — ``continuous_aggregate_lag_
        seconds`` with the same 2-minute degradation rule): how much
        raw event time the materialized store has not yet covered,
        plus versions-behind, pending-invalidation backlog, retention
        horizon, and store file/byte counts. ALL manifest metadata —
        no data scan (`_stats_envelope` folds file min/max stats).

        ``lag_seconds`` is the gap between the base's newest event
        time and the end of the newest materialized bucket — 0 when
        the store covers everything (pending ranges are reported
        separately: a windowed policy can be fully caught up at the
        tail while holding back history)."""
        base_head = V._list_versions(self.base_dir)[-1]
        last = self.last_refreshed_version()
        base_env = self._stats_envelope(self.base_dir, self.time_col)
        store_env = self._stats_envelope(self.agg_dir, self.bucket_col)
        lag = 0.0
        if base_env is not None:
            covered = (
                store_env[1] / 1e6 + self.bucket_seconds
                if store_env is not None
                else base_env[0] / 1e6
            )
            lag = max(0.0, round(base_env[1] / 1e6 - covered, 3))
        pending = self._pending_ranges()
        m = V.detail(self.agg_dir)
        return {
            "lag_seconds": lag,
            "versions_behind": base_head - last,
            "pending_ranges": len(pending),
            "pending_seconds": sum(hi - lo for lo, hi in pending),
            "retention_horizon": self._base_retention_horizon(),
            "store_files": m["n_files"],
            "store_bytes": m["size_bytes"],
            "status": "healthy" if lag <= lag_threshold_s else "degraded",
        }

    def read_gapfilled(
        self,
        value_cols: list[str] | None = None,
        version: int | None = None,
        realtime: bool = False,
    ) -> DataFrame:
        """TimescaleDB ``time_bucket_gapfill`` + ``locf`` over the
        materialized store: one row per (group, bucket) on the dense
        bucket grid between each group's min and max materialized
        bucket. ``value_cols`` (default: none) are carried forward
        across the synthesized gap rows; other aggregate columns stay
        NULL there. Adds ``is_gap``. The grid is |groups| × |buckets|
        rows — the answer's own cardinality, nothing bigger.
        ``realtime=True`` gapfills the real-time view instead (exact
        w.r.t. the unrefreshed tail AND dense — the TimescaleDB
        dashboard read both ways at once)."""
        from open_source_financial_time_series_data_pipeline_architecture_spark.operators.gapfill import (
            gapfill_locf,
        )

        return gapfill_locf(
            self.read_realtime() if realtime else self.read(version),
            key=self.group_cols,
            ts_col=self.bucket_col,
            value_cols=list(value_cols or []),
            step_seconds=self.bucket_seconds,
        )

    def _realtime_dirty_keys(self, cascade: bool) -> DataFrame | None:
        """Everything currently unmaterialized at THIS level: keys
        dirtied by base commits past the high-water, pending ranges a
        windowed refresh deferred, and — under ``cascade`` — the parent
        level's own unmaterialized keys re-bucketed to this grid (a raw
        row the parent has not materialized yet is invisible in this
        level's CDF, but its bucket is still stale here)."""
        last = self.last_refreshed_version()
        head = V._list_versions(self.base_dir)[-1]
        pending = self._pending_ranges()
        if pending and self.ignore_retention:
            # same retention guard as refresh(): a pending bucket whose
            # raw rows aged out must SERVE its materialized value, not
            # recompute (empty) over a dropped base
            hz = self._horizon_grid()
            if hz is not None:
                pending = _clip_ranges(pending, hz, None, inside=True)
        parts: list[DataFrame] = []
        if head > last:
            parts.append(self._dirty_keys(last, head))
        if pending:
            parts.append(self._keys_in_ranges(pending, head))
        if cascade and self.parent is not None:
            up = self.parent._realtime_dirty_keys(True)
            if up is not None:
                # parent keys arrive under this level's time_col name
                # (the parent's bucket_col); re-bucket to this grid
                parts.append(
                    up.withColumn(
                        self.bucket_col, self._bucket(self.time_col)
                    ).select(*self._keys())
                )
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # Cached: the key set is bounded (a dirty-bucket list, not base
        # rows) and the SAME frame is read 3+ times per realtime read —
        # the broadcast-bound count, the semi-join (fresh side), the
        # anti-join (materialized side), and under cascade the child's
        # re-bucketed copy of the parent's set. Plans embed the head
        # version, so a new commit maps to a fresh cache entry — no
        # staleness; identical canonical plans share one entry across
        # the parent/child re-derivations.
        return out.distinct().cache()

    def read_realtime(self, cascade: bool = False) -> DataFrame:
        """TimescaleDB real-time continuous aggregate: exact current
        results WITHOUT refreshing — materialized rows for every clean
        bucket UNION an on-the-fly recompute of the buckets dirtied by
        base commits since the last refresh. The unrefreshed tail is
        aggregated per read; everything older is served from the
        materialized store. PENDING invalidation ranges (deferred by a
        windowed refresh) count as dirty too — realtime stays exact
        while a policy's start/end offsets hold buckets back.

        ``cascade=True`` (hierarchies): exact w.r.t. the RAW base, not
        just the parent's store — the recompute frame is the parent's
        own ``read_realtime(cascade=True)`` and the dirty set includes
        the parent's unmaterialized keys re-bucketed to this grid.
        TimescaleDB forbids real-time hierarchical caggs outright
        (materialized_only); this composes them instead. Costs one
        realtime evaluation per ancestor level per read."""
        mat = self.read()
        dirty = self._realtime_dirty_keys(cascade)
        if dirty is None:
            return mat
        n_dirty = dirty.count()  # bounds the broadcast decision
        if n_dirty == 0:
            return mat
        head = V._list_versions(self.base_dir)[-1]
        side = (
            F.broadcast(dirty)
            if n_dirty <= _DIRTY_BROADCAST_MAX_KEYS
            else dirty
        )
        if cascade and self.parent is not None:
            frame = self.parent.read_realtime(cascade=True)
            scoped = (
                frame.filter(F.col(self.time_col).isNotNull())
                .withColumn(self.bucket_col, self._bucket(self.time_col))
                .join(side, self._keys(), "left_semi")
            )
            fresh = scoped.groupBy(*self._keys()).agg(
                *[c.alias(n) for n, c in self.aggs.items()]
            )
        else:
            fresh = self._recompute(dirty, head, n_dirty, None)
        return mat.join(side, self._keys(), "left_anti").unionByName(fresh)
