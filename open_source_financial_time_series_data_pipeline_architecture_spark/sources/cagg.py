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
        #: set by on_cagg() — the parent aggregate in a hierarchy
        self.parent: "ContinuousAggregate | None" = None

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

    def _aggregate(self, rows: DataFrame) -> DataFrame:
        """bucket + group + the user aggregates, over base-table rows.
        Rows with a NULL time are excluded on EVERY path (create,
        refresh, realtime): a NULL bucket key can never be semi-joined,
        merged, or deleted (SQL NULL-key semantics), so a NULL-bucket
        row materialized once would be unmaintainable forever — better
        to state the contract: the aggregate covers timestamped rows."""
        return (
            rows.filter(F.col(self.time_col).isNotNull())
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

    def _dirty_keys(self, last: int, head: int) -> DataFrame:
        """The distinct (bucket, group...) keys touched by base commits
        in (last, head] — the invalidation set, straight off the change
        feed (inserts AND deletes both dirty their bucket)."""
        ch = V.read_changes(self.spark, self.base_dir, last, head)
        return (
            ch.filter(F.col(self.time_col).isNotNull())
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
            rows.withColumn(self.bucket_col, self._bucket(self.time_col))
            .join(side, self._keys(), "left_semi")
        )
        return (
            scoped.groupBy(*self._keys())
            .agg(*[c.alias(n) for n, c in self.aggs.items()])
        )

    def refresh(self, report: dict | None = None) -> dict:
        """One invalidation-driven refresh: CDF since the last consumed
        base version → dirty keys → recompute those buckets → MERGE
        into the materialized table (+ delete buckets that emptied).
        Idempotent under replay — recompute-and-merge of the same range
        is a pure function of the base snapshot; the base version
        high-water lands in the agg table's txn map with the merge.
        Returns the agg table's head snapshot."""
        last = self.last_refreshed_version()
        versions = V._list_versions(self.base_dir)
        head = versions[-1]
        if report is not None:
            report.update({"from_version": last, "to_version": head})
        if head <= last:
            if report is not None:
                report["refreshed"] = False
            return V._snapshot(
                self.agg_dir, V._list_versions(self.agg_dir)[-1],
                with_stats=False,
            )
        dirty = self._dirty_keys(last, head).persist()
        try:
            n_dirty = dirty.count()
            if report is not None:
                report["buckets_dirty"] = n_dirty
                report["refreshed"] = True
            if n_dirty == 0:
                # optimize/metadata-only commits: nothing to recompute,
                # but advance the high-water so the next refresh does
                # not re-walk these segments.
                return self._advance_highwater(head)
            fresh = self._recompute(dirty, head, n_dirty, report)
            # buckets whose rows were ALL deleted produce no recomputed
            # row — they must leave the materialized table
            dead_keys = dirty.join(fresh, self._keys(), "left_anti")
            dead = dead_keys
            for name in self.aggs:  # align schema for the delete-merge
                dead = dead.withColumn(
                    name, F.lit(None).cast(dict(fresh.dtypes)[name])
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
                return self._advance_highwater(head)
            return V.merge(
                self.spark,
                self.agg_dir,
                fresh,
                keys=self._keys(),
                txn=(self.app_id, head),
            )
        finally:
            dirty.unpersist()

    def _advance_highwater(self, head: int) -> dict:
        """Record base version ``head`` as consumed without publishing
        any data: a zero-row append carrying the txn mark (a MERGE with
        an empty source provably touches nothing and publishes no
        commit). Built from the STORED schema: a parquet read would
        relax non-nullable aggregate columns to nullable and fail the
        append check."""
        import json as _json

        from pyspark.sql import types as _T

        agg_head = V._list_versions(self.agg_dir)[-1]
        stored = V._snapshot(self.agg_dir, agg_head, with_stats=False)[
            "schema"
        ]
        empty = self.spark.createDataFrame(
            [], _T.StructType.fromJson(_json.loads(stored))
        )
        return V.commit(
            empty, self.agg_dir, mode="append", txn=(self.app_id, head)
        )

    # -- refresh policy ------------------------------------------------

    def refresh_policy_writer(self, checkpoint_dir: str):
        """TimescaleDB's ``add_continuous_aggregate_policy`` as a
        Structured Streaming job: follow the BASE table's commit-log
        tick stream (one metadata row per commit — no data read) and
        run one ``refresh()`` per micro-batch. The caller picks the
        cadence: ``.trigger(processingTime='5 minutes').start()`` is
        the standing policy; ``.trigger(availableNow=True)`` is a
        catch-up run. Safe under replay/overlap: refresh() reads its
        own high-water from the agg table's txn map and is a no-op
        when nothing advanced."""
        ticks = V.VersionedTable(self.spark, self.base_dir).stream_commits()

        def _tick(batch_df, _bid):
            # the tick content is irrelevant — the refresh reads the
            # commit log directly; an empty batch still costs nothing
            self.refresh()

        return (
            ticks.writeStream.foreachBatch(_tick)
            .option("checkpointLocation", checkpoint_dir)
        )

    # -- reads ---------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        """The materialized aggregate as of its last refresh."""
        return V.read_version(self.spark, self.agg_dir, version=version)

    def read_realtime(self) -> DataFrame:
        """TimescaleDB real-time continuous aggregate: exact current
        results WITHOUT refreshing — materialized rows for every clean
        bucket UNION an on-the-fly recompute of the buckets dirtied by
        base commits since the last refresh. The unrefreshed tail is
        aggregated per read; everything older is served from the
        materialized store."""
        last = self.last_refreshed_version()
        head = V._list_versions(self.base_dir)[-1]
        mat = self.read()
        if head <= last:
            return mat
        dirty = self._dirty_keys(last, head)
        n_dirty = dirty.count()  # bounds the broadcast decision
        if n_dirty == 0:
            return mat
        fresh = self._recompute(dirty, head, n_dirty, None)
        side = (
            F.broadcast(dirty)
            if n_dirty <= _DIRTY_BROADCAST_MAX_KEYS
            else dirty
        )
        return mat.join(side, self._keys(), "left_anti").unionByName(fresh)
