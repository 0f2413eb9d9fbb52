"""Incrementally-maintained IVF ANN index on the versioned table.

The batch `operators/similarity.ivf_topk` assigns the WHOLE corpus to
inverted lists on every call — right for one-shot queries, wrong for a
serving index over a 100 TB embedding store that grows by appends. This
module keeps the inverted-list assignment AS A VERSIONED TABLE and
maintains it from the base table's change feed, the same
O(touched)-per-tick contract as the continuous aggregates:

- ``create()`` assigns the base head once and writes the index
  range-clustered by ``list_id``, so each index file covers a narrow
  list range and the manifest min/max stats make per-list reads
  file-prunable;
- ``refresh()`` reads ONLY the (last, head] change feed: inserted
  vectors are assigned (centroids are FIXED — the codebook is trained
  once; re-training is a ``create()``) and appended, deleted vectors
  are MERGE-deleted by id with file-level merge pruning. The index
  table's txn map carries the high-water, so a replayed refresh is a
  provable no-op — exactly-once without any external state;
- ``search()`` probes each query's ``n_probe`` nearest lists and reads
  the index through ``read_version(predicates=[("list_id", "in",
  probed)])`` — data skipping drops non-probed files before Spark
  lists a single path. Work per batch ≈ (probed lists / k_lists) of
  the index, the IVF contract, now enforced by STORAGE layout instead
  of a runtime filter;
- ``refresh_policy_writer()`` runs a refresh per base commit tick
  (the same maintenance-policy shape as compaction/retention/
  compression/DQ).

Faiss/Milvus keep this structure in RAM on one box; at 100 TB the
index IS a table and maintenance IS a merge — everything else
(time travel, CDF, vacuum, clustering, compression policy) composes
for free because it is an ordinary versioned table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.operators.similarity import (
    _nearest_centroid,
    cosine_similarity,
)
from open_source_financial_time_series_data_pipeline_architecture_spark.sources import versioned as V


class IVFIndex:
    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        index_dir: str,
        *,
        centroids: list[list[float]],
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        app_id: str | None = None,
        n_files: int = 8,
    ):
        if not centroids:
            raise ValueError("centroids must be a non-empty codebook")
        self.spark = spark
        self.base_dir = base_dir
        self.index_dir = index_dir
        self.centroids = [list(map(float, c)) for c in centroids]
        self.id_col = id_col
        self.vec_col = vec_col
        self.app_id = app_id or f"ivf:{os.path.basename(os.path.normpath(index_dir))}"
        self.n_files = int(n_files)

    # -- assignment ------------------------------------------------------

    def _assign(self, df: DataFrame) -> DataFrame:
        """(id, vec, list_id) — nearest-centroid by cosine, first-max
        tie rule (ties → lowest centroid ordinal, the ivf_topk /
        witness-SQL convention)."""
        return df.select(
            F.col(self.id_col),
            F.col(self.vec_col),
            _nearest_centroid(
                F.col(self.vec_col).cast("array<double>"), self.centroids
            ).alias("list_id"),
        )

    def _cluster(self, df: DataFrame) -> DataFrame:
        # range-clustered by list so file envelopes are narrow — the
        # search-path prune quality comes from THIS, not from luck
        return df.repartitionByRange(
            self.n_files, "list_id", self.id_col
        ).sortWithinPartitions("list_id")

    # -- maintenance -----------------------------------------------------

    def create(self) -> dict:
        head = V._list_versions(self.base_dir)[-1]
        base = V.read_version(self.spark, self.base_dir)
        return V.commit(
            self._cluster(self._assign(base)),
            self.index_dir,
            mode="overwrite"
            if os.path.isdir(os.path.join(self.index_dir, "_versions"))
            else "append",
            txn=(self.app_id, head),
        )

    def last_indexed_version(self) -> int:
        if not os.path.isdir(os.path.join(self.index_dir, "_versions")):
            return 0
        return V.last_txn_version(self.index_dir, self.app_id) or 0

    def refresh(self, report: dict | None = None) -> dict | None:
        """Fold the (last, head] change feed into the index: deletes
        MERGE out by id (file-level merge pruning), inserts assign and
        append. The LAST commit of the tick carries the txn high-water
        so a replay of the whole tick is a no-op."""
        head = V._list_versions(self.base_dir)[-1]
        last = self.last_indexed_version()
        if report is not None:
            report.update({"from_version": last, "to_version": head})
        if head <= last:
            if report is not None:
                report["refreshed"] = False
            return None
        ch = V.read_changes(self.spark, self.base_dir, last, head)
        ins = self._assign(
            ch.filter(F.col("_change_type") == "insert").drop(
                "_change_type", "_commit_version"
            )
        )
        dels = (
            ch.filter(F.col("_change_type") == "delete")
            .select(self.id_col)
            .distinct()
        )
        # a row inserted AND deleted inside the same (last, head]
        # range appears as BOTH an insert and a delete in the feed —
        # net it out of the insert set, or the append would resurrect
        # it after the merge-delete (which finds nothing to delete:
        # the row never reached the index)
        ins = ins.join(dels, self.id_col, "left_anti")
        dels = dels.cache()
        try:
            n_del = dels.count()
            n_ins_stage = ins.cache()
            n_ins = n_ins_stage.count()
            if n_del:
                # merge requires the full table schema — pad the
                # id-only delete source with typed NULLs
                import json as _json

                from pyspark.sql import types as _T

                stored = _T.StructType.fromJson(
                    _json.loads(
                        V._snapshot(
                            self.index_dir,
                            V._list_versions(self.index_dir)[-1],
                            with_stats=False,
                        )["schema"]
                    )
                )
                src = dels
                for fld in stored.fields:
                    if fld.name != self.id_col:
                        src = src.withColumn(
                            fld.name, F.lit(None).cast(fld.dataType)
                        )
                V.merge(
                    self.spark,
                    self.index_dir,
                    source=src.select(*[fld.name for fld in stored.fields]),
                    keys=[self.id_col],
                    when_matched="delete",
                    when_not_matched="ignore",
                    # the txn rides the LAST commit; only when no
                    # insert commit follows does the merge carry it
                    txn=None if n_ins else (self.app_id, head),
                )
            if n_ins:
                V.commit(
                    self._cluster(n_ins_stage),
                    self.index_dir,
                    mode="append",
                    txn=(self.app_id, head),
                )
            if not n_del and not n_ins:
                # metadata-only base commits (optimize, retention of
                # already-deleted ranges): advance the cursor with a
                # zero-row append of the stored schema
                import json as _json

                from pyspark.sql import types as _T

                stored = V._snapshot(
                    self.index_dir,
                    V._list_versions(self.index_dir)[-1],
                    with_stats=False,
                )["schema"]
                V.commit(
                    self.spark.createDataFrame(
                        [], _T.StructType.fromJson(_json.loads(stored))
                    ),
                    self.index_dir,
                    mode="append",
                    txn=(self.app_id, head),
                )
            if report is not None:
                report.update(
                    {
                        "refreshed": True,
                        "n_inserted": n_ins,
                        "n_deleted": n_del,
                    }
                )
        finally:
            dels.unpersist()
            ins.unpersist()
        return report

    def refresh_policy_writer(self, checkpoint_dir: str):
        """One refresh per base commit tick (availableNow-compatible
        maintenance job, the cagg refresh-policy shape)."""
        tbl = V.VersionedTable(self.spark, self.base_dir)
        ticks = tbl.stream_commits()

        def _tick(batch_df, _bid):
            self.refresh()

        return ticks.writeStream.foreachBatch(_tick).option(
            "checkpointLocation", checkpoint_dir
        )

    # -- reads -----------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        return V.read_version(self.spark, self.index_dir, version)

    def search(
        self,
        queries: DataFrame,
        k: int = 5,
        n_probe: int = 2,
        query_id: str = "query_id",
        prune_report: dict | None = None,
    ) -> DataFrame:
        """IVF probe over the MATERIALIZED index: per-query top
        ``n_probe`` centroid lists, one file-pruned index read over
        the union of probed lists (≤ k_lists values — bounded driver
        state), exact-cosine re-rank within the probed lists. Same
        semantics as ivf_topk, but the corpus side reads only the
        probed FILES."""
        sims = [
            F.struct(
                cosine_similarity(
                    F.col(self.vec_col).cast("array<double>"),
                    F.array(*[F.lit(x) for x in cen]),
                ).alias("s"),
                F.lit(i).alias("i"),
            )
            for i, cen in enumerate(self.centroids)
        ]
        ql = queries.select(
            F.col(query_id),
            F.col(self.vec_col).alias("__qv"),
            F.explode(
                F.slice(F.reverse(F.array_sort(F.array(*sims))), 1, n_probe)
            ).alias("__probe"),
        ).select(query_id, "__qv", F.col("__probe.i").alias("list_id"))
        ql = ql.cache()
        try:
            probed = sorted(
                r[0] for r in ql.select("list_id").distinct().collect()
            )
            idx = V.read_version(
                self.spark,
                self.index_dir,
                predicates=[("list_id", "in", probed)],
                prune_report=prune_report,
            )
            scored = idx.withColumnRenamed(self.vec_col, "__cv").join(
                F.broadcast(ql), "list_id"
            ).select(
                query_id,
                self.id_col,
                F.round(cosine_similarity("__qv", "__cv"), 6).alias(
                    "cosine"
                ),
            )
            w = Window.partitionBy(query_id).orderBy(
                F.col("cosine").desc(), F.col(self.id_col).asc()
            )
            out = scored.withColumn(
                "rank", F.row_number().over(w)
            ).filter(F.col("rank") <= k)
            # materialize before dropping the probe cache
            out = out.localCheckpoint(eager=True)
            return out
        finally:
            ql.unpersist()
