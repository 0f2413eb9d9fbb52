"""Streaming tail of a versioned (Delta-lite) table.

The "Delta table as a streaming source" analog (public Delta feature
`spark.readStream.format("delta")`; reference
spark/streaming_feature_updates.py consumes its feature store the same
way): the commit log's version number IS the stream offset, so a
Structured Streaming query follows the table — each micro-batch is the
rows the commits since the last checkpointed version appended.

Semantics per commit mode:

- ``append``   → the commit's NEW files' rows are emitted (O(new
  files) per batch — the scale contract; nothing already-read is
  re-scanned).
- ``optimize`` → skipped (logical no-op).
- ``overwrite``→ governed by the ``on_overwrite`` option:
  ``fail`` (default — a blind rewrite breaks append-only streaming,
  same as Delta without ``ignoreChanges``), ``snapshot`` (re-emit the
  full new snapshot — restart semantics), or ``skip``.

Offsets are pure functions of the commit log, so checkpoint replay
re-reads identical batches (exactly-once into idempotent sinks).

Implementation notes: a ``SimpleDataSourceStreamReader`` runs on the
driver, so files are read with pyarrow (no executor fan-out) — right
for the tail-follow use (micro-batches are the commit increments, not
the table). ``read()`` returns a concrete list: the wrapper caches and
``copy.copy``s the batch for replay.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

from open_source_financial_time_series_data_pipeline_architecture_spark.sources import (
    versioned as V,
)


# the incremental segment walk is shared with the batch change feed
# and vacuum — one snapshot at the start offset, O(touched) per commit
_walk_segments = V._walk_segments


def _phys_names(m: dict, struct: T.StructType) -> list[str]:
    """The PHYSICAL (stored) column name for each schema field, in
    schema order — identity without column mapping. A rename or drop
    mid-stream changes the mapping; like Delta, the stream's schema is
    fixed at query start, so restart the query after a mapping ALTER."""
    colmap = m.get("colmap") or {}
    return [colmap.get(f.name, f.name) for f in struct.fields]


def _dv_step(seg: dict, prev: dict) -> dict:
    """Replay one segment's deletion-vector effect (mirrors
    ``versioned._apply_segment``): reset clears, removes clean covered
    lists, ``dv_add`` stacks."""
    nxt = dict(prev)
    if "files" in seg or seg.get("reset"):
        nxt = {}
    rm = set(seg.get("remove") or [])
    if rm:
        nxt = {
            d: kept
            for d, cov in nxt.items()
            if (kept := [f for f in cov if f not in rm])
        }
    nxt.update(seg.get("dv_add") or {})
    return nxt


def _dv_positions(table_dir: str, dv_files) -> dict[str, set[int]]:
    """Load deletion-vector sidecars → {data file BASENAME: deleted
    positions}. Driver-side pyarrow, like every read in this tail
    source."""
    import pyarrow.parquet as pq

    data_dir = os.path.join(table_dir, V._DATA)
    out: dict[str, set[int]] = {}
    for d in dv_files:
        tbl = pq.read_table(os.path.normpath(os.path.join(data_dir, d)))
        for rec in tbl.to_pylist():
            out.setdefault(rec["file"], set()).add(rec["pos"])
    return out


def _rows_from_files(
    table_dir: str,
    files: list[str],
    names: list[str],
    dv_pos: dict[str, set[int]] | None = None,
) -> list[tuple]:
    import pyarrow as pa
    import pyarrow.parquet as pq

    out: list[tuple] = []
    data_dir = os.path.join(table_dir, V._DATA)
    for f in files:
        # bare name, or a shallow-clone reference (absolute / relative
        # to data_dir) — same resolution as versioned._read_files
        tbl = pq.read_table(os.path.normpath(os.path.join(data_dir, f)))
        dead = (dv_pos or {}).get(os.path.basename(f)) or ()
        # Spark writes INT96/NTZ-flavored timestamps that pyarrow
        # surfaces tz-naive (and ns-unit); Spark's ingest converter
        # requires tz-aware values. Session tz is UTC, so re-tagging as
        # UTC microseconds is a pure metadata fix (ns→µs truncation
        # matches sources.load_table's normalization).
        arrays, fields = [], []
        for fld, col in zip(tbl.schema, tbl.columns):
            if pa.types.is_timestamp(fld.type):
                t = pa.timestamp("us", fld.type.tz or "UTC")
                col, fld = col.cast(t), pa.field(fld.name, t)
            arrays.append(col)
            fields.append(fld)
        tbl = pa.Table.from_arrays(arrays, schema=pa.schema(fields))
        cols = set(tbl.column_names)
        for pos, rec in enumerate(tbl.to_pylist()):
            if pos in dead:  # deletion-vectored row
                continue
            # manifest-schema order; columns added later read as None
            out.append(tuple(rec[n] if n in cols else None for n in names))
    return out


class VersionedTailStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options, names: list[str]):
        self.table_dir = options["path"]
        self.on_overwrite = options.get("on_overwrite", "fail")
        if self.on_overwrite not in ("fail", "snapshot", "skip"):
            raise ValueError(f"on_overwrite: {self.on_overwrite!r}")
        # Delta's maxFilesPerTrigger analog at our offset granularity:
        # cap how many COMMITS one micro-batch may drain, so a replay
        # from version 0 of a long-lived table becomes many bounded
        # batches instead of one unbounded one
        self.max_commits = int(options.get("max_commits_per_batch", 0))
        self.names = names

    def initialOffset(self):
        return {"v": 0}

    def read(self, start: dict):
        versions = V._list_versions(self.table_dir)
        head = versions[-1] if versions else 0
        if self.max_commits > 0:
            head = min(head, start["v"] + self.max_commits)
        if head <= start["v"]:
            return [], {"v": start["v"]}
        return self._rows(start["v"], head), {"v": head}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["v"], end["v"])

    def _rows(self, lo: int, hi: int) -> list[tuple]:
        out: list[tuple] = []
        dv: dict = (
            dict(
                V._snapshot(self.table_dir, lo, with_stats=False).get("dv")
                or {}
            )
            if lo
            else {}
        )
        for v, seg, files, prev_files in _walk_segments(self.table_dir, lo, hi):
            mode = seg["mode"]
            dv = _dv_step(seg, dv)
            if mode == "append":
                seen = set(prev_files)
                new = [f for f in files if f not in seen]
                # files added THIS commit cannot be deletion-vectored yet
                out.extend(_rows_from_files(self.table_dir, new, self.names))
            elif mode in ("optimize", "metadata"):
                pass
            else:  # overwrite/merge/dv: the snapshot changed in place
                if self.on_overwrite == "fail":
                    raise RuntimeError(
                        f"version {v} is a {mode}; streaming tail "
                        "requires append-only commits (set "
                        "on_overwrite='snapshot' or 'skip')"
                    )
                if self.on_overwrite == "snapshot":
                    out.extend(
                        _rows_from_files(
                            self.table_dir,
                            files,
                            self.names,
                            _dv_positions(self.table_dir, list(dv))
                            if dv
                            else None,
                        )
                    )
        return out


def _multiset_diff(
    table_dir: str,
    old_files: list[str],
    new_files: list[str],
    names: list[str],
    old_dv: dict[str, set[int]] | None = None,
    new_dv: dict[str, set[int]] | None = None,
) -> tuple[list[tuple], list[tuple]]:
    """(inserts, deletes) between two file sets as a MULTISET diff —
    identical rows cancel pairwise (exceptAll semantics), so a rewrite
    that reproduces a row bit-identically emits nothing for it. Each
    side reads under its own deletion-vector state. List columns are
    tupled for hashing."""
    from collections import Counter

    def _freeze(v):
        if isinstance(v, list):
            return tuple(_freeze(x) for x in v)
        if isinstance(v, dict):
            return tuple(sorted((k, _freeze(x)) for k, x in v.items()))
        return v

    def _key(row: tuple) -> tuple:
        return tuple(_freeze(v) for v in row)

    old = Counter(
        _key(r) for r in _rows_from_files(table_dir, old_files, names, old_dv)
    )
    new = Counter(
        _key(r) for r in _rows_from_files(table_dir, new_files, names, new_dv)
    )
    ins = [k for k, n in (new - old).items() for _ in range(n)]
    dels = [k for k, n in (old - new).items() for _ in range(n)]
    return ins, dels


def _rows_at_positions(
    table_dir: str,
    files: list[str],
    names: list[str],
    pos: dict[str, set[int]],
) -> list[tuple]:
    """The rows AT the given (file basename → positions) — the inverse
    selection of ``_rows_from_files``'s dv skip; a dv commit's delete
    feed."""
    import pyarrow.parquet as pq

    out: list[tuple] = []
    data_dir = os.path.join(table_dir, V._DATA)
    for f in files:
        want = pos.get(os.path.basename(f))
        if not want:
            continue
        tbl = pq.read_table(os.path.normpath(os.path.join(data_dir, f)))
        cols = set(tbl.column_names)
        for i, rec in enumerate(tbl.to_pylist()):
            if i in want:
                out.append(
                    tuple(rec[n] if n in cols else None for n in names)
                )
    return out


class VersionedCDFStreamReader(SimpleDataSourceStreamReader):
    """Streaming CHANGE DATA FEED of the versioned table (Delta's
    ``readChangeFeed`` as a stream): every commit becomes change rows —
    appends are O(new files) inserts, merges diff ONLY the replaced
    files' content, overwrites diff the snapshots (the honest price of
    a blind rewrite), optimize/metadata commits emit nothing. Offsets
    are the commit-log version numbers, so checkpoint replay re-reads
    identical batches."""

    def __init__(self, options, names: list[str]):
        self.table_dir = options["path"]
        self.start_version = int(options.get("start_version", 0))
        self.max_commits = int(options.get("max_commits_per_batch", 0))
        self.names = names  # table columns; change columns appended

    def initialOffset(self):
        return {"v": self.start_version}

    def read(self, start: dict):
        versions = V._list_versions(self.table_dir)
        head = versions[-1] if versions else 0
        if self.max_commits > 0:
            head = min(head, start["v"] + self.max_commits)
        if head <= start["v"]:
            return [], {"v": start["v"]}
        return self._rows(start["v"], head), {"v": head}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["v"], end["v"])

    def _rows(self, lo: int, hi: int) -> list[tuple]:
        out: list[tuple] = []

        def _emit(rows, kind: str, v: int):
            out.extend(tuple(r) + (kind, v) for r in rows)

        dv: dict = (
            dict(
                V._snapshot(self.table_dir, lo, with_stats=False).get("dv")
                or {}
            )
            if lo
            else {}
        )
        for v, seg, files, prev_files in _walk_segments(self.table_dir, lo, hi):
            mode = seg["mode"]
            prev_dv, dv = dv, _dv_step(seg, dv)
            if mode == "append":
                seen = set(prev_files)
                new = [f for f in files if f not in seen]
                _emit(
                    _rows_from_files(self.table_dir, new, self.names),
                    "insert",
                    v,
                )
            elif mode in ("optimize", "metadata"):
                pass
            elif mode == "dv":
                # merge-on-read DELETE/UPDATE: the sidecar's positions
                # ARE the delete feed (the sidecar records only
                # newly-deleted rows, so no diff is needed); an
                # UPDATE's rewritten copies are the segment's added
                # files — the insert feed
                seen = set(prev_files)
                new = [f for f in files if f not in seen]
                if new:
                    _emit(
                        _rows_from_files(self.table_dir, new, self.names),
                        "insert",
                        v,
                    )
                dv_add = seg.get("dv_add") or {}
                covered = sorted(
                    {f for cov in dv_add.values() for f in cov}
                    & set(prev_files)
                )
                _emit(
                    _rows_at_positions(
                        self.table_dir,
                        covered,
                        self.names,
                        _dv_positions(self.table_dir, list(dv_add)),
                    ),
                    "delete",
                    v,
                )
            elif mode == "merge":
                seen = set(prev_files)
                new = [f for f in files if f not in seen]
                replaced = seg.get("replaced", seg.get("remove", []))
                ins, dels = _multiset_diff(
                    self.table_dir,
                    replaced,
                    new,
                    self.names,
                    old_dv=_dv_positions(self.table_dir, list(prev_dv))
                    if prev_dv
                    else None,
                )
                _emit(ins, "insert", v)
                _emit(dels, "delete", v)
            else:  # overwrite: full snapshot diff
                ins, dels = _multiset_diff(
                    self.table_dir,
                    prev_files,
                    files,
                    self.names,
                    old_dv=_dv_positions(self.table_dir, list(prev_dv))
                    if prev_dv
                    else None,
                    new_dv=_dv_positions(self.table_dir, list(dv))
                    if dv
                    else None,
                )
                _emit(ins, "insert", v)
                _emit(dels, "delete", v)
        return out


class VersionedCDFDataSource(DataSource):
    """``spark.readStream.format("versioned_cdf").option("path", t)``
    after ``spark.dataSource.register(VersionedCDFDataSource)`` —
    change rows as the table's columns + ``_change_type`` +
    ``_commit_version``."""

    @classmethod
    def name(cls) -> str:
        return "versioned_cdf"

    def _table_struct(self) -> T.StructType:
        versions = V._list_versions(self.options["path"])
        if not versions:
            raise FileNotFoundError(f"no versions at {self.options['path']}")
        m = V._snapshot(self.options["path"], versions[-1], with_stats=False)
        return T.StructType.fromJson(json.loads(m["schema"]))

    def schema(self) -> T.StructType:
        base = self._table_struct()
        return T.StructType(
            list(base.fields)
            + [
                T.StructField("_change_type", T.StringType(), False),
                T.StructField("_commit_version", T.LongType(), False),
            ]
        )

    def simpleStreamReader(self, schema) -> VersionedCDFStreamReader:
        versions = V._list_versions(self.options["path"])
        m = V._snapshot(self.options["path"], versions[-1], with_stats=False)
        return VersionedCDFStreamReader(
            self.options, _phys_names(m, self._table_struct())
        )


class VersionedTailDataSource(DataSource):
    """``spark.readStream.format("versioned_tail").option("path", t)``
    after ``spark.dataSource.register(VersionedTailDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "versioned_tail"

    def _schema_struct(self) -> T.StructType:
        versions = V._list_versions(self.options["path"])
        if not versions:
            raise FileNotFoundError(f"no versions at {self.options['path']}")
        m = V._snapshot(self.options["path"], versions[-1], with_stats=False)
        return T.StructType.fromJson(json.loads(m["schema"]))

    def schema(self) -> T.StructType:
        return self._schema_struct()

    def simpleStreamReader(self, schema) -> VersionedTailStreamReader:
        versions = V._list_versions(self.options["path"])
        m = V._snapshot(self.options["path"], versions[-1], with_stats=False)
        return VersionedTailStreamReader(
            self.options, _phys_names(m, self._schema_struct())
        )


class VersionedCommitsStreamReader(SimpleDataSourceStreamReader):
    """One row PER COMMIT of the commit log — a metadata tick stream
    (no data file is ever read): (version, mode, ts, n_files,
    user_metadata). The near-free signal driving refresh policies and
    ops monitoring; offsets are the version numbers themselves."""

    def __init__(self, options):
        self.table_dir = options["path"]
        self.max_commits = int(options.get("max_commits_per_batch", 0))

    def initialOffset(self):
        return {"v": 0}

    def read(self, start: dict):
        versions = V._list_versions(self.table_dir)
        head = versions[-1] if versions else 0
        if self.max_commits > 0:
            head = min(head, start["v"] + self.max_commits)
        if head <= start["v"]:
            return [], {"v": start["v"]}
        return self._rows(start["v"], head), {"v": head}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["v"], end["v"])

    def _rows(self, lo: int, hi: int) -> list[tuple]:
        out = []
        for v in V._list_versions(self.table_dir):
            if lo < v <= hi:
                seg = V._read_segment(self.table_dir, v)
                out.append(
                    (
                        v,
                        seg.get("mode", "overwrite"),
                        float(seg.get("ts", 0.0)),
                        int(seg.get("n_files", 0)),
                        seg.get("user_metadata"),
                    )
                )
        return out


class VersionedCommitsDataSource(DataSource):
    """``spark.readStream.format("versioned_commits").option("path", t)``
    after registration — the commit-log tick stream."""

    @classmethod
    def name(cls) -> str:
        return "versioned_commits"

    def schema(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField("version", T.LongType(), False),
                T.StructField("mode", T.StringType(), False),
                T.StructField("commit_ts", T.DoubleType(), False),
                T.StructField("n_files", T.LongType(), False),
                T.StructField("user_metadata", T.StringType(), True),
            ]
        )

    def simpleStreamReader(self, schema) -> VersionedCommitsStreamReader:
        return VersionedCommitsStreamReader(self.options)
