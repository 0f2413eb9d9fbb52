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


def _rows_from_files(table_dir: str, files: list[str], names: list[str]) -> list[tuple]:
    import pyarrow as pa
    import pyarrow.parquet as pq

    out: list[tuple] = []
    data_dir = os.path.join(table_dir, V._DATA)
    for f in files:
        tbl = pq.read_table(os.path.join(data_dir, f))
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
        for rec in tbl.to_pylist():
            # manifest-schema order; columns added later read as None
            out.append(tuple(rec[n] if n in cols else None for n in names))
    return out


class VersionedTailStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options, names: list[str]):
        self.table_dir = options["path"]
        self.on_overwrite = options.get("on_overwrite", "fail")
        if self.on_overwrite not in ("fail", "snapshot", "skip"):
            raise ValueError(f"on_overwrite: {self.on_overwrite!r}")
        self.names = names

    def initialOffset(self):
        return {"v": 0}

    def read(self, start: dict):
        versions = V._list_versions(self.table_dir)
        head = versions[-1] if versions else 0
        if head <= start["v"]:
            return [], {"v": start["v"]}
        return self._rows(start["v"], head), {"v": head}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["v"], end["v"])

    def _rows(self, lo: int, hi: int) -> list[tuple]:
        versions = V._list_versions(self.table_dir)
        prev_files: list[str] = (
            V._read_manifest(self.table_dir, lo)["files"] if lo else []
        )
        out: list[tuple] = []
        for v in [v for v in versions if lo < v <= hi]:
            m = V._read_manifest(self.table_dir, v)
            if m["mode"] == "append":
                seen = set(prev_files)
                new = [f for f in m["files"] if f not in seen]
                out.extend(_rows_from_files(self.table_dir, new, self.names))
            elif m["mode"] == "optimize":
                pass
            else:  # overwrite/merge: the snapshot changed in place
                if self.on_overwrite == "fail":
                    raise RuntimeError(
                        f"version {v} is a {m['mode']}; streaming tail "
                        "requires append-only commits (set "
                        "on_overwrite='snapshot' or 'skip')"
                    )
                if self.on_overwrite == "snapshot":
                    out.extend(
                        _rows_from_files(self.table_dir, m["files"], self.names)
                    )
            prev_files = m["files"]
        return out


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
        m = V._read_manifest(self.options["path"], versions[-1])
        return T.StructType.fromJson(json.loads(m["schema"]))

    def schema(self) -> T.StructType:
        return self._schema_struct()

    def simpleStreamReader(self, schema) -> VersionedTailStreamReader:
        names = [f.name for f in self._schema_struct().fields]
        return VersionedTailStreamReader(self.options, names)
