"""Versioned parquet table — Delta-lite snapshots and time travel.

Closes the transactional-storage gap the environment leaves open (no
Delta Lake jars; reference spark/batch_feature_calculation.py:61-65
writes Delta + MERGE): a minimal transaction log over plain parquet.

Layout:

    <table>/
      _versions/
        00000001.json   {"version":1,"files":[...],"n_rows":...,"ts":...}
        00000002.json
      data/
        v1-<uuid>-....parquet
        v2-<uuid>-....parquet

Commit protocol (single-writer, reader-safe):
1. write the new snapshot's parquet files under ``data/`` with a
   version-prefixed, uuid-unique name — invisible to readers until a
   manifest references them;
2. atomically publish manifest ``N+1`` (os.rename of a temp file — the
   commit point, exactly how Delta's _delta_log commits work).

Readers resolve the latest (or requested) manifest and load ONLY the
files it lists, so concurrent writers never corrupt a read and a
killed writer leaves only unreferenced orphan files (cleaned by
``vacuum``). Overwrite semantics per commit: each manifest is a full
snapshot (the lakehouse "overwrite" mode); append commits list the
union of prior files + new files without rewriting old data.

At 100 TB: manifests carry file lists, not data — commit cost is
O(files touched); time travel is free (old manifests keep old files
alive until vacuum).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_VERSIONS = "_versions"
_DATA = "data"


def _versions_dir(table_dir: str) -> str:
    return os.path.join(table_dir, _VERSIONS)


def _list_versions(table_dir: str) -> list[int]:
    d = _versions_dir(table_dir)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(f[:-5]) for f in os.listdir(d) if f.endswith(".json")
    )


def _read_manifest(table_dir: str, version: int) -> dict:
    with open(os.path.join(_versions_dir(table_dir), f"{version:08d}.json")) as f:
        return json.load(f)


def commit(
    df: DataFrame,
    table_dir: str,
    mode: str = "overwrite",
) -> dict:
    """Write ``df`` as the next version. ``mode='overwrite'`` makes the
    new manifest a full snapshot of just this write; ``mode='append'``
    carries the previous manifest's files forward. Returns the manifest.
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode: {mode!r}")
    os.makedirs(_versions_dir(table_dir), exist_ok=True)
    data_dir = os.path.join(table_dir, _DATA)
    versions = _list_versions(table_dir)
    next_v = (versions[-1] if versions else 0) + 1

    # stage the write into a scratch dir, then move files in under
    # unique names — they stay invisible until the manifest lands
    scratch = os.path.join(table_dir, f".stage-{uuid.uuid4().hex[:8]}")
    df.write.mode("overwrite").parquet(scratch)
    os.makedirs(data_dir, exist_ok=True)
    new_files = []
    for f in sorted(os.listdir(scratch)):
        if not f.endswith(".parquet") or f.startswith(("_", ".")):
            continue
        name = f"v{next_v}-{uuid.uuid4().hex[:8]}-{f}"
        os.rename(os.path.join(scratch, f), os.path.join(data_dir, name))
        new_files.append(name)
    import shutil

    shutil.rmtree(scratch)

    files = new_files
    if mode == "append" and versions:
        files = _read_manifest(table_dir, versions[-1])["files"] + new_files
    manifest = {
        "version": next_v,
        "mode": mode,
        "files": files,
        "schema": df.schema.json(),
    }
    tmp = os.path.join(_versions_dir(table_dir), f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    # the atomic commit point
    os.rename(tmp, os.path.join(_versions_dir(table_dir), f"{next_v:08d}.json"))
    return manifest


def read_version(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Load a snapshot (latest when ``version`` is None) — time travel."""
    versions = _list_versions(table_dir)
    if not versions:
        raise FileNotFoundError(f"no versions at {table_dir}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"version {v} not in {versions}")
    m = _read_manifest(table_dir, v)
    data_dir = os.path.join(table_dir, _DATA)
    paths = [os.path.join(data_dir, f) for f in m["files"]]
    return spark.read.parquet(*paths)


def history(table_dir: str) -> list[dict]:
    """The table's commit log, oldest first (version/mode/file count)."""
    out = []
    for v in _list_versions(table_dir):
        m = _read_manifest(table_dir, v)
        out.append(
            {"version": v, "mode": m["mode"], "n_files": len(m["files"])}
        )
    return out


def vacuum(table_dir: str, keep_last: int = 1) -> int:
    """Drop manifests older than the last ``keep_last`` and delete data
    files no surviving manifest references. Returns files deleted."""
    versions = _list_versions(table_dir)
    keep = set(versions[-keep_last:]) if keep_last > 0 else set()
    live: set[str] = set()
    for v in keep:
        live.update(_read_manifest(table_dir, v)["files"])
    deleted = 0
    data_dir = os.path.join(table_dir, _DATA)
    if os.path.isdir(data_dir):
        for f in os.listdir(data_dir):
            if f.endswith(".parquet") and f not in live:
                os.remove(os.path.join(data_dir, f))
                deleted += 1
    for v in versions:
        if v not in keep:
            os.remove(os.path.join(_versions_dir(table_dir), f"{v:08d}.json"))
    return deleted
