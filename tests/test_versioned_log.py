"""Incremental commit log (round 5): segments are O(touched),
checkpoints bound reconstruction, vacuum keeps kept versions
reconstructible, footer stats collect in parallel/distributed, and
distributed pruning agrees with the driver-side envelope checks."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from open_source_financial_time_series_data_pipeline_architecture_spark.sources import versioned as V


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumn("v", F.col("id") * 10)


def _seg_bytes(t: str, v: int) -> int:
    return os.path.getsize(os.path.join(t, V._VERSIONS, f"{v:08d}.json"))


# -- commit bytes are O(touched), not O(table) ----------------------------


def test_append_segment_bytes_do_not_grow_with_table(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10).coalesce(1), t)
    sizes = []
    for i in range(1, 25):
        V.commit(
            _df(spark, 10 * i, 10 * (i + 1)).coalesce(1), t, mode="append"
        )
        sizes.append(_seg_bytes(t, i + 1))
    # every append lists ONE added file; segment size is flat (no
    # full-snapshot file list / stats), modulo a few bytes of version
    # digits — the round-4 format grew linearly here
    assert max(sizes) - min(sizes) < 200
    seg = V._read_segment(t, 25)
    assert "files" not in seg and len(seg["add"]) == 1
    assert set(seg["stats"]) == set(seg["add"])
    assert seg["n_files"] == 25
    # the full snapshot still reconstructs exactly
    m = V._read_manifest(t, 25)
    assert len(m["files"]) == 25 and set(m["stats"]) == set(m["files"])
    assert V.read_version(spark, t).count() == 250


def test_merge_segment_lists_only_touched_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 1000).repartitionByRange(8, "id"), t)
    src = _df(spark, 0, 10).withColumn("v", F.col("v") + 1)
    V.merge(spark, t, src, keys=["id"])
    seg = V._read_segment(t, 2)
    assert seg["mode"] == "merge" and "files" not in seg
    assert len(seg["remove"]) <= 2  # only the envelope-matching files
    assert set(seg["stats"]) == set(seg["add"])
    # snapshot carries the untouched files + stats forward implicitly
    m = V._read_manifest(t, 2)
    assert set(m["stats"]) == set(m["files"]) and len(m["files"]) >= 7


# -- checkpoints ----------------------------------------------------------


def test_checkpoint_rolls_on_cadence_and_reconstruction_matches(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for i in range(V.CHECKPOINT_EVERY + 3):
        V.commit(_df(spark, 10 * i, 10 * (i + 1)).coalesce(1), t,
                 mode="append" if i else "overwrite")
    assert V._list_checkpoints(t) == [V.CHECKPOINT_EVERY]
    # reads before, at, and after the checkpoint boundary
    for v in (V.CHECKPOINT_EVERY - 1, V.CHECKPOINT_EVERY, V.CHECKPOINT_EVERY + 3):
        assert V.read_version(spark, t, version=v).count() == 10 * v
    # stats roundtrip through the parquet checkpoint bit-exactly
    m_replayed = V._snapshot(t, V.CHECKPOINT_EVERY + 3, with_stats=True)
    ck_files = set(
        json.load(open(V._ckpt_json_path(t, V.CHECKPOINT_EVERY)))["files"]
    )
    assert ck_files <= set(m_replayed["files"])
    assert set(m_replayed["stats"]) == set(m_replayed["files"])


def test_checkpoint_stats_parquet_roundtrip_types(tmp_path):
    """int64 / double / string / empty-envelope stats survive the
    parquet encode/decode bit-exactly (incl. values beyond 2^53 that a
    double roundtrip would corrupt)."""
    stats = {
        "a.parquet": {
            "rows": 10,
            "cols": {
                "i": {"min": -(2**62), "max": 2**62 + 7, "nulls": 0},
                "d": {"min": -1.5, "max": 2.25, "nulls": 3},
                "s": {"min": "aaa", "max": "zzz", "nulls": 1},
                "e": {"min": None, "max": None, "nulls": 10},
            },
        },
        "b.parquet": {"rows": 0, "cols": {}},
    }
    back = V._stats_from_arrow(V._stats_to_arrow(stats))
    assert back == stats


def test_vacuum_checkpoints_oldest_kept_then_drops_segments(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for i in range(6):
        V.commit(_df(spark, 10 * i, 10 * (i + 1)).coalesce(1), t,
                 mode="append" if i else "overwrite")
    assert V._list_checkpoints(t) == []  # below cadence
    deleted = V.vacuum(t, keep_last=3)
    assert deleted == 0  # appends: every file still referenced by head
    assert V._list_versions(t) == [4, 5, 6]
    # oldest kept version got a checkpoint so it stays reconstructible
    assert 4 in V._list_checkpoints(t)
    for v, n in ((4, 40), (5, 50), (6, 60)):
        assert V.read_version(spark, t, version=v).count() == n
    assert [h["version"] for h in V.history(t)] == [4, 5, 6]
    # appends after vacuum keep working
    V.commit(_df(spark, 60, 70).coalesce(1), t, mode="append")
    assert V.read_version(spark, t).count() == 70


def test_vacuum_overwrite_reclaims_and_reads_survive(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 100).repartition(4), t)
    V.commit(_df(spark, 0, 10).coalesce(1), t)  # overwrite orphans v1
    assert V.vacuum(t, keep_last=1) == 4
    assert V.read_version(spark, t).count() == 10
    with pytest.raises(ValueError):
        V.read_version(spark, t, version=1)


# -- legacy manifests -----------------------------------------------------


def test_legacy_full_manifest_tables_read_without_migration(spark, tmp_path):
    """Tables written by the round-4 format (full-snapshot manifests)
    replay as reset+add — reads, history, CDC all work unchanged."""
    t = str(tmp_path / "tbl")
    df = _df(spark, 0, 20).coalesce(1)
    V.commit(df, t)  # v1 in the NEW format
    m = V._read_manifest(t, 1)
    # hand-write v2 in the OLD format: full file list + stats
    legacy = {
        "version": 2,
        "mode": "append",
        "ts": V._now(),
        "files": m["files"] + [],  # same snapshot (no new data needed)
        "schema": m["schema"],
        "stats": m["stats"],
        "txn": {},
    }
    V._publish(t, legacy)
    assert V.read_version(spark, t, version=2).count() == 20
    assert [h["n_files"] for h in V.history(t)] == [1, 1]
    assert V.read_changes(spark, t, 1, 2).count() == 0  # no new files
    V.commit(_df(spark, 20, 30).coalesce(1), t, mode="append")
    assert V.read_version(spark, t).count() == 30


# -- parallel / distributed footer stats ----------------------------------


def test_collect_stats_distributed_matches_serial(spark, tmp_path):
    t = str(tmp_path / "tbl")
    n_files = V._STATS_DISTRIBUTED_MIN
    V.commit(_df(spark, 0, 6400).repartitionByRange(n_files, "id"), t)
    m = V._read_manifest(t, 1)
    assert len(m["files"]) == n_files
    serial = {
        f: V._file_stats(os.path.join(t, V._DATA, f)) for f in m["files"]
    }
    assert m["stats"] == serial  # commit used the executor path
    dist = V._collect_stats(t, m["files"], spark=spark)
    assert dist == serial


# -- distributed pruning ---------------------------------------------------


def test_distributed_prune_matches_driver_prune(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(V, "DISTRIBUTED_PRUNE_MIN_FILES", 4)
    t = str(tmp_path / "tbl")
    df = spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") * 1.5).alias("x"),
        F.concat(F.lit("k"), F.lpad(F.col("id").cast("string"), 4, "0")).alias("s"),
    )
    V.commit(df.repartitionByRange(8, "id"), t)
    V.checkpoint(t)  # force the stats checkpoint the dist path reads
    V.commit(
        spark.range(1000, 1100).select(
            "id", (F.col("id") * 1.5).alias("x"),
            F.concat(F.lit("k"), F.lpad(F.col("id").cast("string"), 4, "0")).alias("s"),
        ).coalesce(1),
        t,
        mode="append",
    )
    full = V._read_manifest(t, 2)
    for preds in [
        [("id", ">=", 900)],
        [("id", "=", 5)],
        [("x", "<", 75.0)],
        [("s", ">=", "k0990")],
        [("id", "in", [3, 1050])],
        [("id", ">=", 250), ("id", "<", 260)],
        [("id", ">", 100000)],
    ]:
        driver_kept, _ = V.prune_files(full, preds)
        rep: dict = {}
        got = V.read_version(spark, t, predicates=preds, prune_report=rep)
        assert rep["files_kept"] == len(driver_kept), preds
        exp = V._apply_predicates(
            V.read_version(spark, t), preds
        ).count()
        assert got.count() == exp, preds


def test_distributed_prune_long_beyond_2p53_is_safe(spark, tmp_path, monkeypatch):
    """int64 envelopes beyond the double-exact range must never be
    wrongly excluded by a float predicate — the dist path guards the
    cross-kind compare; the residual filter keeps results exact."""
    monkeypatch.setattr(V, "DISTRIBUTED_PRUNE_MIN_FILES", 1)
    t = str(tmp_path / "tbl")
    base = 2**60
    df = spark.createDataFrame(
        [(base + i,) for i in range(4)], "big long"
    ).coalesce(1)
    V.commit(df, t)
    V.checkpoint(t)
    got = V.read_version(spark, t, predicates=[("big", ">=", float(base))])
    assert got.count() == 4


# -- pluggable CAS publisher ------------------------------------------------


def test_cas_publisher_contention_exactly_one_winner(tmp_path):
    """The put-if-absent contract under real thread contention: 16
    racing writers, exactly ONE wins, and the winner's payload is what
    lands (no torn/replaced content)."""
    import threading

    target = str(tmp_path / "00000001.json")
    pub = V.LocalLinkPublisher()
    results: list[tuple[int, bool]] = []
    lock = threading.Lock()
    barrier = threading.Barrier(16)

    def race(i: int):
        barrier.wait()
        won = pub.put_if_absent(target, json.dumps({"writer": i}).encode())
        with lock:
            results.append((i, won))

    threads = [threading.Thread(target=race, args=(i,)) for i in range(16)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    winners = [i for i, won in results if won]
    assert len(winners) == 1
    with open(target) as f:
        assert json.load(f) == {"writer": winners[0]}
    # no temp-file litter
    assert os.listdir(tmp_path) == ["00000001.json"]


def test_publish_uses_injected_publisher(tmp_path):
    """_publish is backend-pluggable: a publisher that reports 'already
    exists' surfaces as ConcurrentCommitError; a winning one lands the
    segment."""

    class Recorder(V.CasPublisher):
        def __init__(self, win: bool):
            self.win = win
            self.calls: list[str] = []

        def put_if_absent(self, target: str, payload: bytes) -> bool:
            self.calls.append(target)
            if self.win:
                with open(target, "wb") as f:
                    f.write(payload)
            return self.win

    os.makedirs(tmp_path / V._VERSIONS)
    t = str(tmp_path)
    winner = Recorder(True)
    V._publish(t, {"version": 1, "mode": "overwrite"}, publisher=winner)
    assert len(winner.calls) == 1 and os.path.exists(winner.calls[0])
    loser = Recorder(False)
    with pytest.raises(V.ConcurrentCommitError):
        V._publish(t, {"version": 1, "mode": "overwrite"}, publisher=loser)


def test_s3_conditional_put_publisher_contract():
    """The object-store CAS backend against a fake client: first PUT
    wins with If-None-Match:*, a 412 PreconditionFailed maps to False
    (ConcurrentCommitError upstream), any other error propagates."""

    class FakeS3:
        def __init__(self):
            self.objects = {}

        def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
            assert IfNoneMatch == "*"  # the publisher MUST be conditional
            if (Bucket, Key) in self.objects:
                exc = Exception("precondition failed")
                exc.response = {"Error": {"Code": "PreconditionFailed"}}
                raise exc
            self.objects[(Bucket, Key)] = bytes(Body)

    client = FakeS3()
    pub = V.S3ConditionalPutPublisher("bkt", client=client)
    assert pub.put_if_absent("/t/_versions/00000001.json", b"{}") is True
    assert pub.put_if_absent("/t/_versions/00000001.json", b"{}") is False
    assert client.objects[("bkt", "t/_versions/00000001.json")] == b"{}"

    class Breaks(FakeS3):
        def put_object(self, **kw):
            raise RuntimeError("network down")

    with pytest.raises(RuntimeError, match="network down"):
        V.S3ConditionalPutPublisher("bkt", client=Breaks()).put_if_absent(
            "/x", b"{}"
        )


def test_10k_commit_log_reconstruction_is_checkpoint_bounded(tmp_path, monkeypatch):
    """The r4 verdict's 'Done' criterion at the commit-count dimension:
    on a fabricated 10k-commit table (segments + cadence checkpoints
    written directly, no Spark), snapshot reconstruction at ANY version
    reads at most ONE checkpoint and CHECKPOINT_EVERY segments — and
    history() reads segments only, never snapshots."""
    t = str(tmp_path / "tbl")
    os.makedirs(os.path.join(t, V._VERSIONS))
    schema = '{"type":"struct","fields":[]}'
    n_commits = 10_000
    state_files: list[str] = []
    state_stats: dict = {}
    for v in range(1, n_commits + 1):
        fname = f"v{v}-{v:08x}.parquet"
        seg = V._segment(
            v,
            "append" if v > 1 else "overwrite",
            add=[fname],
            stats={fname: {"rows": 10, "cols": {"id": {"min": v, "max": v, "nulls": 0}}}},
            reset=v == 1,
            schema_json=schema,
            txn={},
            constraints={},
            bloom_cols=None,
            n_files=v,
        )
        V._publish(t, seg)
        state_files.append(fname)
        state_stats[fname] = seg["stats"][fname]
        # checkpoints only near the probed versions: 1000 full-snapshot
        # checkpoints would write ~5M file names (~150 MB) to prove the
        # same bound three checkpoints prove
        if v in (5_000, 9_990, 10_000):
            V._write_checkpoint(
                t,
                {
                    "version": v,
                    "mode": seg["mode"],
                    "ts": seg["ts"],
                    "files": list(state_files),
                    "schema": schema,
                    "txn": {},
                    "constraints": {},
                    "bloom_cols": None,
                    "stats": dict(state_stats),
                },
            )

    reads = {"segments": 0}
    orig = V._read_segment

    def counting(table_dir, version):
        reads["segments"] += 1
        return orig(table_dir, version)

    monkeypatch.setattr(V, "_read_segment", counting)
    for v in (n_commits, n_commits - 3, 9_995, 5_004):
        reads["segments"] = 0
        snap = V._snapshot(t, v, with_stats=False)
        assert snap["n_files"] == v and len(snap["files"]) == v
        assert reads["segments"] <= V.CHECKPOINT_EVERY
    # with stats: same bound, envelopes intact through the parquet ckpt
    reads["segments"] = 0
    snap = V._snapshot(t, n_commits, with_stats=True)
    assert reads["segments"] <= V.CHECKPOINT_EVERY
    assert snap["stats"][f"v{n_commits}-{n_commits:08x}.parquet"]["cols"]["id"]["min"] == n_commits
    # history: one segment read per commit, no reconstruction
    reads["segments"] = 0
    h = V.history(t)
    assert len(h) == n_commits and h[-1]["n_files"] == n_commits
    assert reads["segments"] == n_commits
