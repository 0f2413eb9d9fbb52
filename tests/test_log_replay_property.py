"""Property test for the round-5 incremental commit log: snapshot
reconstruction (checkpoint + segment replay, `_snapshot`) must agree
with a NAIVE reference fold over the full segment history — for any
random interleaving of append/merge/overwrite/optimize/metadata
commits, any checkpoint placement, and any vacuum-style segment
retention that keeps a covering checkpoint. Pure Python (segments are
JSON arithmetic; no Spark needed), so hypothesis can hammer it."""

from __future__ import annotations

import os

from hypothesis import given, settings
from hypothesis import strategies as st

from open_source_financial_time_series_data_pipeline_architecture_spark.sources import versioned as V

_SCHEMA = '{"type":"struct","fields":[]}'


def _naive_fold(segments: list[dict]) -> dict:
    """The obviously-correct model: full replay from genesis, no
    checkpoints, no incremental state reuse."""
    files: list[str] = []
    stats: dict = {}
    constraints: dict = {}
    bloom = None
    for seg in segments:
        if seg.get("reset"):
            files, stats = [], {}
        rm = set(seg.get("remove", []))
        if rm:
            files = [f for f in files if f not in rm]
            stats = {k: v for k, v in stats.items() if k not in rm}
        files = files + list(seg.get("add", []))
        stats = {**stats, **seg.get("stats", {})}
        constraints = seg.get("constraints", {})
        bloom = seg.get("bloom_cols")
    return {
        "files": files,
        "stats": stats,
        "constraints": constraints,
        "bloom_cols": bloom,
    }


# one random commit: (mode, n_add, n_remove_choices, reset)
_commit = st.sampled_from(["append", "merge", "overwrite", "optimize", "metadata"])


@st.composite
def _history(draw):
    n = draw(st.integers(min_value=1, max_value=24))
    modes = [draw(_commit) for _ in range(n)]
    modes[0] = "overwrite"  # a table starts with a snapshot
    adds = [draw(st.integers(min_value=0, max_value=3)) for _ in range(n)]
    ckpts = draw(st.sets(st.integers(min_value=1, max_value=n), max_size=4))
    seed = draw(st.integers(min_value=0, max_value=10**6))
    return modes, adds, sorted(ckpts), seed


@settings(max_examples=60, deadline=None)
@given(_history())
def test_snapshot_reconstruction_matches_naive_fold(tmp_path_factory, case):
    modes, adds, ckpts, seed = case
    t = str(tmp_path_factory.mktemp("log"))
    os.makedirs(os.path.join(t, V._VERSIONS), exist_ok=True)
    rng_state = seed
    segments: list[dict] = []
    live_files: list[str] = []
    counter = 0
    for i, (mode, n_add) in enumerate(zip(modes, adds), start=1):
        # deterministic pseudo-random removals from the live set
        rng_state = (rng_state * 1103515245 + 12345) % (2**31)
        reset = mode in ("overwrite", "optimize")
        remove: list[str] = []
        if mode == "merge" and live_files:
            k = rng_state % (len(live_files) + 1)
            remove = live_files[:k]
        add = []
        add_stats = {}
        if mode != "metadata":
            for _ in range(n_add if mode in ("append", "merge") else max(n_add, 1)):
                counter += 1
                f = f"v{i}-{counter:06d}.parquet"
                add.append(f)
                add_stats[f] = {
                    "rows": counter,
                    "cols": {"id": {"min": counter, "max": counter + 1, "nulls": 0}},
                }
        cons = {"c": "id >= 0"} if (rng_state >> 3) % 2 else {}
        seg = V._segment(
            i,
            mode,
            add=add,
            remove=remove,
            stats=add_stats,
            reset=reset,
            schema_json=_SCHEMA,
            txn={},
            constraints=cons,
            bloom_cols=["id"] if (rng_state >> 4) % 3 == 0 else None,
            n_files=0,  # fixed up below
        )
        # maintain the model's live set
        if reset:
            live_files = []
        live_files = [f for f in live_files if f not in set(remove)] + add
        seg["n_files"] = len(live_files)
        V._publish(t, seg)
        segments.append(seg)
        if i in ckpts:
            ref = _naive_fold(segments)
            V._write_checkpoint(
                t,
                {
                    "version": i,
                    "mode": mode,
                    "ts": seg["ts"],
                    "files": ref["files"],
                    "schema": _SCHEMA,
                    "txn": {},
                    "constraints": ref["constraints"],
                    "bloom_cols": ref["bloom_cols"],
                    "stats": ref["stats"],
                },
            )

    # every version reconstructs to the naive fold of its prefix
    for v in range(1, len(segments) + 1):
        ref = _naive_fold(segments[:v])
        got = V._snapshot(t, v, with_stats=True)
        assert got["files"] == ref["files"], (v, ckpts)
        assert got["stats"] == ref["stats"], (v, ckpts)
        assert got["n_files"] == len(ref["files"])
        assert got.get("constraints", {}) == ref["constraints"]
        assert got.get("bloom_cols") == (ref["bloom_cols"] or None)

    # vacuum-style retention: drop segments before the last checkpoint
    # at-or-before the head MINUS a margin, keep the covering ckpt —
    # surviving versions must still reconstruct
    if ckpts:
        floor = ckpts[-1]
        for v in range(1, floor):
            os.remove(os.path.join(t, V._VERSIONS, f"{v:08d}.json"))
        for v in range(floor, len(segments) + 1):
            ref = _naive_fold(segments[:v])
            got = V._snapshot(t, v, with_stats=True)
            assert got["files"] == ref["files"]
            assert got["stats"] == ref["stats"]
