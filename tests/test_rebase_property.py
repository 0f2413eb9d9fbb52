"""Property test: the rebase conflict checker is SOUND and (with exact
stats) COMPLETE against a row-level model.

`_rebase_head_or_raise` decides from segment metadata alone whether a
loser's staged output can republish on a new head. This hammers it with
random winner interleavings (appends / merges / overwrites over files
with known key ranges) and checks both directions against the ground
truth the metadata abstracts:

- SOUND: whenever the checker ACCEPTS, no winner reset the table, no
  winner removed a file the loser read-and-replaced, and no winner
  added a single ROW inside the loser's read range — i.e. winner-then-
  loser is serializable.
- COMPLETE (exact stats): with tight min/max envelopes and no NULLs,
  the checker accepts EVERY disjoint race — conservatism only ever
  comes from missing stats, which this model never has.

Pure python over on-disk JSON segments — no Spark session, thousands of
cases in seconds.
"""

from __future__ import annotations

import json
import os
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from open_source_financial_time_series_data_pipeline_architecture_spark.sources import versioned as V

_SCHEMA = json.dumps({"type": "struct", "fields": []})


def _file(name: str, lo: int, hi: int) -> tuple[str, dict]:
    """A file holding keys lo..hi inclusive, with exact footer stats."""
    return name, {
        "rows": hi - lo + 1,
        "cols": {"k": {"min": lo, "max": hi, "nulls": 0}},
    }


def _publish_seg(tdir: str, version: int, **kw) -> None:
    V._publish(tdir, V._segment(version, schema_json=_SCHEMA, txn={},
                                constraints={}, bloom_cols=None, **kw))


_range = st.tuples(st.integers(0, 60), st.integers(0, 15)).map(
    lambda t: (t[0], t[0] + t[1])
)

_winner_op = st.sampled_from(["append", "merge", "overwrite"])


@settings(max_examples=400, deadline=None)
@given(
    base_ranges=st.lists(_range, min_size=1, max_size=4),
    read_range=_range,
    winners=st.lists(
        st.tuples(_winner_op, _range, st.sets(st.integers(0, 3), max_size=2)),
        min_size=1,
        max_size=3,
    ),
)
def test_rebase_checker_sound_and_complete(base_ranges, read_range, winners):
    tdir = tempfile.mkdtemp(prefix="rebase_prop_")
    os.makedirs(V._versions_dir(tdir))
    base_files: dict[str, tuple[int, int]] = {}
    stats: dict = {}
    for i, (lo, hi) in enumerate(base_ranges):
        name, s = _file(f"v1-base{i}.parquet", lo, hi)
        base_files[name] = (lo, hi)
        stats[name] = s
    _publish_seg(
        tdir, 1, mode="overwrite", add=list(base_files), stats=stats,
        reset=True, n_files=len(base_files),
    )
    a, b = read_range
    preds = [("k", ">=", a), ("k", "<=", b)]
    # the loser read-and-replaces every base file overlapping its range
    touched = [f for f, (lo, hi) in base_files.items() if lo <= b and hi >= a]

    # apply the winners as published segments on top of version 1
    current = list(base_files)
    model_reset = False
    model_removed_touched: set[str] = set()
    model_added: list[tuple[int, int]] = []
    v = 1
    for wi, (op, (lo, hi), rm_idx) in enumerate(winners):
        v += 1
        name, s = _file(f"v{v}-w{wi}.parquet", lo, hi)
        if op == "append":
            _publish_seg(tdir, v, mode="append", add=[name],
                         stats={name: s}, n_files=len(current) + 1)
            current.append(name)
            model_added.append((lo, hi))
        elif op == "merge":
            removed = [
                current[i % len(current)] for i in sorted(rm_idx)
            ] if current else []
            removed = sorted(set(removed))
            _publish_seg(tdir, v, mode="merge", add=[name], remove=removed,
                         stats={name: s},
                         n_files=len(current) - len(removed) + 1)
            current = [f for f in current if f not in removed] + [name]
            model_removed_touched |= set(removed) & set(touched)
            model_added.append((lo, hi))
        else:  # overwrite
            _publish_seg(tdir, v, mode="overwrite", add=[name],
                         stats={name: s}, reset=True, n_files=1)
            current = [name]
            model_reset = True
            model_added.append((lo, hi))

    model_disjoint = (
        not model_reset
        and not model_removed_touched
        and all(not (lo <= b and hi >= a) for lo, hi in model_added)
    )
    try:
        head = V._rebase_head_or_raise(tdir, 1, touched, preds, {}, _SCHEMA)
        accepted = True
        assert head["version"] == v
    except V.RebaseConflictError:
        accepted = False
    # SOUND: acceptance implies the row-level model is disjoint;
    # COMPLETE: with exact stats, disjoint races are always accepted
    assert accepted == model_disjoint, (
        base_ranges, read_range, winners, touched,
        model_reset, model_removed_touched, model_added,
    )
