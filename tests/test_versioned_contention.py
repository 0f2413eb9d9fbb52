"""Sustained multi-writer contention (round 7, VERDICT r6 #6): N real
threads looping lost-CAS → rebase → lost-CAS again — the realistic
100 TB ingest topology (the reference's dual Flink+Spark writers,
ARCHITECTURE.md:12-15, generalized to a writer fleet). Unlike
test_versioned_rebase.py's deterministic single-race injections, these
races are REAL: every writer publishes through the put-if-absent CAS
concurrently and resolves its own conflicts.

Bounded-retry contract (documented here, asserted below): a rewrite
loser rebases up to ``rebase_retries`` times, an append loser retries
up to ``retries`` times, then raises. Worst case one op loses to every
other in-flight op once, so a fleet of W writers × K ops each needs
retries ≥ W·K − 1 to guarantee landing; production picks a bound and
treats exhaustion as backpressure (resubmit), never silent loss.
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.sources import versioned as V

_RETRIES = 40  # ≥ W·K − 1 = 15 with headroom (see module docstring)


def _df(spark, lo, hi, v_expr=None):
    df = spark.range(lo, hi)
    return df.withColumn(
        "v", (F.col("id") * 10 if v_expr is None else v_expr).cast("long")
    )


def test_eight_mixed_writers_all_land_and_match_serial(spark, tmp_path):
    """8 threads × 2 ops (appends, file-disjoint MERGEs, merge-on-read
    deletes, a copy-on-write UPDATE) race on one table: every commit
    eventually lands (one version per op — nothing lost, nothing
    doubled) and the final content equals the serial application of the
    16 ops, which is order-independent because the ops are pairwise
    disjoint."""
    t = str(tmp_path / "tbl")
    # 8 id-ranged files (~100 ids each): the hypertable-style layout
    # whose tight envelopes make the merges file-disjoint
    V.commit(_df(spark, 0, 800).repartitionByRange(8, "id"), t)

    def append(lo, hi):
        return lambda: V.commit(
            _df(spark, lo, hi).coalesce(1), t, mode="append",
            retries=_RETRIES,
        )

    def merge(lo, hi, mark):
        src = _df(spark, lo, hi, v_expr=F.lit(mark))
        return lambda: V.merge(
            spark, t, src, keys=["id"], rebase_retries=_RETRIES
        )

    def mor_delete(lo, hi):
        return lambda: V.delete_where(
            spark, t,
            [("id", ">=", lo), ("id", "<=", hi)],
            merge_on_read=True,
            rebase_retries=_RETRIES,
        )

    def cow_update(lo, hi, mark):
        return lambda: V.update_where(
            spark, t,
            [("id", ">=", lo), ("id", "<=", hi)],
            {"v": F.lit(mark).cast("long")},
            rebase_retries=_RETRIES,
        )

    writers = [  # two ops per thread, all pairwise file-disjoint
        [append(1000, 1050), append(1050, 1100)],
        [append(1100, 1150), append(1150, 1200)],
        [append(1200, 1250), append(1250, 1300)],
        [merge(0, 25, -1), merge(25, 50, -1)],
        [merge(100, 125, -2), merge(125, 150, -2)],
        [mor_delete(700, 719), mor_delete(720, 739)],
        [append(1300, 1350), merge(200, 250, -3)],
        [append(1400, 1450), cow_update(300, 349, -4)],  # inclusive hi
    ]

    barrier = threading.Barrier(len(writers))
    errors: list = []

    def run(ops):
        barrier.wait()
        try:
            for op in ops:
                op()
        except Exception as exc:  # pragma: no cover - failure detail
            errors.append(exc)

    threads = [threading.Thread(target=run, args=(ops,)) for ops in writers]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, f"writers failed under contention: {errors!r}"

    # every op landed exactly once: base + 16 commits
    assert V._list_versions(t)[-1] == 17

    # final content == the serial application of the 16 disjoint ops
    expected = (
        _df(spark, 0, 800)
        .unionByName(_df(spark, 1000, 1300))
        .unionByName(_df(spark, 1300, 1350))
        .unionByName(_df(spark, 1400, 1450))
        .filter(~F.col("id").between(700, 739))
        .withColumn(
            "v",
            F.when(F.col("id") < 50, F.lit(-1))
            .when(F.col("id").between(100, 149), F.lit(-2))
            .when(F.col("id").between(200, 249), F.lit(-3))
            .when(F.col("id").between(300, 349), F.lit(-4))
            .otherwise(F.col("v"))
            .cast("long"),
        )
    )
    got = V.read_version(spark, t).toPandas().sort_values("id").reset_index(drop=True)
    exp = expected.toPandas().sort_values("id").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(
        got[["id", "v"]], exp[["id", "v"]], check_dtype=True
    )


def test_retry_exhaustion_is_loud_not_lossy(spark, tmp_path, monkeypatch):
    """The bounded-retry contract's failure mode: with rebase_retries=0
    a loser raises (ConcurrentCommitError surfaces; nothing silently
    drops) and the WINNER's commit is intact."""
    t = str(tmp_path / "tbl")
    V.commit(_df(spark, 0, 10).coalesce(1), t)
    V.commit(_df(spark, 100, 110).coalesce(1), t, mode="append")

    orig = V._publish
    state = {"armed": True}

    def patched(table_dir, seg, publisher=None):
        if state["armed"] and seg.get("mode") == "merge":
            state["armed"] = False
            V.commit(_df(spark, 200, 210).coalesce(1), t, mode="append")
        return orig(table_dir, seg, publisher)

    monkeypatch.setattr(V, "_publish", patched)
    src = _df(spark, 0, 5, v_expr=F.lit(-1))
    with pytest.raises(V.ConcurrentCommitError):
        V.merge(spark, t, src, keys=["id"], rebase_retries=0)
    # the winner landed; the loser changed nothing
    got = V.read_version(spark, t)
    assert got.count() == 30
    assert got.filter(F.col("v") == -1).count() == 0
