"""MERGE INTO semantics on parquet (sources.sinks.merge_parquet):
update / delete / ignore matched-branches, insert-unmatched, and the
partition-scoped rewrite property (untouched partitions' files are not
rewritten — the 100 TB requirement)."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.sources.sinks import (
    merge_parquet,
)

KEYS = ["symbol", "trade_id"]


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "symbol string, trade_id string, px double, trade_date date"
    )


def _seed(spark, path):
    d1, d2 = dt.date(2024, 1, 1), dt.date(2024, 1, 2)
    base = _mk(
        spark,
        [
            ("A", "t1", 1.0, d1),
            ("A", "t2", 2.0, d1),
            ("B", "t3", 3.0, d2),
        ],
    )
    merge_parquet(spark, base, path, keys=KEYS, partition_col="trade_date")
    return d1, d2


def _read(spark, path):
    return {
        (r.symbol, r.trade_id): r.px
        for r in spark.read.parquet(path).collect()
    }


def test_merge_update_and_insert(spark, tmp_path):
    path = str(tmp_path / "t")
    d1, _ = _seed(spark, path)
    src = _mk(spark, [("A", "t1", 10.0, d1), ("A", "t9", 9.0, d1)])
    counts = merge_parquet(
        spark, src, path, keys=KEYS, when_matched="update", partition_col="trade_date"
    )
    assert counts == {"inserted": 1, "updated": 1, "deleted": 0}
    got = _read(spark, path)
    assert got[("A", "t1")] == 10.0  # updated
    assert got[("A", "t9")] == 9.0  # inserted
    assert got[("A", "t2")] == 2.0 and got[("B", "t3")] == 3.0  # untouched


def test_merge_delete_branch(spark, tmp_path):
    path = str(tmp_path / "t")
    d1, _ = _seed(spark, path)
    src = _mk(spark, [("A", "t2", 0.0, d1), ("A", "t9", 9.0, d1)])
    counts = merge_parquet(
        spark, src, path, keys=KEYS, when_matched="delete", partition_col="trade_date"
    )
    assert counts == {"inserted": 1, "updated": 0, "deleted": 1}
    got = _read(spark, path)
    assert ("A", "t2") not in got
    assert got[("A", "t9")] == 9.0 and got[("A", "t1")] == 1.0


def test_merge_ignore_is_first_write_wins(spark, tmp_path):
    path = str(tmp_path / "t")
    d1, _ = _seed(spark, path)
    src = _mk(spark, [("A", "t1", 99.0, d1), ("A", "t9", 9.0, d1)])
    counts = merge_parquet(
        spark, src, path, keys=KEYS, when_matched="ignore", partition_col="trade_date"
    )
    assert counts == {"inserted": 1, "updated": 0, "deleted": 0}
    got = _read(spark, path)
    assert got[("A", "t1")] == 1.0  # original kept
    assert got[("A", "t9")] == 9.0


def test_merge_rewrites_only_affected_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    d1, d2 = _seed(spark, path)
    part2 = os.path.join(path, "trade_date=2024-01-02")
    before = {
        f: os.path.getmtime(os.path.join(part2, f))
        for f in os.listdir(part2)
        if f.endswith(".parquet")
    }
    src = _mk(spark, [("A", "t1", 10.0, d1)])  # touches d1 only
    merge_parquet(
        spark, src, path, keys=KEYS, when_matched="update", partition_col="trade_date"
    )
    after = {
        f: os.path.getmtime(os.path.join(part2, f))
        for f in os.listdir(part2)
        if f.endswith(".parquet")
    }
    assert before == after, "untouched partition was rewritten"
    got = _read(spark, path)
    assert got[("A", "t1")] == 10.0 and got[("B", "t3")] == 3.0


def test_merge_random_sequences_match_dict_model(spark, tmp_path):
    # model-based: any sequence of merges must leave the table equal to a
    # dict driven by the same rules (deterministic "random" via hash)
    import itertools

    d1, d2 = dt.date(2024, 1, 1), dt.date(2024, 1, 2)
    key_space = [("A", f"t{i}") for i in range(6)] + [("B", f"t{i}") for i in range(4)]
    modes = ["update", "delete", "ignore"]
    counter = itertools.count(1)

    for seq in range(3):
        path = str(tmp_path / f"m{seq}")
        model: dict[tuple, float] = {}
        for step in range(4):
            mode = modes[(seq * 7 + step * 5) % 3]
            batch_keys = [
                key_space[(seq * 5 + step * 2 + j) % len(key_space)]
                for j in range(3)
            ]
            batch_keys = list(dict.fromkeys(batch_keys))  # dedup, keep order
            rows = [
                (s, t, float(next(counter)), d1 if s == "A" else d2)
                for (s, t) in batch_keys
            ]
            merge_parquet(
                spark,
                _mk(spark, rows),
                path,
                keys=KEYS,
                when_matched=mode,
                partition_col="trade_date",
            )
            first_write = step == 0
            for s, t, px, _ in rows:
                k = (s, t)
                if first_write or k not in model:
                    model[k] = px
                elif mode == "update":
                    model[k] = px
                elif mode == "delete":
                    del model[k]
                # ignore: keep existing
        got = _read(spark, path)
        assert got == model, (seq, got, model)


def test_compact_parquet_dir_reduces_files_preserves_rows(spark, tmp_path):
    from open_source_financial_time_series_data_pipeline_architecture_spark.sources.sinks import (
        compact_parquet_dir,
    )

    target = str(tmp_path / "frag")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    # fragment: 64 small files, streaming-append style
    df.repartition(64).write.mode("overwrite").parquet(target)
    before_rows = {tuple(r) for r in spark.read.parquet(target).collect()}

    stats = compact_parquet_dir(spark, target, max_records_per_file=100_000)
    assert stats["files_before"] >= 64
    assert stats["files_after"] < stats["files_before"]
    after_rows = {tuple(r) for r in spark.read.parquet(target).collect()}
    assert after_rows == before_rows
    assert not os.path.exists(target + ".__compact__")
    assert not os.path.exists(target + ".__old__")


def test_compact_preserves_partition_layout(spark, tmp_path):
    from open_source_financial_time_series_data_pipeline_architecture_spark.sources.sinks import (
        compact_parquet_dir,
    )

    target = str(tmp_path / "part_frag")
    df = spark.range(0, 1000).withColumn("p", (F.col("id") % 3).cast("int"))
    df.repartition(20).write.mode("overwrite").partitionBy("p").parquet(target)
    stats = compact_parquet_dir(
        spark, target, max_records_per_file=10_000, partition_col="p"
    )
    assert stats["files_after"] < stats["files_before"]
    assert sorted(
        d for d in os.listdir(target) if d.startswith("p=")
    ) == ["p=0", "p=1", "p=2"]
    assert spark.read.parquet(target).count() == 1000
