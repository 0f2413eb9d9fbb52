"""Pin the mechanics the PLANS.md 100 TB cache-bound argument rests on:
the corpus-sized session caches (`_trades`, `_doc_shingles`) are
StorageLevel MEMORY_AND_DISK (partitions spill / evict-and-recompute
under memory pressure — never OOM, never wrong), and the cached frames
are logically identical to their uncached forms (same rows), so
dropping the cache at scale is a pure cost decision, not a semantic
one."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry
from open_source_financial_time_series_data_pipeline_architecture_spark.functions import (
    text as TX,
)
from open_source_financial_time_series_data_pipeline_architecture_spark.sources import (
    load_table,
)
from open_source_financial_time_series_data_pipeline_architecture_spark.schema import (
    trades_from_events,
)

SF = "/root/testdata/sf0.001"


def _level(df):
    df.count()  # materialize so the storage level is live, not declared
    return df.storageLevel


def test_trades_cache_is_memory_and_disk(spark):
    t = entry._trades(spark, SF)
    lvl = _level(t)
    assert lvl.useMemory and lvl.useDisk, (
        "corpus-sized cache must spill under pressure, not OOM: "
        f"{lvl}"
    )


def test_shingles_cache_is_memory_and_disk(spark):
    s = entry._doc_shingles(spark, SF)
    lvl = _level(s)
    assert lvl.useMemory and lvl.useDisk, str(lvl)


def test_trades_cache_logically_identical(spark):
    cached = entry._trades(spark, SF)
    fresh = trades_from_events(load_table(spark, SF, "events"))
    assert cached.columns == fresh.columns
    assert (
        cached.exceptAll(fresh).count() == 0
        and fresh.exceptAll(cached).count() == 0
    )


def test_shingles_cache_logically_identical(spark):
    cached = entry._doc_shingles(spark, SF)
    fresh = TX.shingles(load_table(spark, SF, "documents"), n=3)
    assert cached.columns == fresh.columns
    assert (
        cached.exceptAll(fresh).count() == 0
        and fresh.exceptAll(cached).count() == 0
    )


def test_cached_partitions_recompute_after_unpersist(spark):
    """Eviction safety: dropping the cached data (the worst case of
    memory-pressure eviction) changes nothing about the answer."""
    t = entry._trades(spark, SF)
    before = t.agg(F.count(F.lit(1)), F.sum("price")).collect()[0]
    t.unpersist(blocking=True)
    try:
        after = t.agg(F.count(F.lit(1)), F.sum("price")).collect()[0]
        assert list(before) == list(after)
    finally:
        t.cache()  # restore the session-cache contract for later tests
