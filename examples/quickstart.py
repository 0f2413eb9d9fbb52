#!/usr/bin/env python
"""Quickstart: the five workflows a user of the reference pipeline runs
daily, on this engine. Runs end-to-end on the bundled sf0.001 test data
in ~30 s:

    python examples/quickstart.py [sf_dir]

1. batch features   — the 11-feature Smart-DB contract by name
2. PIT serving      — leak-free as-of feature retrieval (Feast analog)
3. online store     — warm sub-ms point lookups (Redis analog)
4. data quality     — completeness / accuracy / freshness report
5. corpus plane     — dedup + quality gate + training-mix manifest
6. risk morning     — Kalman level, VaR/ES backtest, anomaly triage
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from open_source_financial_time_series_data_pipeline_architecture_spark.session import get_spark
from open_source_financial_time_series_data_pipeline_architecture_spark.api import Engine


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="quickstart", master="local[4]")
    eng = Engine(spark, sf_dir)

    # 1. batch features by name (reference: batch_feature_calculation.py)
    print("== features ==", eng.feature_names())
    eng.feature("ohlc_1m").show(3, truncate=False)
    eng.feature("vwap_5m").show(3, truncate=False)

    # 2. point-in-time snapshot — never reads past as_of
    sym = eng.trades().select("symbol").first()["symbol"]
    print(f"== pit snapshot ({sym}) ==")
    eng.pit_snapshot(sym, as_of="2024-01-08T00:00:00").show(truncate=False)

    # 3. online store: materialize once, then warm point lookups
    store = eng.online_store()
    print("== online lookup ==")
    store.get([sym]).show(truncate=False)

    # 4. data-quality report (reference: quality SLA plane)
    print("== dq report ==")
    eng.dq_report().show(truncate=False)

    # 5. corpus plane: the training-data decision manifest
    import __spark_entry__ as queries

    print("== corpus manifest (keep/drop decisions) ==")
    queries.queries()["corpus_manifest"](spark, sf_dir).groupBy(
        "keep", "drop_reason"
    ).count().show(truncate=False)

    # 6. risk morning report: adaptive-gain price level, ES backtest,
    # and the composite anomaly triage list
    print("== kalman level (last rows) ==")
    queries.queries()["kalman_level"](spark, sf_dir).orderBy(
        "symbol", "time"
    ).limit(3).show(truncate=False)
    print("== ES backtest ==")
    queries.queries()["es_backtest_acerbi"](spark, sf_dir).show(truncate=False)
    print("== anomaly triage (top days) ==")
    queries.queries()["anomaly_day_ranking"](spark, sf_dir).show(
        5, truncate=False
    )

    # 7. the lakehouse table: transactional storage for all of the
    # above (reference: batch_feature_calculation.py writes Delta) —
    # commit, OPTIMIZE ZORDER, pruned reads, MERGE, time travel, CDF
    import tempfile

    t = eng.versioned_table(tempfile.mkdtemp(prefix="fts_quickstart_"))
    trades = eng.trades()
    t.overwrite(trades.repartition(4))
    t.compact(n_files=4, zorder_cols=["symbol", "price"])
    rep: dict = {}
    print("== pruned lakehouse scan ==")
    t.read(predicates=[("symbol", "=", sym)], prune_report=rep).groupBy(
        "symbol"
    ).count().show(truncate=False)
    print(f"   (manifest pruning read {rep['files_kept']}/{rep['files_total']} files)")
    from pyspark.sql import functions as F

    t.merge(
        trades.filter(F.col("symbol") == sym).withColumn(
            "price", F.col("price") * 2
        ),
        keys=["symbol", "trade_id"],
    )
    print("== change data feed (the merge, rolled up) ==")
    t.changes(2).groupBy("_commit_version", "_change_type").count().show(
        truncate=False
    )
    print("== time travel ==")
    print(
        "   rows now:", t.read().count(),
        "| rows at v1:", t.read(version=1).count(),
        "| history:", [(h["version"], h["mode"]) for h in t.history()],
    )
    print("== zero-copy fork (SHALLOW CLONE, round 6) ==")
    fork = t.clone(tempfile.mkdtemp(prefix="fts_quickstart_fork_"))
    fork.delete_where([("symbol", "=", sym)])
    print(
        "   fork rows:", fork.read().count(),
        "| source rows (untouched):", t.read().count(),
    )

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
