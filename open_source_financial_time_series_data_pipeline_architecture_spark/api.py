"""User-facing engine facade.

The reference exposes its capabilities through SQL (TimescaleDB),
Feast, and the `SmartDBContract` Python wrapper
(/root/reference/src/features/smartdb_contract.py:182-233). This facade
is the equivalent single entry point for the Spark engine: construct it
over a data directory (or hand it pre-built DataFrames) and everything
— feature tables, SQL views, PIT queries, quality reports — hangs off
one object.

    eng = Engine(spark, "/root/testdata/sf0.01")
    eng.feature("ohlc_1m")                      # DataFrame
    eng.pit_snapshot("purchase", ts)            # 1-row wide DataFrame
    eng.get_historical_features(entity_df)      # vectorized as-of join
    eng.register_sql_views()                    # SQL: SELECT * FROM ohlc_1m
    eng.dq_report()                             # composite quality score
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import quality as QX
from .functions import registry as REG
from .operators import asof as ASOF
from .schema import trades_from_events
from .sources import load_table


class Engine:
    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str | None = None,
        trades: DataFrame | None = None,
    ):
        if trades is None and sf_dir is None:
            raise ValueError("need sf_dir or a trades DataFrame")
        self.spark = spark
        self.sf_dir = sf_dir
        self._trades = trades
        self._feature_cache: dict[str, DataFrame] = {}

    # -- data access --------------------------------------------------
    def trades(self) -> DataFrame:
        if self._trades is None:
            self._trades = trades_from_events(
                load_table(self.spark, self.sf_dir, "events")
            )
        return self._trades

    def table(self, name: str) -> DataFrame:
        return load_table(self.spark, self.sf_dir, name)

    def versioned_table(self, path: str):
        """Handle over a versioned (Delta-lite) table at ``path`` —
        commits, MERGE, time travel, change feeds, streaming tail/CDF,
        constraints, OPTIMIZE/restore/vacuum (sources/versioned.py)."""
        from .sources.versioned import VersionedTable

        return VersionedTable(self.spark, path)

    def continuous_aggregate(self, base_path: str, agg_path: str, **kw):
        """A TimescaleDB-style continuous aggregate over the versioned
        table at ``base_path``, materialized at ``agg_path`` — the
        reference's 11 Smart-DB features are exactly these
        (sql/timescaledb_schema.sql:44-65). kwargs: time_col,
        bucket_seconds, group_cols, aggs; see sources/cagg.py for
        create()/refresh()/read_realtime()/refresh_policy_writer()."""
        from .sources.cagg import ContinuousAggregate

        return ContinuousAggregate(self.spark, base_path, agg_path, **kw)

    # -- features -----------------------------------------------------
    def feature(self, name: str) -> DataFrame:
        if name not in self._feature_cache:
            spec = REG.get_feature(name)
            self._feature_cache[name] = spec.builder(self.trades())
        return self._feature_cache[name]

    def feature_names(self) -> list[str]:
        return [s.name for s in REG.all_features()]

    # -- PIT serving --------------------------------------------------
    def pit_snapshot(self, symbol: str, as_of, now=None) -> DataFrame:
        """Scalar PIT snapshot (A11): latest OHLC/SMA/VWAP/volatility/
        imbalance at `as_of` for one symbol; rejects future as_of."""
        # one symbol → one partition: SinglePartition satisfies every
        # window/agg distribution below, so no pipeline shuffles at all
        t = self.trades().filter(F.col("symbol") == symbol).coalesce(1)
        ohlc = self.feature("ohlc_1m").filter(F.col("symbol") == symbol).select(
            "symbol",
            "bucket",
            F.col("open").alias("ohlc_open"),
            F.col("high").alias("ohlc_high"),
            F.col("low").alias("ohlc_low"),
            F.col("close").alias("ohlc_close"),
            F.col("volume").alias("ohlc_volume"),
        )
        from .functions import features as FX

        return ASOF.pit_snapshot(
            self.spark,
            {
                "ohlc": (ohlc, "bucket", ["ohlc_open", "ohlc_high", "ohlc_low", "ohlc_close", "ohlc_volume"]),
                "sma": (FX.sma(t, 20), "time", ["sma_20"]),
                "vwap": (
                    FX.vwap(t, 300).select("symbol", "bucket", F.col("vwap").alias("vwap_5m")),
                    "bucket",
                    ["vwap_5m"],
                ),
                "vol": (
                    FX.volatility(t, 3600).select(
                        "symbol", "bucket", F.col("volatility").alias("volatility_1h")
                    ),
                    "bucket",
                    ["volatility_1h"],
                ),
                "imb": (
                    FX.trade_imbalance(t, 300).select(
                        "symbol", "bucket", F.col("trade_imbalance").alias("trade_imbalance_5m")
                    ),
                    "bucket",
                    ["trade_imbalance_5m"],
                ),
            },
            symbol=symbol,
            as_of=as_of,
            now=now,
            tiebreak_cols={"sma": ["trade_id"]},
        )

    def get_historical_features(
        self,
        entity: DataFrame,
        feature_names: list[str] | None = None,
        ttl_seconds: float | None = None,
    ) -> DataFrame:
        """Vectorized Feast-style PIT retrieval (J2) — one shuffle for
        all requested feature views."""
        names = feature_names or ["ohlc_1m", "vwap_5m"]
        views: dict[str, tuple[DataFrame, str]] = {}
        for n in names:
            spec = REG.get_feature(n)
            fdf = self.feature(n)
            vals = [
                c for c in fdf.columns if c not in ("symbol", spec.time_column)
            ]
            views[n] = (
                fdf.select(
                    "symbol",
                    spec.time_column,
                    *[F.col(c).alias(f"{n}__{c}") for c in vals],
                ),
                spec.time_column,
            )
        return ASOF.get_historical_features(
            entity, views, ttl_seconds=ttl_seconds
        )

    def online_store(self, feature_names: list[str] | None = None):
        """Materialize the online serving plane (SURVEY §4/§7.6): one
        cached wide row of latest feature values per symbol. Warm
        `get_online_features` reads are the Spark analog of the Redis
        online store (<100 ms warm; measured separately from cold-job
        latency per BASELINE.md)."""
        from .serving import OnlineFeatureStore

        names = feature_names or ["ohlc_1m", "vwap_5m", "trade_imbalance_5m"]
        views: dict[str, tuple[DataFrame, str, list[str]]] = {}
        for n in names:
            spec = REG.get_feature(n)
            fdf = self.feature(n)
            vals = [c for c in fdf.columns if c not in ("symbol", spec.time_column)]
            views[n] = (
                fdf.select(
                    "symbol",
                    spec.time_column,
                    *[F.col(c).alias(f"{n}__{c}") for c in vals],
                ),
                spec.time_column,
                [f"{n}__{c}" for c in vals],
            )
        store = OnlineFeatureStore(self.spark)
        store.materialize(views)
        self._online_store = store
        return store

    def get_online_features(self, symbols: list[str] | None = None) -> DataFrame:
        """Point lookup against the materialized online store
        (`online_store()` is built on first use)."""
        store = getattr(self, "_online_store", None)
        if store is None:
            store = self.online_store()
        return store.get(symbols)

    # -- SQL surface --------------------------------------------------
    def register_sql_views(self) -> None:
        self.trades().createOrReplaceTempView("trades")
        for spec in REG.all_features():
            self.feature(spec.name).createOrReplaceTempView(spec.name)

    # -- quality ------------------------------------------------------
    def dq_report(self) -> DataFrame:
        return QX.dq_score(self.trades(), self.feature("ohlc_1m"))

    def freshness_report(self, now=None) -> DataFrame:
        rows = None
        for spec in REG.all_features():
            r = QX.freshness(self.feature(spec.name), spec.time_column, now=now).select(
                F.lit(spec.name).alias("feature_name"),
                "latest_ts",
                "age_seconds",
                F.lit(spec.sla_seconds).alias("sla_seconds"),
            )
            rows = r if rows is None else rows.unionByName(r)
        return rows.withColumn("within_sla", F.col("age_seconds") <= F.col("sla_seconds"))
