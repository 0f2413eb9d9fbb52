"""PySpark-native financial time-series feature engine.

A from-scratch rebuild of the query & data-processing capabilities of the
reference pipeline (TimescaleDB + Flink + Kafka + Feast) on idiomatic
Spark: DataFrame/SQL for the logical plan, Catalyst/Tungsten/AQE for the
physical plan, Structured Streaming for the real-time path.

Subpackages
-----------
- ``session``    : SparkSession factory (AQE, Arrow, UTC, shuffle sizing)
- ``sources``    : table loaders, streaming sources, idempotent sinks
- ``functions``  : the 11-feature "Smart-DB" library, quality metrics,
                   text analysis, vector math
- ``operators``  : as-of/PIT joins, dedup family, similarity search,
                   multimodal plumbing
- ``streaming``  : watermarked aggregations and stateful CEP handlers
- ``serving``    : online latest-feature store (point-lookup plane)
- ``plans``      : explain/introspection helpers (pushdown & join checks)
"""

__version__ = "0.1.0"

from .api import Engine  # noqa: E402  (the user-facing facade)
from .serving import OnlineFeatureStore  # noqa: E402

__all__ = ["Engine", "OnlineFeatureStore"]
