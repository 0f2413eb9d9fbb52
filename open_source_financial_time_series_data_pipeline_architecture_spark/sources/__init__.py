from .producer import FileTradeProducer
from .sinks import foreach_batch_upsert, upsert_parquet
from .tables import (
    TABLES,
    load_table,
    register_views,
    write_bucketed,
    write_clustered,
    write_time_partitioned,
)

__all__ = [
    "TABLES",
    "FileTradeProducer",
    "foreach_batch_upsert",
    "load_table",
    "register_views",
    "upsert_parquet",
    "write_clustered",
    "write_time_partitioned",
]
