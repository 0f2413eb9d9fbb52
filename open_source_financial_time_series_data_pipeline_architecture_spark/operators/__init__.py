from .gapfill import gapfill_locf
from .asof import asof_join, get_historical_features, latest_per_key, pit_snapshot
from .rangejoin import interval_join_bucketed

__all__ = [
    "asof_join",
    "gapfill_locf",
    "get_historical_features",
    "interval_join_bucketed",
    "latest_per_key",
    "pit_snapshot",
]
