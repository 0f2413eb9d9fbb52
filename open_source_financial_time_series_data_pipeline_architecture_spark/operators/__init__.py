from .asof import asof_join, get_historical_features, latest_per_key, pit_snapshot

__all__ = [
    "asof_join",
    "get_historical_features",
    "latest_per_key",
    "pit_snapshot",
]
