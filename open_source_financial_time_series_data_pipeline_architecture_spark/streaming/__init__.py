from .jobs import (
    parse_trades_with_dlq,
    read_trade_stream_json,
    streaming_dedup,
    streaming_imbalance,
    streaming_ohlc,
    streaming_sessions,
    streaming_trade_quote_join,
    streaming_vwap,
)
from .cep import streaming_row_features, streaming_volatility
from .quantile import streaming_quantile_flags
from .twstate import top_trades_tracker

__all__ = [
    "parse_trades_with_dlq",
    "read_trade_stream_json",
    "streaming_dedup",
    "streaming_imbalance",
    "streaming_ohlc",
    "streaming_quantile_flags",
    "streaming_row_features",
    "streaming_sessions",
    "streaming_trade_quote_join",
    "streaming_volatility",
    "streaming_vwap",
    "top_trades_tracker",
]
