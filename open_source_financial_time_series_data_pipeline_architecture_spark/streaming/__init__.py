from .jobs import (
    parse_trades_with_dlq,
    read_trade_stream_json,
    streaming_dedup,
    streaming_ohlc,
    streaming_sessions,
    streaming_vwap,
)

__all__ = [
    "parse_trades_with_dlq",
    "read_trade_stream_json",
    "streaming_dedup",
    "streaming_ohlc",
    "streaming_sessions",
    "streaming_vwap",
]
