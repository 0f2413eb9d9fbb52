"""Stateful streaming per-key quantile — SURVEY §7 hard part 5.

The reference's streaming large-trade detector hardcodes its volume
threshold (/root/reference/flink-jobs/market-realtime/
enhanced_anomaly_detection.py:126-130 — ``10000.0``) and the real
per-symbol p95 only exists in the batch plane (A6). This closes the gap
Spark-first: per-symbol ``GroupState`` holds a **bounded deterministic
sample** of volumes; each micro-batch merges its rows into the sample,
recomputes the quantile estimate, and emits flags against it.

Sampling: keep the ``k`` rows whose md5(trade_id) is smallest — hash
order is a uniform pseudo-random permutation, so the kept set is a
uniform sample of everything seen, yet fully DETERMINISTIC across
micro-batch replays (exactly-once friendly: a replayed batch re-derives
the identical state, unlike an RNG reservoir). While total rows ≤ k the
estimate is EXACT.

Scale: state is O(k) per symbol (k·16 bytes — 1024 ⇒ ~16 KB); merge is
O(batch + k log k) per key per batch; keys partition across executors
exactly like Flink keyed streams.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FLAG_SCHEMA = (
    "time timestamp, symbol string, trade_id string, volume double, "
    "p95_estimate double, large_trade_flag boolean, n_seen long"
)
_STATE_SCHEMA = "hashes array<long>, vols array<double>, n_seen long"


def _h(trade_id: str) -> int:
    # stable 63-bit key from md5 — NOT Python hash() (salted per process)
    return int.from_bytes(hashlib.md5(trade_id.encode()).digest()[:8], "big") >> 1


def _quantile_fn(q: float, k: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            hashes, vols, n_seen = state.get
            hashes, vols = list(hashes), list(vols)
        else:
            hashes, vols, n_seen = [], [], 0
        rows = pd.concat(list(pdfs)).sort_values(["time", "trade_id"])
        for r in rows.itertuples():
            hashes.append(_h(str(r.trade_id)))
            vols.append(float(r.volume))
        n_seen += len(rows)
        if len(hashes) > k:
            order = np.argsort(np.array(hashes))[:k]
            hashes = [hashes[i] for i in order]
            vols = [vols[i] for i in order]
        est = float(np.percentile(np.array(vols), q * 100.0)) if vols else float("nan")
        state.update((hashes, vols, n_seen))
        out = rows[["time", "symbol", "trade_id", "volume"]].copy()
        out["p95_estimate"] = est
        out["large_trade_flag"] = out["volume"] > est
        out["n_seen"] = n_seen
        yield out

    return fn


def streaming_quantile_flags(
    trades: DataFrame, q: float = 0.95, sample_size: int = 1024
) -> DataFrame:
    """A6 in streaming form: flag trades whose volume exceeds the
    per-symbol running q-quantile estimate (flags within a batch use
    the estimate updated through that batch — the streaming analog of
    the batch recompute)."""
    return trades.select("time", "symbol", "volume", "trade_id").groupBy(
        "symbol"
    ).applyInPandasWithState(
        _quantile_fn(q, sample_size),
        outputStructType=FLAG_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
