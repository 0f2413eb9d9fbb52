#!/usr/bin/env python
"""Isolated driver-side micro-benchmark of the stateful CEP handler
functions (streaming/cep.py) — the guide §4.2 "handler phase": call
each applyInPandasWithState function directly on a synthetic pandas
batch with a fake GroupState, so the number isolates the per-batch
Python work from the streaming machinery around it.

Usage: python scripts/profile_cep_handlers.py [n_rows] [reps]
Prints one JSON line {handler: best_sec} and (for parity checks) a
content hash of each handler's output.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import pandas as pd

from open_source_financial_time_series_data_pipeline_architecture_spark.streaming import (
    cep,
)


class FakeState:
    def __init__(self, value=None):
        self._v = value

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def synth_trades(n: int) -> pd.DataFrame:
    rng = np.random.RandomState(7)
    # microsecond-grain event times, mostly increasing with some
    # out-of-order arrivals and occasional >30 min gaps
    step_us = rng.randint(1, 2_000_000, size=n).astype("int64")
    step_us[rng.rand(n) < 0.001] = 2_000_000_000
    ts = np.cumsum(step_us) + 1_700_000_000_000_000
    price = np.round(100 + np.cumsum(rng.randn(n) * 0.1), 4)
    volume = np.abs(rng.lognormal(4, 1.5, n)).round(2)
    bid = price - 0.01
    ask = price + 0.01
    nan_mask = rng.rand(n) < 0.1
    bid[nan_mask] = np.nan
    ask[nan_mask] = np.nan
    return pd.DataFrame(
        {
            "time": pd.to_datetime(ts, unit="us"),
            "symbol": "SYN",
            "trade_id": [f"t{i:09d}" for i in range(n)],
            "price": price,
            "volume": volume,
            "bid": bid,
            "ask": ask,
        }
    )


def run(name, fn, pdf, reps):
    best = float("inf")
    out_hash = None
    for _ in range(reps):
        st = FakeState()
        t0 = time.perf_counter()
        out = pd.concat(list(fn(("SYN",), iter([pdf.copy()]), st)))
        best = min(best, time.perf_counter() - t0)
        h = hashlib.md5()
        h.update(out.to_csv(index=False).encode())
        h.update(repr(st.get).encode())
        out_hash = h.hexdigest()[:12]
    return best, out_hash


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    pdf = synth_trades(n)
    vol_thr = float(np.percentile(pdf["volume"], 97))
    handlers = {
        "large_trade": cep._large_trade_fn(vol_thr, 300.0, 3),
        "spread_ema": cep._spread_ema_fn(0.1, 1.001),
        "volatility": cep._volatility_fn(3600),
        "row_features": cep._row_features_fn(20, 2.0 / 13),
        "gap_monitor": cep._gap_monitor_fn(1800.0),
        "lee_ready": cep._lee_ready_fn(),
        "kalman": cep._kalman_fn(0.01, 1.0, 1.0),
    }
    res = {}
    hashes = {}
    for name, fn in handlers.items():
        sec, h = run(name, fn, pdf, reps)
        res[name] = round(sec, 4)
        hashes[name] = h
    print(json.dumps({"n_rows": n, "sec": res, "hash": hashes}))


if __name__ == "__main__":
    main()
