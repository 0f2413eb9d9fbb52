"""Direct unit tests of the vectorized CEP handler functions
(streaming/cep.py) — no Spark session: the functions take plain pandas
batches plus a GroupState-shaped object, so the r10 batch-assembly
rewrite's edge cases are pinned at the exact seams where the
vectorization could have drifted from the old per-row form:

- NaN volumes must still flow through the large-trade guard
  (``~(v <= thr)``, not ``v > thr``);
- the Lee-Ready tick direction must carry through zero-tick batches and
  across state, and the quote rule must win over the tick rule;
- window-edge pruning must use the exact pandas ``Timestamp.timestamp()``
  rounding (``round(ns/1e9, 6)``);
- state tuples must round-trip across calls (the cross-batch carry).
"""

from __future__ import annotations

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


def _trades(rows):
    df = pd.DataFrame(
        rows,
        columns=["time", "symbol", "trade_id", "price", "volume", "bid", "ask"],
    )
    df["time"] = pd.to_datetime(df["time"])
    return df


def _run(fn, pdf, state=None):
    st = state or FakeState()
    out = pd.concat(list(fn(("S",), iter([pdf]), st)), ignore_index=True)
    return out, st


def test_large_trade_nan_volume_flows_through_guard():
    # NaN <= thr is False, so the old `continue` let NaN rows into the
    # buffer; the vectorized mask must too.
    pdf = _trades(
        [
            ("2024-01-01 00:00:00", "S", "t1", 1.0, 100.0, None, None),
            ("2024-01-01 00:00:01", "S", "t2", 1.0, np.nan, None, None),
            ("2024-01-01 00:00:02", "S", "t3", 1.0, 100.0, None, None),
        ]
    )
    fn = cep._large_trade_fn(threshold=50.0, window_sec=300.0, min_count=3)
    out, st = _run(fn, pdf)
    assert len(out) == 1  # the NaN row counts toward min_count
    assert out["n_large_trades"].iloc[0] == 3
    assert st.get[2] == ["t1", "t2", "t3"]


def test_large_trade_window_edge_prune_exact():
    # gap of exactly window_sec: ts[0] < t - w is FALSE (kept) — the
    # vectorized prune must use the same rounded-second arithmetic.
    fn = cep._large_trade_fn(threshold=0.0, window_sec=10.0, min_count=2)
    pdf = _trades(
        [
            ("2024-01-01 00:00:00.000000", "S", "a", 1.0, 5.0, None, None),
            ("2024-01-01 00:00:10.000000", "S", "b", 1.0, 5.0, None, None),
            ("2024-01-01 00:00:20.000001", "S", "c", 1.0, 5.0, None, None),
        ]
    )
    out, st = _run(fn, pdf)
    # row b: a is exactly 10s older -> kept -> anomaly of 2
    # row c: b is 10.000001s older -> pruned -> buffer is [c] only
    assert out["trade_ids"].tolist() == [["a", "b"]]
    assert st.get[2] == ["c"]


def test_lee_ready_zero_tick_carry_and_state():
    fn = cep._lee_ready_fn()
    b1 = _trades(
        [
            ("2024-01-01 00:00:00", "S", "a", 10.0, 1.0, None, None),
            ("2024-01-01 00:00:01", "S", "b", 11.0, 1.0, None, None),
        ]
    )
    out1, st = _run(fn, b1)
    # a: no history at all -> None; b: uptick -> buy
    assert out1["cls"].tolist() == [None, "buy"]
    # batch 2 is ALL zero ticks: direction must carry from state (+1)
    b2 = _trades(
        [
            ("2024-01-01 00:00:02", "S", "c", 11.0, 1.0, None, None),
            ("2024-01-01 00:00:03", "S", "d", 11.0, 1.0, None, None),
        ]
    )
    out2, st = _run(fn, b2, st)
    assert out2["cls"].tolist() == ["buy", "buy"]
    assert st.get[2] == 1  # carried tick direction survives in state


def test_lee_ready_quote_rule_beats_tick_rule():
    fn = cep._lee_ready_fn()
    pdf = _trades(
        [
            # quotes on row 1 set mid=10.5 for row 2's quote rule
            ("2024-01-01 00:00:00", "S", "a", 11.0, 1.0, 10.0, 11.0),
            # price 10.0 < prev mid 10.5 -> SELL even though the tick
            # rule alone says downtick-sell too; flip mid to prove the
            # quote rule dominates:
            ("2024-01-01 00:00:01", "S", "b", 10.0, 1.0, 9.0, 9.5),
            # price 10.2 > prev mid 9.25 -> BUY although tick is +1 too
            ("2024-01-01 00:00:02", "S", "c", 10.2, 1.0, None, None),
            # prev row had no quotes -> mid None -> tick rule: uptick buy
            ("2024-01-01 00:00:03", "S", "d", 10.2, 1.0, None, None),
        ]
    )
    out, st = _run(fn, pdf)
    assert out["cls"].tolist() == [None, "sell", "buy", "buy"]
    # state: last_mid None (row d had no quotes), tickdir +1
    assert st.get[1] is None and st.get[2] == 1


def test_gap_monitor_first_row_uses_state_not_self():
    fn = cep._gap_monitor_fn(threshold_sec=60.0)
    b1 = _trades([("2024-01-01 00:00:00", "S", "a", 1.0, 1.0, None, None)])
    out1, st = _run(fn, b1)
    assert len(out1) == 0
    b2 = _trades([("2024-01-01 00:02:00", "S", "b", 1.0, 1.0, None, None)])
    out2, st = _run(fn, b2, st)
    assert len(out2) == 1
    assert out2["gap_seconds"].iloc[0] == 120.0
    assert out2["gap_start"].iloc[0] == pd.Timestamp("2024-01-01 00:00:00")


def test_row_features_sma_buffer_carries_across_batches():
    fn = cep._row_features_fn(3, 0.5)
    b1 = _trades(
        [
            ("2024-01-01 00:00:00", "S", "a", 1.0, 1.0, None, None),
            ("2024-01-01 00:00:01", "S", "b", 2.0, 1.0, None, None),
        ]
    )
    out1, st = _run(fn, b1)
    assert out1["sma_20"].tolist() == [1.0, 1.5]
    b2 = _trades([("2024-01-01 00:00:02", "S", "c", 3.0, 1.0, None, None)])
    out2, st = _run(fn, b2, st)
    assert out2["sma_20"].tolist() == [2.0]  # (1+2+3)/3 across batches
    assert out2["regime_tag"].tolist() == ["up"]
    assert st.get[0] == [1.0, 2.0, 3.0]


def test_volatility_bucket_boundary_and_carry():
    fn = cep._volatility_fn(60)
    b1 = _trades(
        [
            ("2024-01-01 00:00:10", "S", "a", 100.0, 1.0, None, None),
            ("2024-01-01 00:00:50", "S", "b", 101.0, 1.0, None, None),
            # next minute -> finalizes the first bucket
            ("2024-01-01 00:01:10", "S", "c", 102.0, 1.0, None, None),
        ]
    )
    out1, st = _run(fn, b1)
    assert len(out1) == 1
    assert out1["sample_count"].iloc[0] == 2
    assert out1["bucket"].iloc[0] == pd.Timestamp("2024-01-01 00:00:00")
    # carry: the open minute's return used the PRIOR minute's last price
    assert st.get[1] == int(pd.Timestamp("2024-01-01 00:01:00").timestamp()) // 60
