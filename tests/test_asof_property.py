"""Property-based as-of join testing (hypothesis): for arbitrary
feature/probe sets, the vectorized union-and-window as-of join must
agree with a direct per-probe Python computation — including duplicate
timestamps, probes before any feature, multiple keys, and TTL masking.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from open_source_financial_time_series_data_pipeline_architecture_spark.operators import (
    asof_join,
)

BASE = dt.datetime(2024, 1, 1)

keys = st.sampled_from(["A", "B", "C"])
offsets = st.integers(min_value=0, max_value=500)

feature_rows = st.lists(
    st.tuples(keys, offsets, st.integers(min_value=0, max_value=10**6)),
    min_size=0,
    max_size=25,
)
probe_rows = st.lists(st.tuples(keys, offsets), min_size=1, max_size=15)


def _expected(feats, probes, ttl=None):
    out = []
    for k, p in probes:
        cands = [
            (ts, v)
            for (fk, ts, v) in feats
            if fk == k and ts <= p and (ttl is None or ts >= p - ttl)
        ]
        if cands:
            best_ts = max(ts for ts, _ in cands)
            # duplicates on (key, ts): any of the tied values is a valid
            # answer — collect the set
            out.append((k, p, {v for ts, v in cands if ts == best_ts}))
        else:
            out.append((k, p, {None}))
    return out


@settings(max_examples=12, deadline=None)
@given(feature_rows, probe_rows)
def test_asof_matches_reference_computation(spark, feats, probes):
    fdf = spark.createDataFrame(
        [(k, BASE + dt.timedelta(seconds=ts), float(v)) for k, ts, v in feats]
        or [("Z", BASE, 0.0)],
        "symbol string, time timestamp, v double",
    )
    if not feats:
        fdf = fdf.filter("symbol = 'NOPE'")
    pdf = spark.createDataFrame(
        [(k, BASE + dt.timedelta(seconds=p)) for k, p in probes],
        "symbol string, event_timestamp timestamp",
    )
    got = asof_join(pdf, fdf, entity_time="event_timestamp", feature_time="time").collect()
    exp = _expected(feats, probes)
    # compare as multisets keyed by (symbol, probe_ts)
    got_m: dict = {}
    for r in got:
        got_m.setdefault(
            (r["symbol"], int((r["event_timestamp"] - BASE).total_seconds())), []
        ).append(r["v"])
    for k, p, allowed in exp:
        vals = got_m[(k, p)]
        assert any(v in allowed for v in vals), (k, p, vals, allowed)


@settings(max_examples=8, deadline=None)
@given(feature_rows, probe_rows, st.integers(min_value=1, max_value=200))
def test_asof_ttl_property(spark, feats, probes, ttl):
    if not feats:
        return
    fdf = spark.createDataFrame(
        [(k, BASE + dt.timedelta(seconds=ts), float(v)) for k, ts, v in feats],
        "symbol string, time timestamp, v double",
    )
    pdf = spark.createDataFrame(
        [(k, BASE + dt.timedelta(seconds=p)) for k, p in probes],
        "symbol string, event_timestamp timestamp",
    )
    got = asof_join(
        pdf, fdf, entity_time="event_timestamp", feature_time="time",
        ttl_seconds=float(ttl),
    ).collect()
    for r in got:
        p = int((r["event_timestamp"] - BASE).total_seconds())
        k = r["symbol"]
        # TTL semantics: the carried value is the LATEST row ≤ p; it is
        # masked to NULL iff that row is older than p − ttl.
        cands = [(ts, v) for (fk, ts, v) in feats if fk == k and ts <= p]
        if not cands:
            assert r["v"] is None
            continue
        best_ts = max(ts for ts, _ in cands)
        if best_ts < p - ttl:
            assert r["v"] is None, (k, p, r["v"])
        else:
            assert r["v"] in {v for ts, v in cands if ts == best_ts}


def _expected_forward(feats, probes, ttl=None):
    out = []
    for k, p in probes:
        cands = [
            (ts, v)
            for (fk, ts, v) in feats
            if fk == k and ts >= p and (ttl is None or ts <= p + ttl)
        ]
        if cands:
            best_ts = min(ts for ts, _ in cands)
            out.append((k, p, {v for ts, v in cands if ts == best_ts}))
        else:
            out.append((k, p, {None}))
    return out


@settings(max_examples=12, deadline=None)
@given(feature_rows, probe_rows)
def test_asof_forward_matches_reference_computation(spark, feats, probes):
    fdf = spark.createDataFrame(
        [(k, BASE + dt.timedelta(seconds=ts), float(v)) for k, ts, v in feats]
        or [("Z", BASE, 0.0)],
        "symbol string, time timestamp, v double",
    )
    if not feats:
        fdf = fdf.filter("symbol = 'NOPE'")
    pdf = spark.createDataFrame(
        [(k, BASE + dt.timedelta(seconds=p)) for k, p in probes],
        "symbol string, event_timestamp timestamp",
    )
    got = asof_join(
        pdf, fdf, entity_time="event_timestamp", feature_time="time",
        direction="forward",
    ).collect()
    exp = _expected_forward(feats, probes)
    got_m: dict = {}
    for r in got:
        got_m.setdefault(
            (r["symbol"], int((r["event_timestamp"] - BASE).total_seconds())), []
        ).append(r["v"])
    for k, p, allowed in exp:
        vals = got_m[(k, p)]
        assert any(v in allowed for v in vals), (k, p, vals, allowed)


@settings(max_examples=8, deadline=None)
@given(feature_rows, probe_rows, st.integers(min_value=1, max_value=200))
def test_asof_forward_ttl_property(spark, feats, probes, ttl):
    if not feats:
        return
    fdf = spark.createDataFrame(
        [(k, BASE + dt.timedelta(seconds=ts), float(v)) for k, ts, v in feats],
        "symbol string, time timestamp, v double",
    )
    pdf = spark.createDataFrame(
        [(k, BASE + dt.timedelta(seconds=p)) for k, p in probes],
        "symbol string, event_timestamp timestamp",
    )
    got = asof_join(
        pdf, fdf, entity_time="event_timestamp", feature_time="time",
        ttl_seconds=float(ttl), direction="forward",
    ).collect()
    for r in got:
        p = int((r["event_timestamp"] - BASE).total_seconds())
        k = r["symbol"]
        # forward TTL: the carried value is the EARLIEST row >= p; masked
        # to NULL iff that row is further than p + ttl in the future.
        cands = [(ts, v) for (fk, ts, v) in feats if fk == k and ts >= p]
        if not cands:
            assert r["v"] is None
            continue
        best_ts = min(ts for ts, _ in cands)
        if best_ts > p + ttl:
            assert r["v"] is None, (k, p, r["v"])
        else:
            assert r["v"] in {v for ts, v in cands if ts == best_ts}


def test_asof_forward_tiebreak_deterministic(spark):
    # equal-timestamp feature rows resolve to the largest tiebreak in the
    # forward direction too (same max_by convention as backward)
    t1 = BASE + dt.timedelta(seconds=10)
    feat = spark.createDataFrame(
        [("A", t1, 1.0, "first"), ("A", t1, 2.0, "second")],
        "symbol string, time timestamp, px double, src string",
    )
    probe = spark.createDataFrame(
        [("A", BASE)], "symbol string, event_timestamp timestamp"
    )
    for _ in range(3):
        out = asof_join(
            probe.repartition(4),
            feat.repartition(4),
            values=["px", "src"],
            tiebreak_cols=["src"],
            direction="forward",
        ).collect()
        assert len(out) == 1
        assert out[0]["src"] == "second" and out[0]["px"] == 2.0


def test_asof_direction_validation(spark):
    import pytest

    df = spark.range(1).selectExpr(
        "'A' AS symbol", "timestamp'2024-01-01' AS time", "1.0 AS v"
    )
    probe = df.selectExpr("symbol", "time AS event_timestamp")
    with pytest.raises(ValueError, match="backward|forward"):
        asof_join(probe, df, direction="sideways")


def test_asof_join_tiebreak_deterministic(spark):
    # two feature rows share (key, timestamp); tiebreak_cols resolves the
    # carry deterministically (the row sorting last in tiebreak order is
    # the one carried to the probe), stable across partitionings/reruns
    t0 = BASE
    feat = spark.createDataFrame(
        [("A", t0, 1.0, "first"), ("A", t0, 2.0, "second")],
        "symbol string, time timestamp, px double, src string",
    )
    probe = spark.createDataFrame(
        [("A", t0 + dt.timedelta(seconds=1))],
        "symbol string, event_timestamp timestamp",
    )
    for _ in range(3):
        out = asof_join(
            probe.repartition(4),
            feat.repartition(4),
            values=["px", "src"],
            tiebreak_cols=["src"],
        ).collect()
        assert len(out) == 1
        assert out[0]["src"] == "second" and out[0]["px"] == 2.0
