"""Property tests for the session-3 diagnostics/sketch queries (value
parity vs DuckDB is covered by test_oracle_parity; these pin the
mathematical contracts)."""

from __future__ import annotations

import __spark_entry__ as em
from tests.conftest import SF_SMOKE


def test_countmin_never_underestimates(spark):
    # the CMS guarantee: est >= exact for EVERY probed key
    rows = em.QUERIES["countmin_heavy_hitters"](spark, SF_SMOKE).collect()
    assert rows
    assert all(r.overestimate >= 0 for r in rows)
    assert all(r.cms_est >= r.exact_n for r in rows)


def test_kaplan_meier_monotone_nonincreasing(spark):
    rows = (
        em.QUERIES["kaplan_meier_sessions"](spark, SF_SMOKE)
        .orderBy("duration_sec")
        .collect()
    )
    assert rows
    surv = [r.km_survival for r in rows]
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert all(a >= b - 1e-9 for a, b in zip(surv, surv[1:]))
    # at-risk counts strictly decrease along the grid
    n = [r.n_at_risk for r in rows]
    assert all(a > b for a, b in zip(n, n[1:]))


def test_ab_test_totals_consistent(spark):
    r = em.QUERIES["ab_test_conversion"](spark, SF_SMOKE).collect()[0]
    assert r.conv_a <= r.n_a and r.conv_b <= r.n_b
    assert abs((r.p_b - r.p_a) - r.abs_lift) < 1e-6


def test_market_basket_lift_bounds(spark):
    rows = em.QUERIES["market_basket_lift"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.support <= 1.0
        assert 0.0 < r.confidence <= 1.0
        assert r.lift > 0.0


def test_tick_rule_accuracy_beats_coin_flip(spark):
    # the tick test is materially informative on a real tape
    rows = em.QUERIES["tick_rule_sides"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.n_inferred >= r.n_comparable
        assert 0.0 <= r.accuracy <= 1.0


def test_pagerank_sums_to_one(spark):
    rows = em.QUERIES["pagerank_event_types"](spark, SF_SMOKE).collect()
    total = sum(r.pagerank for r in rows)
    assert abs(total - 1.0) < 1e-3
    assert all(r.pagerank > 0 for r in rows)


def test_weighted_sample_rate_tracks_weights(spark):
    rows = em.QUERIES["weighted_doc_sample"](spark, SF_SMOKE).collect()
    kept = sum(1 for r in rows if r.kept)
    mean_w = sum(r.weight for r in rows) / len(rows)
    # deterministic hash ~ uniform: keep rate within 10pp of mean weight
    assert abs(kept / len(rows) - mean_w) < 0.10
