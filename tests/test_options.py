"""Black–Scholes plane (functions/options.py): the A&S erf
approximation against math.erf, pricing against an exact-erf reference,
put-call parity, and greek sanity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.functions import options as OPT


def _bs_exact(s, k, r, sigma, t):
    d1 = (math.log(s / k) + (r + sigma * sigma / 2) * t) / (sigma * math.sqrt(t))
    d2 = d1 - sigma * math.sqrt(t)
    nd = lambda x: 0.5 * (1 + math.erf(x / math.sqrt(2)))
    call = s * nd(d1) - k * math.exp(-r * t) * nd(d2)
    return call, nd(d1)


def test_erf_approx_max_error(spark):
    xs = [i / 100.0 for i in range(-400, 401)]
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    got = df.select("x", OPT.erf_approx(F.col("x")).alias("e")).collect()
    worst = max(abs(r["e"] - math.erf(r["x"])) for r in got)
    assert worst < 1.5e-7  # the A&S 7.1.26 bound


def test_bs_price_matches_exact_erf_reference(spark):
    cases = [
        (100.0, 90.0, 0.02, 0.2, 0.25),
        (100.0, 100.0, 0.05, 0.4, 1.0),
        (50.0, 65.0, 0.0, 0.8, 0.5),
        (500.0, 450.0, 0.03, 0.15, 2.0),
    ]
    df = spark.createDataFrame(cases, "s double, k double, r double, sigma double, t double")
    cols = OPT.bs_columns(F.col("s"), F.col("k"), F.col("r"), F.col("sigma"), F.col("t"))
    got = df.select("*", *[c.alias(n) for n, c in cols.items()]).collect()
    for row in got:
        call, delta = _bs_exact(row["s"], row["k"], row["r"], row["sigma"], row["t"])
        assert abs(row["call_price"] - call) < 1e-4
        assert abs(row["delta_call"] - delta) < 1e-6
        # put-call parity holds exactly by construction
        parity = row["call_price"] - row["put_price"]
        assert abs(parity - (row["s"] - row["k"] * math.exp(-row["r"] * row["t"]))) < 1e-9
        assert row["gamma"] > 0 and row["vega"] > 0
        assert 0.0 < row["delta_call"] < 1.0


def test_bs_monotone_in_strike(spark):
    ks = [(80.0 + 5 * i,) for i in range(9)]
    df = spark.createDataFrame(ks, "k double")
    cols = OPT.bs_columns(F.lit(100.0), F.col("k"), F.lit(0.02), F.lit(0.3), F.lit(0.5))
    got = [r["c"] for r in df.select(cols["call_price"].alias("c")).orderBy("k").collect()]
    assert all(a > b for a, b in zip(got, got[1:]))  # calls fall as K rises


def test_implied_vol_newton_recovers_sigma(spark):
    """4 unrolled Newton steps recover the generating volatility to
    machine precision across a moneyness/vol sweep (exact-erf reference
    prices as targets keep the solver honest about model error)."""
    import math

    from pyspark.sql import functions as F

    cases = []
    for sig in (0.15, 0.3, 0.6, 0.9, 1.2):
        for k in (45.0, 50.0, 55.0):
            call, _ = _bs_exact(50.0, k, 0.02, sig, 0.25)
            cases.append((50.0, k, 0.02, 0.25, call, sig))
    df = spark.createDataFrame(
        cases, "s double, k double, r double, t double, target double, sig double"
    ).withColumn("iv0", F.lit(0.5))
    for i in range(8):
        step = OPT.bs_columns(
            F.col("s"), F.col("k"), F.col("r"), F.col(f"iv{i}"), F.col("t")
        )
        df = df.withColumn(
            f"iv{i + 1}",
            F.col(f"iv{i}")
            - (step["call_price"] - F.col("target")) / step["vega"],
        )
    for row in df.collect():
        # the A&S erf bound (1.5e-7) is the only residual vs exact erf
        assert abs(row["iv8"] - row["sig"]) < 5e-6, (row["sig"], row["k"])
        # converged: one more step moves nothing
        assert abs(row["iv7"] - row["iv8"]) < 1e-8
