"""Salted aggregation / join: output-equivalence to unsalted forms on
a deliberately skewed dataset (one key carries ~90% of rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.operators import skew as SK


def _skewed_df(spark):
    hot = spark.range(9000).select(
        F.lit("HOT").alias("k"), (F.col("id") % 100).cast("double").alias("v"), F.col("id")
    )
    cold = spark.range(1000).select(
        F.concat(F.lit("C"), (F.col("id") % 7).cast("string")).alias("k"),
        (F.col("id") % 50).cast("double").alias("v"),
        (F.col("id") + 100000).alias("id"),
    )
    return hot.unionByName(cold)


def test_salted_aggregate_equals_plain(spark):
    df = _skewed_df(spark)
    plain = {
        r["k"]: (r["s"], r["n"], r["a"], r["mx"], r["mn"])
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count(F.lit(1)).alias("n"),
            F.avg("v").alias("a"),
            F.max("v").alias("mx"),
            F.min("v").alias("mn"),
        )
        .collect()
    }
    salted = {
        r["k"]: (r["sum_v"], r["n_rows"], r["avg_v"], r["max_v"], r["min_v"])
        for r in SK.salted_aggregate(
            df, ["k"], sums=["v"], avgs=["v"], maxs=["v"], mins=["v"],
            n_salts=16, salt_on="id",
        ).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        ps, pn, pa, pmx, pmn = plain[k]
        ss, sn, sa, smx, smn = salted[k]
        assert pn == sn and pmx == smx and pmn == smn
        assert abs(ps - ss) < 1e-6 and abs(pa - sa) < 1e-9


def test_salted_join_equals_plain(spark):
    fact = _skewed_df(spark)
    dim = spark.createDataFrame(
        [("HOT", "hot meta")] + [(f"C{i}", f"cold {i}") for i in range(7)],
        "k string, meta string",
    )
    plain = sorted(
        map(tuple, fact.join(dim, "k").select("k", "id", "meta").collect())
    )
    salted = sorted(
        map(
            tuple,
            SK.salted_join(fact, dim, "k", n_salts=8, fact_salt_on="id")
            .select("k", "id", "meta")
            .collect(),
        )
    )
    assert plain == salted


def test_salted_join_left_keeps_unmatched(spark):
    fact = _skewed_df(spark)
    dim = spark.createDataFrame([("HOT", "hot meta")], "k string, meta string")
    out = SK.salted_join(fact, dim, "k", n_salts=4, fact_salt_on="id", how="left")
    assert out.count() == fact.count()
    assert out.filter(F.col("meta").isNull()).count() == 1000
