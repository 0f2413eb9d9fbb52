"""Governance shims (V1-V3) + schema-compat checker (F8) + multimodal
plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from open_source_financial_time_series_data_pipeline_architecture_spark.functions import (
    governance as GOV,
)
from open_source_financial_time_series_data_pipeline_architecture_spark.functions import (
    schema_compat as SC,
)
from open_source_financial_time_series_data_pipeline_architecture_spark.operators import (
    multimodal as MM,
)
from open_source_financial_time_series_data_pipeline_architecture_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_tenant_view_filters_and_pushes_down(spark):
    cust = load_table(spark, SF_SMOKE, "customer")
    view = GOV.tenant_view(cust, "c_nationkey", [1, 2])
    got = view.select("c_nationkey").distinct().collect()
    assert {r[0] for r in got} <= {1, 2}
    # the tenant predicate must reach the parquet scan
    plan = view._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "c_nationkey" in plan


def test_rls_sql_view(spark):
    load_table(spark, SF_SMOKE, "customer").createOrReplaceTempView("customer_all")
    GOV.register_tenant_view(spark, "customer_all", "customer_t1", "c_nationkey", [3])
    got = spark.sql("SELECT DISTINCT c_nationkey FROM customer_t1").collect()
    assert all(r[0] == 3 for r in got)


def test_audit_append_only(spark, tmp_path):
    d = str(tmp_path / "audit")
    GOV.append_audit(GOV.audit_entry(spark, "alice", "read", "trades"), d)
    GOV.append_audit(GOV.audit_entry(spark, "bob", "write", "ohlc_1m"), d)
    got = spark.read.parquet(d)
    assert got.count() == 2
    assert {r["actor"] for r in got.collect()} == {"alice", "bob"}


def test_aes_roundtrip(spark):
    df = spark.createDataFrame([("s-1", "secret-A"), ("s-2", "secret-B")], "id string, v string")
    key = "0123456789abcdef"  # 16-byte AES-128 key
    enc = GOV.encrypt_column(df, "v", key)
    assert enc.filter(F.col("v").cast("string") == "secret-A").count() == 0
    dec = GOV.decrypt_column(enc, "v", key)
    assert sorted(r["v"] for r in dec.collect()) == ["secret-A", "secret-B"]


def test_schema_compat_backward_forward():
    old = T.StructType(
        [
            T.StructField("time", T.LongType(), False),
            T.StructField("symbol", T.StringType(), False),
            T.StructField("price", T.FloatType(), False),
        ]
    )
    # add nullable field + widen float→double: backward OK
    new_ok = T.StructType(
        [
            T.StructField("time", T.LongType(), False),
            T.StructField("symbol", T.StringType(), False),
            T.StructField("price", T.DoubleType(), False),
            T.StructField("venue", T.StringType(), True),
        ]
    )
    assert SC.check_backward(old, new_ok).compatible
    # forward: the float→double widening is NOT forward-compatible (an
    # old float reader cannot read doubles), while a pure nullable-add is
    assert not SC.check_forward(old, new_ok).compatible
    add_only = T.StructType(old.fields + [T.StructField("venue", T.StringType(), True)])
    assert SC.check_forward(old, add_only).compatible

    # add REQUIRED field without default: backward-incompatible
    new_required = T.StructType(
        old.fields + [T.StructField("venue", T.StringType(), False)]
    )
    rep = SC.check_backward(old, new_required)
    assert not rep.compatible and "venue" in rep.errors[0]

    # remove a required field: forward-incompatible
    new_removed = T.StructType([f for f in old.fields if f.name != "price"])
    rep = SC.check_forward(old, new_removed)
    assert not rep.compatible and "price" in rep.errors[0]

    # narrowing double→int: both directions fail
    narrowed = T.StructType(
        [
            T.StructField("time", T.IntegerType(), False),
            T.StructField("symbol", T.StringType(), False),
            T.StructField("price", T.FloatType(), False),
        ]
    )
    assert not SC.check_backward(old, narrowed).compatible


def test_multimodal_stub_features(spark):
    docs = MM.attach_binary_payload(load_table(spark, SF_SMOKE, "documents")).limit(20)
    feats = MM.extract_features(docs, dim=16)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(len(r["features"]) == 16 for r in rows)
    # deterministic: rerun produces identical vectors
    again = {r["doc_id"]: r["features"] for r in MM.extract_features(docs, dim=16).collect()}
    for r in rows:
        assert again[r["doc_id"]] == r["features"]
        assert r["n_bytes"] > 0
    # decode is real for every dominant format since r5 (JPEG closed
    # the set); only the learned feature ENCODER remains out of scope,
    # and the error says where the real decode paths live
    with pytest.raises(ValueError, match="decode_jpeg"):
        MM.extract_features(docs, decoder="real")


def test_frame_sample_plan(spark):
    docs = MM.attach_binary_payload(
        load_table(spark, SF_SMOKE, "documents").limit(3)
    ).withColumn(
        "media_meta",
        F.struct(
            F.lit("video/fake").alias("media_type"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(3000).cast("long").alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ),
    )
    plan = MM.frame_sample_plan(docs, every_ms=1000)
    got = plan.groupBy("doc_id").count().collect()
    assert all(r["count"] == 3 for r in got)


def test_dp_release_mechanism_properties(spark):
    """The seeded Laplace mechanism: deterministic across runs, noise
    centered near zero with the right spread (empirical |noise| mean ≈
    scale over many independent seeds), and the clipped sum's exposure
    bounded by value_cap per row."""
    from pyspark.sql import functions as F

    from open_source_financial_time_series_data_pipeline_architecture_spark.functions import (
        governance as G,
    )

    # determinism + centering over 4000 independent seeds
    seeds = spark.range(0, 4000).select(
        F.concat(F.lit("s-"), F.col("id")).alias("seed")
    )
    noise = seeds.select(G.dp_laplace_noise(F.col("seed"), 2.0).alias("x"))
    st = noise.agg(
        F.avg("x").alias("mu"),
        F.avg(F.abs(F.col("x"))).alias("mad"),
        F.max(F.abs(F.col("x"))).alias("mx"),
    ).first()
    assert abs(st["mu"]) < 0.25          # Laplace(2): sd ≈ 2.83, se ≈ .045
    assert 1.6 < st["mad"] < 2.4         # E|Laplace(b)| = b = 2
    assert st["mx"] < 60                 # tail guard: ln never blew up
    again = noise.agg(F.sum("x")).first()[0]
    assert again == noise.agg(F.sum("x")).first()[0]

    # clipping bounds the sum's per-row exposure regardless of outliers
    df = spark.createDataFrame(
        [("a", 1e9), ("a", -5.0), ("a", 50.0), ("b", 7.0)],
        "k string, v double",
    )
    rel = {r["k"]: r for r in G.dp_release(df, "k", "v", value_cap=100.0).collect()}
    assert rel["a"]["sum_clipped"] == 150.0  # 100 (capped) + 0 + 50
    assert rel["b"]["sum_clipped"] == 7.0
    assert rel["a"]["epsilon_count"] == 0.5
