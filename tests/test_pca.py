"""Distributed PCA spectrum: moment-combine correctness invariants."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from open_source_financial_time_series_data_pipeline_architecture_spark.functions import (
    vector as VX,
)
from open_source_financial_time_series_data_pipeline_architecture_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_pca_matches_numpy_exact(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    got = VX.pca_variance(emb, top=5).collect()
    local = np.stack(
        [np.array(r["embedding"], dtype=float) for r in emb.collect()]
    )
    cov = np.cov(local, rowvar=False, bias=True)
    evals = np.linalg.eigvalsh(cov)[::-1]
    for r in got:
        assert abs(r["eigenvalue"] - evals[r["component"] - 1]) < 1e-4
    # spectrum invariants
    vals = [r["eigenvalue"] for r in got]
    assert vals == sorted(vals, reverse=True)
    assert all(v >= -1e-9 for v in vals)
    cums = [r["cum_explained"] for r in got]
    assert cums == sorted(cums)
    assert cums[-1] <= 1.0 + 1e-9


def test_pca_query_runs(spark):
    df = entry_mod.queries()["embedding_pca_variance"](spark, SF_SMOKE)
    rows = df.collect()
    assert len(rows) == 5
