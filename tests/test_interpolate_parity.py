"""price_interpolate vs an INDEPENDENT DuckDB recomputation — exact.

The query floor-scales at 1e-6 (kalman_level convention) instead of
ROUND precisely because dyadic interpolation weights land on the
0.5e-6 grid where the engines' round() legitimately disagree; the
interpolation doubles themselves are bit-identical (closed formula
over identical inputs), so floor(x·1e6) matches exactly. This test
recomputes the grid with a DIFFERENT window formulation (true
following frame instead of the DESC-ordered growing frame) and
asserts bit-exact equality.
"""

from __future__ import annotations

import pandas as pd

import __spark_entry__ as em
from open_source_financial_time_series_data_pipeline_architecture_spark.schema import (
    oracle,
)
from tests.conftest import SF_CORRECT
from tests.oracle_harness import duckdb_con

INTERP_SQL = oracle(
    """
o AS (
  SELECT
    to_timestamp(CAST(floor(epoch(time) / 60) * 60 AS BIGINT))::TIMESTAMP AS bucket,
    symbol,
    last(price ORDER BY time, trade_id) AS close
  FROM trades GROUP BY 1, 2
),
b AS (SELECT symbol, min(bucket) AS mn, max(bucket) AS mx FROM o GROUP BY 1),
grid AS (
  SELECT symbol, unnest(generate_series(mn, mx, INTERVAL 1 MINUTE)) AS bucket
  FROM b
),
j AS (
  SELECT g.symbol, g.bucket, o.close
  FROM grid g LEFT JOIN o ON o.symbol = g.symbol AND o.bucket = g.bucket
),
f AS (
  SELECT symbol, bucket, close,
         last_value(close IGNORE NULLS) OVER w_prev AS pv,
         epoch(last_value(CASE WHEN close IS NOT NULL THEN bucket END IGNORE NULLS)
               OVER w_prev) AS pt,
         first_value(close IGNORE NULLS) OVER w_next AS nv,
         epoch(first_value(CASE WHEN close IS NOT NULL THEN bucket END IGNORE NULLS)
               OVER w_next) AS nt
  FROM j
  WINDOW w_prev AS (PARTITION BY symbol ORDER BY bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         w_next AS (PARTITION BY symbol ORDER BY bucket
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT symbol, bucket,
       floor((CASE
         WHEN close IS NOT NULL THEN close
         WHEN pv IS NULL THEN nv
         WHEN nv IS NULL THEN pv
         ELSE pv + (nv - pv) * (epoch(bucket) - pt) / (nt - pt)
       END) * 1000000.0) / 1000000.0 AS close_interp,
       close IS NULL AS is_gap
FROM f
"""
)


def test_price_interpolate_matches_duckdb_exactly(spark):
    con = duckdb_con(SF_CORRECT)
    got = (
        em.queries()["price_interpolate"](spark, SF_CORRECT)
        .toPandas()
        .sort_values(["symbol", "bucket"])
        .reset_index(drop=True)
    )
    exp = con.execute(INTERP_SQL).df().sort_values(["symbol", "bucket"]).reset_index(
        drop=True
    )
    exp["bucket"] = pd.to_datetime(exp["bucket"]).dt.tz_localize(None)
    assert len(got) == len(exp) and len(got) > 100_000
    assert (got["symbol"] == exp["symbol"]).all()
    assert (got["bucket"] == exp["bucket"]).all()
    assert (got["is_gap"] == exp["is_gap"]).all()
    diff = (got["close_interp"] - exp["close_interp"]).abs()
    # bit-exact: floored bit-identical doubles cannot differ
    assert (diff == 0).all(), diff.max()
