"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL side-by-side, normalizes (column
sort, row sort, timestamp precision) and asserts exact equality — the
same bar as the driver's order-insensitive value hash.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[us]")
        elif df[c].dtype == object and len(df) and isinstance(df[c].dropna().iloc[0] if df[c].notna().any() else None, (list, np.ndarray)):
            df[c] = df[c].map(lambda v: tuple(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?") -> None:
    got = _normalize(spark_df.toPandas())
    exp = _normalize(con.execute(sql).df())
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns differ: spark={list(got.columns)} oracle={list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: row count {len(got)} != {len(exp)}"
    for c in got.columns:
        g, e = got[c], exp[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(e):
            ok = pd.Series(
                np.isclose(
                    g.astype(float), e.astype(float), rtol=0, atol=0, equal_nan=True
                )
            )
        else:
            ok = (g == e) | (g.isna() & e.isna())
        if not ok.all():
            bad = (~ok).idxmax()
            raise AssertionError(
                f"{name}: column {c} mismatch at row {bad}: "
                f"spark={g.iloc[bad]!r} oracle={e.iloc[bad]!r} "
                f"({int((~ok).sum())} rows differ)"
            )
