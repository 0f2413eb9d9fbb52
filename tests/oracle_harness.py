"""Local replica of the driver's DuckDB-oracle comparison — STRICT.

Runs a Spark query and its oracle SQL side-by-side, canonicalizes the
way the driver does (column sort, row sort over all columns) and asserts
exact equality.

Strictness notes (round 2 — each masked a real driver failure in r01):

- Views are registered from pandas frames, NOT ``read_parquet`` —
  DuckDB's parquet reader truncates TIMESTAMP(NANOS) to microseconds,
  while a registered pandas frame keeps ``TIMESTAMP_NS``.  The driver
  preserves nanos, so an oracle that emits raw ``events.ts`` values
  diverges from Spark's microsecond reads unless the oracle truncates
  explicitly (``CAST(ts AS TIMESTAMP)``).
- Timestamps are compared at nanosecond precision (Spark's µs values
  pad with zeros); no coercion to ``datetime64[us]``.
- List/array-typed output columns raise immediately: the driver's
  canonicalization does a pandas sort over all columns and crashes on
  unhashable lists (verbatim error in CORRECTNESS_r01.json).
- ``-0.0`` in any float column raises: a value hash distinguishes the
  two zero bit patterns even though ``==`` does not.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

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
    """Views over pandas frames — preserves TIMESTAMP_NS like the driver."""
    con = duckdb.connect()
    for t in TABLES:
        frame = pq.read_table(f"{sf_dir}/{t}.parquet").to_pandas()
        con.register(f"_pdf_{t}", frame)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM _pdf_{t}")
    return con


def _check_driver_hashable(df: pd.DataFrame, side: str, name: str) -> None:
    for c in df.columns:
        col = df[c]
        if col.dtype == object and col.notna().any():
            sample = col.dropna().iloc[0]
            if isinstance(sample, (list, np.ndarray, dict, set)):
                raise AssertionError(
                    f"{name}: {side} column {c!r} is {type(sample).__name__}-typed "
                    f"— the driver's canonicalization crashes on unhashable "
                    f"values; restructure to scalar rows (posexplode/unnest)"
                )
        if pd.api.types.is_float_dtype(col):
            vals = col.to_numpy(dtype=float, na_value=np.nan)
            neg_zero = np.signbit(vals) & (vals == 0.0)
            if neg_zero.any():
                raise AssertionError(
                    f"{name}: {side} column {c!r} contains -0.0 "
                    f"({int(neg_zero.sum())} rows) — a value hash distinguishes "
                    f"the zero bit patterns; add `+ 0.0` on both sides"
                )


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            # common ns precision WITHOUT truncation: µs values pad zeros,
            # genuine sub-µs digits survive and fail the comparison.
            df[c] = (
                pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[ns]")
            )
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?") -> None:
    got_raw = spark_df.toPandas()
    exp_raw = con.execute(sql).df()
    compare_frames(got_raw, exp_raw, name)


def compare_frames(
    got_raw: pd.DataFrame, exp_raw: pd.DataFrame, name: str = "?"
) -> None:
    """Frame-level core of :func:`compare` — callers that already hold
    both result frames (the correctness sweep records row counts from
    the SAME execution it compares) enter here."""
    _check_driver_hashable(got_raw, "spark", name)
    _check_driver_hashable(exp_raw, "oracle", name)
    got = _normalize(got_raw)
    exp = _normalize(exp_raw)
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns differ: spark={list(got.columns)} oracle={list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: row count {len(got)} != {len(exp)}"
    for c in got.columns:
        g, e = got[c], exp[c]
        # int-on-one-side / float-on-the-other: `==` passes (1 == 1.0)
        # but the driver's VALUE HASH distinguishes the dtypes — this was
        # the r01/r02 user_sessionization red row (DuckDB sum(INTEGER) →
        # HUGEINT → pandas float64 vs Spark int64).  Fail loudly here.
        g_int = pd.api.types.is_integer_dtype(g)
        e_int = pd.api.types.is_integer_dtype(e)
        g_f = pd.api.types.is_float_dtype(g)
        e_f = pd.api.types.is_float_dtype(e)
        if (g_int and e_f) or (g_f and e_int):
            raise AssertionError(
                f"{name}: column {c} dtype kind skew: spark={g.dtype} "
                f"oracle={e.dtype} — driver hash distinguishes int vs float; "
                f"CAST the oracle (HUGEINT sums → BIGINT) or the Spark side"
            )
        # bool-vs-int is the same hazard class: True == 1 passes, the
        # value hash ("True" vs "1") does not
        if pd.api.types.is_bool_dtype(g) != pd.api.types.is_bool_dtype(e):
            raise AssertionError(
                f"{name}: column {c} bool-kind skew: spark={g.dtype} "
                f"oracle={e.dtype} — emit BOOLEAN on both sides or neither"
            )
        if g_f or e_f:
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
