"""Z-order clustering: file-level min-max envelopes must be tight in
EVERY clustered dimension, so a range predicate on any one of them
prunes most files. Measured directly from parquet footer statistics
(the same stats Spark's scan pruning consults) — not from row counts.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

from open_source_financial_time_series_data_pipeline_architecture_spark.sources import zorder as Z
from open_source_financial_time_series_data_pipeline_architecture_spark.sources import load_table

SF = "/root/testdata/sf0.001"
N_FILES = 8


def _overlapping_files(path: str, col: str, lo, hi) -> tuple[int, int]:
    """(files whose [min,max] envelope overlaps [lo,hi], total files)."""
    files = sorted(glob.glob(path + "/part-*.parquet"))
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmin = fmax = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is not None and not (fmax < lo or fmin > hi):
            hit += 1
    return hit, len(files)


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("zorder")
    ev = load_table(spark, SF, "events").select("user_id", "value", "event_id")
    zpath = str(base / "zordered")
    naive = str(base / "naive")
    Z.write_zordered(ev, zpath, ["user_id", "value"], n_files=N_FILES)
    # control: same data, same file count, arbitrary (round-robin) layout
    ev.repartition(N_FILES).write.mode("overwrite").parquet(naive)
    return zpath, naive


def test_zorder_prunes_both_dimensions(layouts):
    zpath, naive = layouts
    # ranges pinned to the top/bottom of each dimension's rank space so
    # they constrain the high interleaved bits (sf0.001: user_id 0-14,
    # value ~p15 at 10.0)
    z_u, n_u = _overlapping_files(zpath, "user_id", 13, 14)
    naive_u, _ = _overlapping_files(naive, "user_id", 13, 14)
    z_v, n_v = _overlapping_files(zpath, "value", 0.0, 10.0)
    naive_v, _ = _overlapping_files(naive, "value", 0.0, 10.0)
    assert n_u == N_FILES and n_v == N_FILES
    # round-robin layout cannot prune: every file overlaps
    assert naive_u == N_FILES and naive_v == N_FILES
    # z-ordered layout prunes in BOTH dimensions simultaneously
    assert z_u <= N_FILES // 2, f"user_id files hit: {z_u}"
    assert z_v <= N_FILES // 2, f"value files hit: {z_v}"


def test_zorder_preserves_rows(spark, layouts):
    zpath, _ = layouts
    ev = load_table(spark, SF, "events")
    out = spark.read.parquet(zpath)
    assert out.count() == ev.count()
    assert set(out.columns) == {"user_id", "value", "event_id"}
    a = sorted(r["event_id"] for r in out.select("event_id").collect())
    b = sorted(r["event_id"] for r in ev.select("event_id").collect())
    assert a == b


def test_zvalue_is_monotone_in_quadrants(spark):
    """Sanity: points in the low-low quadrant must z-sort before points
    in the high-high quadrant (curve locality)."""
    df = spark.createDataFrame(
        [(i, float(i % 7), i) for i in range(200)], "a long, v double, id long"
    )
    z = Z.zvalue(df, ["a", "v"]).collect()
    lo = [r["__z"] for r in z if r["a"] < 50 and r["v"] <= 2.0]
    hi = [r["__z"] for r in z if r["a"] >= 150 and r["v"] >= 5.0]
    assert max(lo) < min(hi)
