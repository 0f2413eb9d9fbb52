"""Z-order (Morton-curve) multi-dimensional clustering for data skipping.

Parquet row-group/file min-max stats prune scans only when the data is
clustered on the filter column. A single-column sort clusters one
dimension; interleaving the bits of several columns (the Morton / Z
curve, public technique used by Delta Lake's OPTIMIZE ZORDER and
DB2/SQL-Server space-filling-curve indexes) clusters ALL of them at
once: rows close in Z-value are close in every interleaved dimension,
so a predicate on any subset of the dimensions touches few files.

Implementation is pure built-in expressions: rank each column to a
16-bit integer (percent_rank scales arbitrary distributions uniformly),
spread the bits with shift/mask rounds, OR the interleaved words, and
`repartitionByRange` on the Z-value so each output file covers a tight
Z-range. No UDF, no driver collect; the rank windows are global but
single-pass (at 100 TB, substitute an approx-quantile binning for the
rank window — hook provided via `bits`).

At query time nothing changes: plain filters; pruning comes from the
layout. tests/test_zorder.py asserts the file-level effect directly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _spread_bits_16(col: Column, ndims: int) -> Column:
    """Insert ndims-1 zero bits between each of the low 16 bits of
    `col` (classic mask-shift bit spreading, unrolled for 2 and 3
    dims)."""
    # Column `|`/`&` are LOGICAL operators in PySpark — bitwise ops go
    # through bitwiseOR/bitwiseAND.
    x = col.cast("long")
    if ndims == 2:
        x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
        x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
        x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
        x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))
        return x
    if ndims == 3:
        x = x.bitwiseOR(F.shiftleft(x, 16)).bitwiseAND(F.lit(0x0000FF0000FF))
        x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00F00F00F00F))
        x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0C30C30C30C3))
        x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x249249249249))
        return x
    raise ValueError("z-ordering supports 2 or 3 columns")


def zvalue(df: DataFrame, cols: list[str], bits: int = 16) -> DataFrame:
    """Add a `__z` column: Morton interleave of the rank-normalized
    `cols`. Ranks (percent_rank over a global order) make the curve
    distribution-free — skewed or categorical columns cluster as well
    as uniform ones. NULLs rank first (cluster together), matching
    min-max pruning semantics."""
    ndims = len(cols)
    scale = (1 << bits) - 1
    out = df
    zparts = []
    for i, c in enumerate(cols):
        w = Window.orderBy(F.col(c).asc_nulls_first())
        q = F.floor(F.percent_rank().over(w) * scale).cast("long")
        out = out.withColumn(f"__q_{i}", q)
        zparts.append(F.shiftleft(_spread_bits_16(F.col(f"__q_{i}"), ndims), i))
    z = zparts[0]
    for p in zparts[1:]:
        z = z.bitwiseOR(p)
    return out.withColumn("__z", z).drop(*[f"__q_{i}" for i in range(ndims)])


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Cluster `df` on the Z-curve over `cols` and write `n_files`
    parquet files, each covering a contiguous Z-range — so every file's
    min-max envelope is tight in EVERY clustered dimension and a filter
    on any of them prunes most files at planning time."""
    zdf = zvalue(df, cols)
    (
        zdf.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def files_read(df: DataFrame) -> int:
    """Count distinct files a (filtered) scan actually touches — the
    observable data-skipping metric the tests assert on."""
    return (
        df.select(F.input_file_name().alias("f")).distinct().count()
    )
