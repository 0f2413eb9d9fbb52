"""Z-order (Morton-curve) multi-dimensional clustering for data skipping.

Parquet row-group/file min-max stats prune scans only when the data is
clustered on the filter column. A single-column sort clusters one
dimension; interleaving the bits of several columns (the Morton / Z
curve, public technique used by Delta Lake's OPTIMIZE ZORDER and
DB2/SQL-Server space-filling-curve indexes) clusters ALL of them at
once: rows close in Z-value are close in every interleaved dimension,
so a predicate on any subset of the dimensions touches few files.

Two binning strategies map each column to a small integer before the
bit interleave:

- ``binning="approx"`` (default, the 100 TB path): one
  ``percentile_approx`` aggregate computes per-column cutpoints (a
  bounded O(dims x 2^bits) driver value), which become broadcast
  literals; each row's bucket is a codegen'd count-of-cuts-below. No
  global window, no extra shuffle — the only shuffle is the final
  ``repartitionByRange`` every clustered write needs anyway.
- ``binning="rank"`` (exact, small-scale witness): percent_rank over a
  single global order — distribution-perfect buckets, but the window
  moves everything through one partition; keep it for tests and toy
  data.

String columns get an order-preserving numeric key (base-256 code of
the first 8 characters) so lexicographic neighbors land in nearby
buckets; binning quality only affects layout, never answers.

At query time nothing changes: plain filters; pruning comes from the
layout (and, for the versioned table, from manifest envelopes —
``versioned.prune_files``). tests/test_zorder.py asserts the
file-level effect directly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


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


def _order_key(dtype: T.DataType, col: Column) -> Column:
    """An order-preserving DOUBLE key for binning. Strings use a
    base-256 code of their first 8 characters — lexicographic order
    preserved for single-byte alphabets, approximate beyond (layout
    heuristic only; correctness never depends on it)."""
    if isinstance(dtype, T.StringType):
        key = F.lit(0.0)
        for i in range(1, 9):
            key = key * 256.0 + F.ascii(F.substring(col, i, 1))
        return key
    if isinstance(dtype, T.TimestampType):
        return F.unix_micros(col).cast("double")
    if isinstance(dtype, T.DateType):
        return F.datediff(col, F.lit("1970-01-01")).cast("double")
    return col.cast("double")


def _approx_buckets(df: DataFrame, cols: list[str], bits: int) -> DataFrame:
    """Add ``__q_i`` bucket columns via broadcast approx-quantile
    cutpoints: ONE aggregate over all dims at once (bounded
    O(dims x 2^bits) driver-side result), then a per-row
    count-of-cutpoints-below — pure codegen, no window, no shuffle."""
    nb = 1 << bits
    probs = [i / nb for i in range(1, nb)]
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    out = df
    for i, c in enumerate(cols):
        out = out.withColumn(f"__k_{i}", _order_key(dtypes[c], F.col(c)))
    cuts_row = out.agg(
        *[
            F.percentile_approx(f"__k_{i}", probs, 10_000).alias(f"c{i}")
            for i in range(len(cols))
        ]
    ).first()
    scale = nb - 1
    for i in range(len(cols)):
        cuts = sorted(set(cuts_row[f"c{i}"] or []))
        if not cuts:  # all-NULL or empty input: one constant bucket
            out = out.withColumn(f"__q_{i}", F.lit(0).cast("long"))
            continue
        arr = F.array(*[F.lit(float(x)) for x in cuts])
        k = F.col(f"__k_{i}")
        # NULL key: every comparison is NULL -> filtered out -> bucket
        # 0, matching rank-binning's nulls-first placement
        q = F.size(F.filter(arr, lambda cut: k >= cut)).cast("long")
        # stretch to the full bit range so a low-cardinality dimension
        # (few distinct cutpoints) still occupies the HIGH interleave
        # bits and weights equally against high-cardinality dims
        out = out.withColumn(
            f"__q_{i}", F.floor(q * scale / len(cuts)).cast("long")
        )
    return out.drop(*[f"__k_{i}" for i in range(len(cols))])


def _rank_buckets(df: DataFrame, cols: list[str], bits: int) -> DataFrame:
    """Exact buckets: percent_rank over a global order. Distribution-
    perfect, but the unpartitioned window serializes the data — the
    small-scale witness form, not the production default."""
    scale = (1 << bits) - 1
    out = df
    for i, c in enumerate(cols):
        w = Window.orderBy(F.col(c).asc_nulls_first())
        q = F.floor(F.percent_rank().over(w) * scale).cast("long")
        out = out.withColumn(f"__q_{i}", q)
    return out


def zvalue(
    df: DataFrame,
    cols: list[str],
    bits: int | None = None,
    binning: str = "approx",
) -> DataFrame:
    """Add a `__z` column: Morton interleave of the bucketed `cols`.
    ``binning="approx"`` (default) buckets by broadcast approx-quantile
    cutpoints (8 bits/dim — ample for file-level pruning, and the whole
    pipeline stays shuffle-free); ``binning="rank"`` buckets by exact
    percent_rank (16 bits/dim, global window — small-scale only).
    Either way skewed or categorical columns cluster as well as uniform
    ones, and NULLs bucket first (matching min-max pruning
    semantics)."""
    ndims = len(cols)
    if binning == "approx":
        out = _approx_buckets(df, cols, 8 if bits is None else min(bits, 16))
    elif binning == "rank":
        out = _rank_buckets(df, cols, 16 if bits is None else bits)
    else:
        raise ValueError(f"binning: {binning!r}")
    zparts = [
        F.shiftleft(_spread_bits_16(F.col(f"__q_{i}"), ndims), i)
        for i in range(ndims)
    ]
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
    binning: str = "approx",
) -> None:
    """Cluster `df` on the Z-curve over `cols` and write `n_files`
    parquet files, each covering a contiguous Z-range — so every file's
    min-max envelope is tight in EVERY clustered dimension and a filter
    on any of them prunes most files at planning time."""
    zdf = zvalue(df, cols, binning=binning)
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
