"""Blocked record linkage with a hot-block cap.

Blocking bounds the candidate pair space of record linkage at the
LARGEST block: one national-holiday-sized block (every record sharing
the blocking key) silently reintroduces the O(n²) self-join the
blocking was supposed to prevent — the same hazard the n-gram dedup
path caps with ``max_doc_freq`` (operators/dedup.py), applied here to
entity matching (VERDICT r3 item 3; SCALE.md "entity_match_candidates").

The cap uses the SORTED-NEIGHBORHOOD method (Hernández & Stolfo,
SIGMOD 1995) inside oversized blocks only:

- block size ≤ ``max_block_size``: ALL within-block pairs (exact
  blocked-linkage semantics, unchanged);
- block size > ``max_block_size``: rows rank by (name, id) inside the
  block and each row pairs only with its next ``neighborhood`` ranks —
  candidates per hot block drop from C(n, 2) to ≤ n·w, and
  lexicographically close names (where small edit distances live)
  stay paired.

Everything is windows-partitioned-by-block + one equi-join per arm —
no unpartitioned window, no nested-loop join; the hot arm's join key
includes the rank offset (exploded 1..w) so even the hot join is a
pure equi-join producing exactly the neighbor pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def blocked_pair_candidates(
    df: DataFrame,
    block_cols: list[str],
    id_col: str,
    order_col: str,
    max_block_size: int | None = None,
    neighborhood: int = 8,
) -> DataFrame:
    """Within-block candidate pairs ``(a, b)`` with ``a.id < b.id``,
    hot blocks capped by sorted-neighborhood. Returns the input
    columns prefixed ``a_`` / ``b_`` (pair orientation: ``id_col``
    ascending)."""
    a_cols = [F.col(f"a.{c}").alias(f"a_{c}") for c in df.columns]
    b_cols = [F.col(f"b.{c}").alias(f"b_{c}") for c in df.columns]
    block_eq = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols]

    if max_block_size is None:
        a, b = df.alias("a"), df.alias("b")
        cond = block_eq + [F.col(f"a.{id_col}") < F.col(f"b.{id_col}")]
        return a.join(b, _and(cond)).select(*a_cols, *b_cols)

    wb = Window.partitionBy(*block_cols)
    ranked = df.withColumn("__bs", F.count(F.lit(1)).over(wb)).withColumn(
        "__rk",
        F.row_number().over(wb.orderBy(order_col, id_col)),
    )
    small = ranked.filter(F.col("__bs") <= max_block_size)
    hot = ranked.filter(F.col("__bs") > max_block_size)

    sa, sb = small.alias("a"), small.alias("b")
    small_pairs = sa.join(
        sb, _and(block_eq + [F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
    ).select(*a_cols, *b_cols)

    # hot arm: explode each left row to its w neighbor ranks; the join
    # is equi on (block, rank) → ≤ n·w pairs per block, linear scan
    probe = hot.withColumn(
        "__nbr",
        F.explode(F.sequence(F.col("__rk") + 1, F.col("__rk") + neighborhood)),
    )
    ha, hb = probe.alias("a"), hot.alias("b")
    swap = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    hot_pairs = ha.join(
        hb, _and(block_eq + [F.col("a.__nbr") == F.col("b.__rk")])
    ).select(
        *[
            F.when(swap, F.col(f"a.{c}")).otherwise(F.col(f"b.{c}")).alias(f"a_{c}")
            for c in df.columns
        ],
        *[
            F.when(swap, F.col(f"b.{c}")).otherwise(F.col(f"a.{c}")).alias(f"b_{c}")
            for c in df.columns
        ],
    )
    return small_pairs.unionByName(hot_pairs)


def _and(conds: list[Column]) -> Column:
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out
