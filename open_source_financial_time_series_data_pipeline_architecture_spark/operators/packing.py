"""Sequence packing for LLM pre-training batches.

Two strategies over the ``documents`` table, both sharded by a
partition column (``source``) so packing is embarrassingly parallel —
the shape a 100 TB corpus needs (each shard packs independently; no
global sequential pass):

- ``chunked_packing`` — the GPT-style concat-and-split: documents in a
  shard are concatenated in id order and the token stream is cut into
  fixed-length sequences. A document's placement is pure arithmetic on
  the running token offset (``offset DIV seq_len``), so the whole
  operator is one window cumsum — no UDF, fully whole-stage-codegen.
- ``greedy_packing`` — next-fit bin packing: documents never straddle a
  boundary; a document that would overflow the open bin starts a new
  one. The fold is inherently sequential per shard, so it runs as one
  Arrow-batched ``applyInPandas`` per shard (a shard's doc list is
  bounded by construction — shards are the unit of parallelism).

Scale notes:
- Both shuffle ONCE on the shard column. ``chunked_packing`` keeps the
  cumsum inside a window over (shard ORDER BY id); Spark evaluates it
  in a single pass per partition.
- ``greedy_packing``'s per-shard fold is O(docs-in-shard) and streams
  through Arrow; the output is the same cardinality as the input (one
  row per document), never materializing bins.
- At 100 TB the shard column would be the corpus shard / file group;
  skewed shards are handled upstream by re-sharding, not here.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_token_counts(
    docs: DataFrame, text_col: str = "text", out_col: str = "n_tokens"
) -> DataFrame:
    """Whitespace token count (the repo-wide `' +'` split convention,
    matching functions.text.token_count)."""
    return docs.withColumn(
        out_col, F.size(F.split(F.trim(F.col(text_col)), " +")).cast("long")
    )


def chunked_packing(
    docs: DataFrame,
    seq_len: int = 512,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    counts: DataFrame | None = None,
) -> DataFrame:
    """Concat-and-split packing: one row per document with its token
    offset and the first/last training-sequence index it lands in.

    ``seq_start = offset DIV seq_len``, ``seq_end = (offset + n_tokens
    - 1) DIV seq_len``; ``crosses_boundary`` marks documents split
    across two or more sequences (the loss-masking consumers care).
    A zero-token document occupies one notional slot so seq_end never
    underflows its own offset.

    ``counts`` (optional): a pre-computed ``(id, shard, n_tokens)``
    frame — pass tokenizer-exact counts (``functions.bpe.token_count``)
    to pack against the budget the training run actually enforces;
    default is the whitespace counter.
    """
    w = Window.partitionBy(shard_col).orderBy(id_col)
    toks = (
        counts
        if counts is not None
        else with_token_counts(docs, text_col)
    ).select(id_col, shard_col, "n_tokens")
    cum = toks.withColumn(
        "token_offset",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long"),
    )
    span = F.greatest(F.col("n_tokens"), F.lit(1))
    seq_start = (F.col("token_offset") / seq_len).cast("long")
    seq_end = ((F.col("token_offset") + span - 1) / seq_len).cast("long")
    return cum.select(
        id_col,
        shard_col,
        "n_tokens",
        "token_offset",
        seq_start.alias("seq_start"),
        seq_end.alias("seq_end"),
        (seq_start != seq_end).alias("crosses_boundary"),
    )


def greedy_packing(
    docs: DataFrame,
    budget: int = 512,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Next-fit bin packing per shard: documents are taken in id order;
    a document that would push the open bin past ``budget`` closes it
    and opens a new one (an oversized document sits alone in its bin).

    Returns one row per document: (id, shard, n_tokens, bin_id,
    bin_fill-after-placement). bin_id is 1-based within each shard.
    """
    toks = with_token_counts(docs, text_col).select(
        id_col, shard_col, "n_tokens"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bin_ids, fills = [], []
        bin_id, fill = 0, None
        for t in pdf["n_tokens"]:
            t = int(t)
            if fill is None or fill + t > budget:
                bin_id += 1
                fill = t
            else:
                fill += t
            bin_ids.append(bin_id)
            fills.append(fill)
        pdf["bin_id"] = pd.Series(bin_ids, dtype="int64")
        pdf["bin_fill"] = pd.Series(fills, dtype="int64")
        return pdf

    out_schema = (
        f"{id_col} long, {shard_col} string, n_tokens long, "
        "bin_id long, bin_fill long"
    )
    return toks.groupBy(shard_col).applyInPandas(pack, schema=out_schema)
