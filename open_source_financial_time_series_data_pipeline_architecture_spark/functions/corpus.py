"""Corpus-statistics operators for training-data curation — the steps a
large-scale LLM data pipeline runs between dedup and tokenization:

- ``unigram_logprob_score`` — fluency/quality score of each document
  under the corpus's own unigram language model (the cheap, classifier-
  free "does this look like the rest of the corpus" filter).
- ``benchmark_contamination`` — n-gram overlap of every candidate
  document against a benchmark/eval shingle set (decontamination: the
  step that keeps test sets out of training data).
- ``repetition_ratio`` — dominance of the most frequent n-gram inside
  each document (boilerplate/spam detector: high ratio = the same
  phrase repeated over and over).

All pure DataFrame expressions (explode + hash aggregates + broadcast
joins); no UDFs. Word splitting matches the dedup/text convention
(``split(trim(text), ' +')``) so every text operator agrees on
tokenization.

Scale notes: corpus frequency tables are O(|vocab|) and broadcast; the
per-document work is one explode + partial aggregation (map-side
combine), so the only wide exchange carries (doc, stat) pairs, never
document bodies. Benchmark shingle sets are small by definition (eval
suites) — broadcast semi-join against the candidate shingle stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _words(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    base = docs.select(
        id_col, F.split(F.trim(F.col(text_col)), " +").alias("__ws")
    )
    return base.select(id_col, F.explode("__ws").alias("word"))


def _trigrams(docs: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """NON-distinct word n-grams per document (repetition needs counts)."""
    base = docs.select(
        id_col, F.split(F.trim(F.col(text_col)), " +").alias("__ws")
    )
    grams = F.when(
        F.size("__ws") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("__ws") - n),
            lambda i: F.array_join(F.slice("__ws", i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return base.select(id_col, F.explode(grams).alias("gram"))


def unigram_logprob_score(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Mean ln(p(w)) per document under the corpus unigram LM
    (p(w) = corpus_count(w) / corpus_total). Every word exists in the
    corpus by construction, so no smoothing branch is needed."""
    words = _words(docs, text_col, id_col)
    freq = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    total = words.agg(F.count(F.lit(1)).alias("total"))
    scored = (
        words.join(F.broadcast(freq), "word")
        .join(F.broadcast(total))
        .select(
            id_col,
            F.log(F.col("cnt").cast("double") / F.col("total")).alias("lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.round(F.avg("lp"), 6).alias("logprob_score"),
        F.count(F.lit(1)).alias("n_words"),
    )


def benchmark_contamination(
    candidates: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-candidate count of DISTINCT n-gram shingles shared with the
    benchmark set, plus the contamination flag. Zero-overlap documents
    are kept (left join) — the output is the full decontamination
    decision table."""
    from . import text as TX

    cand_sh = TX.shingles(candidates, text_col=text_col, n=n, id_col=id_col)
    bench_sh = (
        TX.shingles(benchmark, text_col=text_col, n=n, id_col=id_col)
        .select("shingle")
        .distinct()
    )
    overlap = (
        cand_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        candidates.select(id_col)
        .join(overlap, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) > 0).alias("is_contaminated"),
        )
    )


def repetition_ratio(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """max n-gram count / total n-grams per document (∈ (0, 1]; high =
    one phrase dominates). Documents with fewer than n words produce no
    n-grams and are excluded — they cannot repeat."""
    grams = _trigrams(docs, text_col, id_col, n)
    per_gram = grams.groupBy(id_col, "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    return per_gram.groupBy(id_col).agg(
        F.sum("c").alias("n_grams"),
        F.round(F.max("c") / F.sum("c"), 6).alias("rep_ratio"),
    )


def duplicate_ngram_coverage(
    docs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplicate n-gram coverage (the C4/RefinedWeb
    "fraction of the document that also appears elsewhere" curation
    signal): of each document's DISTINCT word n-grams, the share whose
    corpus document-frequency is ≥ 2.

    Complements the pairwise dedup family — a document can evade every
    pairwise threshold while still being 60% stitched-together copies;
    this measures that directly, without materializing any pair.

    Plan: one shingle pass → distinct (doc, gram) → gram DF by hash
    aggregate → join back on gram → per-doc aggregate. The only wide
    exchanges carry (doc, gram-hash) pairs; the DF table is keyed by
    gram and partially aggregated map-side. Grams are compared by
    xxhash64 to keep shuffle rows narrow — DF counting is exact
    (collisions at 64 bits are negligible and identical on both join
    sides, so coverage is self-consistent).
    """
    grams = _trigrams(docs, text_col, id_col, n).select(
        id_col, F.xxhash64("gram").alias("g")
    ).distinct()
    # r9: gram DF as a window count over the gram partition — ONE
    # shuffle and one evaluation of the gram explode, instead of a DF
    # aggregate plus a join whose probe side re-evaluates the explode
    per_doc = (
        grams.withColumn(
            "gram_df",
            F.count(F.lit(1)).over(Window.partitionBy("g")),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(
                F.when(F.col("gram_df") >= 2, 1).otherwise(0)
            ).cast("bigint").alias("n_dup_grams"),
        )
    )
    return per_doc.select(
        id_col,
        "n_grams",
        "n_dup_grams",
        F.round(
            F.col("n_dup_grams") / F.col("n_grams").cast("double"), 6
        ).alias("dup_coverage"),
    )


def mixture_weights(
    docs: DataFrame,
    alpha: float = 0.7,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-scaled source sampling weights (the multilingual /
    multi-source mixing rule of Lample & Conneau 2019 §3.1 /
    GPT-3-style corpus weighting): raw source share p_s = n_s/N is
    re-tempered to w_s ∝ p_s^α, boosting under-represented sources
    (α < 1 flattens, α = 1 is proportional). ``effective_epochs`` =
    w_s/p_s is how many passes over source s one epoch of the mixed
    stream implies — the over/under-sampling factor a data loader
    would apply.

    One hash aggregate over the corpus + one 1-row total broadcast —
    the per-source table is O(#sources), trivially driver-safe.
    """
    per_src = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    tot = per_src.agg(
        F.sum("n_docs").alias("n_total"),
        F.sum(F.pow(F.col("n_docs").cast("double"), F.lit(alpha))).alias(
            "z"
        ),
    )
    p = F.col("n_docs") / F.col("n_total").cast("double")
    w = F.pow(F.col("n_docs").cast("double"), F.lit(alpha)) / F.col("z")
    return per_src.join(F.broadcast(tot)).select(
        source_col,
        "n_docs",
        F.round(p, 6).alias("raw_share"),
        F.round(w, 6).alias("mix_weight"),
        F.round(w / p, 6).alias("effective_epochs"),
    )


def dsir_importance_weights(
    docs: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by the mean per-word log-likelihood ratio between a
    TARGET-domain unigram LM and the raw-corpus unigram LM — documents
    that look like the target domain get positive weight and are
    up-sampled.

    Both LMs use add-one smoothing over the SHARED raw-corpus
    vocabulary (p(w) = (c_w + 1)/(N + V)), so out-of-target words are
    well-defined without branches.

    Plan: two vocabulary aggregates (word counts — map-side combined,
    O(|vocab|) results, broadcast), one totals row, then a single
    per-document aggregate over the raw word stream. No pairwise work
    anywhere; the only wide exchange carries (doc, word-stat) pairs.
    """
    raw_words = _words(docs, text_col, id_col)
    tgt_words = _words(target, text_col, id_col)
    raw_counts = raw_words.groupBy("word").agg(
        F.count(F.lit(1)).alias("c_raw")
    )
    tgt_counts = tgt_words.groupBy("word").agg(
        F.count(F.lit(1)).alias("c_tgt")
    )
    vocab = raw_counts.join(tgt_counts, "word", "left").na.fill(
        {"c_tgt": 0}
    )
    totals = vocab.agg(
        F.sum("c_raw").alias("n_raw"),
        F.sum("c_tgt").alias("n_tgt"),
        F.count(F.lit(1)).alias("v"),
    )
    scored_vocab = vocab.join(F.broadcast(totals)).select(
        "word",
        (
            F.log(
                (F.col("c_tgt") + 1)
                / (F.col("n_tgt") + F.col("v")).cast("double")
            )
            - F.log(
                (F.col("c_raw") + 1)
                / (F.col("n_raw") + F.col("v")).cast("double")
            )
        ).alias("llr"),
    )
    return (
        raw_words.join(scored_vocab, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.round(F.avg("llr"), 6).alias("importance_weight"),
        )
    )


def duplicate_span_coverage(
    docs: DataFrame,
    n: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-level exact-substring duplicate spans (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better"
    substring-dedup signal, at fixed n-gram granularity): positions
    whose n-gram also occurs in ANOTHER document are merged into
    maximal covered spans per document, giving the exact token ranges
    a substring-level deduper would cut.

    Plan: positions via posexplode (grams hashed to longs before any
    shuffle), cross-document gram table = one hash aggregate
    (count-distinct-docs ≥ 2), semi-join back, then per-doc
    gaps-and-islands: running max of span-end over preceding rows
    marks island starts — one window pass over dup positions only.
    All docs appear in the output (zero spans ⇒ coverage 0).
    """
    base = docs.select(
        id_col, F.split(F.trim(F.col(text_col)), " +").alias("__ws")
    )
    gram_arr = F.when(
        F.size("__ws") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("__ws") - n),
            lambda i: F.xxhash64(F.array_join(F.slice("__ws", i + 1, n), " ")),
        ),
    ).otherwise(F.array().cast("array<long>"))
    grams = base.select(
        id_col, F.posexplode(gram_arr).alias("pos0", "g")
    ).select(id_col, (F.col("pos0") + 1).alias("pos"), "g")
    # r9: a position's gram occurs in another document iff the gram's
    # doc set has >= 2 distinct members, i.e. min(doc) != max(doc)
    # over the gram partition — ONE shuffle by g and one window pass
    # instead of a count-distinct aggregate plus a semi-join whose
    # probe side re-evaluates the whole gram explode (the explode ran
    # twice; 1.79 s -> 1.03 s at sf0.1, value-identical).
    wg = Window.partitionBy("g")
    dup_pos = (
        grams.withColumn("__mn", F.min(id_col).over(wg))
        .withColumn("__mx", F.max(id_col).over(wg))
        .filter(F.col("__mn") != F.col("__mx"))
        .drop("__mn", "__mx")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_max_end = F.max(F.col("pos") + (n - 1)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = dup_pos.withColumn(
        "island_start",
        F.when(
            prev_max_end.isNull() | (F.col("pos") > prev_max_end + 1), 1
        ).otherwise(0),
    ).withColumn(
        "island_id",
        F.sum("island_start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    islands = flagged.groupBy(id_col, "island_id").agg(
        F.min("pos").alias("start"),
        (F.max("pos") + (n - 1)).alias("end"),
    )
    per_doc = islands.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum(F.col("end") - F.col("start") + 1)
        .cast("bigint")
        .alias("covered_tokens"),
    )
    all_docs = base.select(id_col, F.size("__ws").alias("n_tokens"))
    return (
        all_docs.join(per_doc, id_col, "left")
        .na.fill({"n_spans": 0, "covered_tokens": 0})
        .select(
            id_col,
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            "n_spans",
            "covered_tokens",
            F.round(
                F.col("covered_tokens") / F.col("n_tokens").cast("double"), 6
            ).alias("covered_frac"),
        )
    )


def _rle_units(s: str) -> int:
    """Run-length-encoded size of a string in (char, count) units ×2
    with unbounded counts: 2 · number of maximal equal-char runs.
    A real, well-defined compression scheme whose output size IS
    SQL-recomputable — the oracle-checkable stand-in for zlib."""
    if not s:
        return 0
    runs = 1 + sum(1 for a, b in zip(s, s[1:]) if a != b)
    return 2 * runs


def compression_ratio(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    codec: str = "zlib",
) -> DataFrame:
    """Per-document compression ratio — the production corpus filter
    (e.g. RefinedWeb/CCNet-style pipelines) that catches
    machine-generated or highly repetitive text the token heuristics
    miss: boilerplate compresses far below natural language.

    ``codec='zlib'`` (default): `ratio = compressed_bytes / raw_bytes`
    (UTF-8), level 6. zlib is DEFLATE — deterministic for a given
    (input, level) across platforms, so values are stable for tests,
    but no SQL engine can recompute it → rows-only driver check by
    design.

    ``codec='rle'``: run-length-encoded units (2 per maximal
    equal-char run, counts unbounded) over characters — the
    ORACLE-CHECKABLE witness codec: DuckDB recomputes the run count
    exactly (adjacent-char comparison over the same string), so the
    WHOLE mapInPandas plumbing + ratio arithmetic is pinned
    value-exact while zlib stays the production codec.

    Arrow-batched mapInPandas either way (CPU-bound per batch, no
    shuffle at all — a pure map over however the corpus is already
    partitioned).
    """
    import zlib

    import pandas as pd

    if codec not in ("zlib", "rle"):
        raise ValueError(f"unknown codec: {codec}")

    schema = f"{id_col} long, raw_bytes long, compressed_bytes long, compression_ratio double"

    def batches(it):
        for pdf in it:
            txt = pdf[text_col].fillna("")
            if codec == "zlib":
                raw = txt.map(lambda s: s.encode("utf-8"))
                nraw = raw.map(len)
                ncomp = raw.map(lambda b: len(zlib.compress(b, 6)))
            else:  # rle: character-unit sizes, runs recomputable in SQL
                nraw = txt.map(len)
                ncomp = txt.map(_rle_units)
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "raw_bytes": nraw,
                    "compressed_bytes": ncomp,
                }
            )
            out["compression_ratio"] = [
                c / r if r > 0 else None
                for c, r in zip(out["compressed_bytes"], out["raw_bytes"])
            ]
            yield out

    rows = docs.select(id_col, text_col).mapInPandas(batches, schema=schema)
    return rows.withColumn(
        "compression_ratio", F.round("compression_ratio", 6)
    )
