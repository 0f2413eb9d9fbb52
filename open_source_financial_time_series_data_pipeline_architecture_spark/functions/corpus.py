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

from pyspark.sql import DataFrame
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
