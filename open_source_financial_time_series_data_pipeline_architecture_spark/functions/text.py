"""Text-analysis operators for the LLM-training-data plane.

Beyond the reference's scope (SURVEY north-star ops): language-ID,
quality scoring, token counting, and document fingerprinting over the
``documents`` table. Everything is built from codegen-friendly string
builtins (no UDFs), and every formula is deliberately expressible in
ANSI SQL so the DuckDB oracle can replicate it bit-for-bit.

Scale: all are embarrassingly parallel single-pass projections — no
shuffle at any size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny marker-word profiles per language. The testdata corpus is
# English-ish word soup, so 'en' dominates — the operator's value is its
# deterministic, engine-portable scoring formula.
LANG_MARKERS: dict[str, list[str]] = {
    "de": [" der ", " die ", " und ", " nicht "],
    "en": [" the ", " and ", " of ", " a "],
    "es": [" el ", " la ", " los ", " que "],
    "fr": [" le ", " les ", " des ", " est "],
    "zh": ["的", "是", "了", "在"],
}

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "on", "for"]


def occurrences(text: Column, needle: str) -> Column:
    """Non-overlapping substring occurrence count via length arithmetic
    (portable to any SQL engine)."""
    n = len(needle)
    return (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))) / n


def language_id(
    docs: DataFrame, text_col: str = "text", extra_cols: tuple = ()
) -> DataFrame:
    """N-gram/marker-based language ID: argmax over per-language marker
    occurrence counts, ties broken by language code (deterministic).
    ``extra_cols`` pass through unchanged so composed pipelines can
    stack the text projections into ONE scan."""
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    scores = [
        sum(occurrences(padded, m) for m in markers).alias(f"score_{lang}")
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    scored = docs.select("doc_id", *scores, *[F.col(c) for c in extra_cols])
    # argmax via greatest + chained whens (first match wins → tie-break
    # by language order)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = F.lit(None)
    expr = None
    for lg in langs:
        cond = F.col(f"score_{lg}") == best
        expr = F.when(cond, lg) if expr is None else expr.when(cond, lg)
    return scored.select(
        "doc_id",
        *[F.col(f"score_{lg}") for lg in langs],
        F.when(best > 0, expr).otherwise("und").alias("lang_pred"),
        *[F.col(c) for c in extra_cols],
    )


def quality_score(
    docs: DataFrame, text_col: str = "text", extra_cols: tuple = ()
) -> DataFrame:
    """Heuristic document quality in [0,1]: length, punctuation ratio,
    stopword ratio, mean word length — the classic pretraining filters.
    ``extra_cols`` pass through unchanged (one-scan composition)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.split(F.trim(t), " +")
    n_words = F.size(words)
    padded = F.concat(F.lit(" "), t, F.lit(" "))
    n_stop = sum(occurrences(padded, f" {w} ") for w in STOPWORDS)
    punct = sum(occurrences(t, p) for p in [".", ",", "!", "?", ";"])
    mean_wlen = n_chars / F.nullif(n_words.cast("double"), F.lit(0.0))
    len_score = F.least(n_chars / F.lit(200.0), F.lit(1.0))
    stop_score = F.least(n_stop / F.nullif(n_words.cast("double"), F.lit(0.0)) * 5, F.lit(1.0))
    punct_pen = F.greatest(
        F.lit(0.0), 1 - punct / F.nullif(n_words.cast("double"), F.lit(0.0))
    )
    wlen_score = F.when((mean_wlen >= 3) & (mean_wlen <= 10), 1.0).otherwise(0.5)
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        ((len_score + stop_score + punct_pen + wlen_score) / 4).alias("quality"),
        *[F.col(c) for c in extra_cols],
    )


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish estimate (chars/4, the common
    heuristic for English-like text). For tokenizer-EXACT counts — the
    number a training pipeline actually budgets with — use
    ``functions.bpe.token_count`` (real byte-level BPE, round 6)."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(t), " +")).alias("ws_tokens"),
        F.ceil(F.length(t) / 4.0).cast("long").alias("est_bpe_tokens"),
    )


def fingerprint(
    docs: DataFrame, text_col: str = "text", extra_cols: tuple = ()
) -> DataFrame:
    """Deterministic document fingerprint: md5 of the normalized text
    (lowercase, squeezed whitespace) — the exact-dedup anchor.
    ``extra_cols`` pass through unchanged (one-scan composition)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), " +", " ")
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.length(norm).alias("norm_chars"),
        *[F.col(c) for c in extra_cols],
    )


def shingles(
    docs: DataFrame, text_col: str = "text", n: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """Distinct word n-gram shingles per document (dedup building block).
    Array built with `transform(sequence(...))` — no UDF, no explode
    until the final distinct."""
    # Materialize the split array in its own projection FIRST: inlining
    # `split(...)` into the transform lambda makes codegen re-evaluate
    # the split per element (~7× slower measured at sf0.1).
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
    return base.select(id_col, F.explode(grams).alias("shingle")).distinct()


def gopher_rules(
    docs: DataFrame, text_col: str = "text", extra_cols: tuple = ()
) -> DataFrame:
    """Gopher-style rule-based quality gate (Rae et al. 2021, Table A1)
    as individual boolean flags plus the conjunction — unlike
    ``quality_score`` (a blended 0-1 heuristic), this is the hard
    keep/drop filter suite a pretraining pipeline applies first:

    - 50 ≤ word count ≤ 100 000
    - 3 ≤ mean word length ≤ 10
    - ≥ 2 stopword hits (the "is this running text" check)
    - ≥ 80 % of words contain at least one alphabetic character

    Pure projection (split + higher-order filters), embarrassingly
    parallel, no shuffle; every predicate is expressible identically
    in ANSI SQL for the oracle.
    """
    t = F.col(text_col)
    base = docs.select(
        "doc_id",
        F.split(F.trim(t), " +").alias("__ws"),
        t.alias("__t"),
        *[F.col(c) for c in extra_cols],
    )
    n_words = F.size("__ws")
    mean_wlen = F.aggregate(
        F.col("__ws"), F.lit(0.0), lambda acc, w: acc + F.length(w)
    ) / F.nullif(n_words.cast("double"), F.lit(0.0))
    padded = F.concat(F.lit(" "), F.col("__t"), F.lit(" "))
    n_stop = sum(occurrences(padded, f" {w} ") for w in STOPWORDS)
    n_alpha = F.size(F.filter(F.col("__ws"), lambda w: w.rlike("[a-zA-Z]")))
    alpha_frac = n_alpha / F.nullif(n_words.cast("double"), F.lit(0.0))
    ok_len = (n_words >= 50) & (n_words <= 100_000)
    ok_wlen = (mean_wlen >= 3.0) & (mean_wlen <= 10.0)
    ok_stop = n_stop >= 2
    ok_alpha = alpha_frac >= 0.8
    return base.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        n_stop.cast("bigint").alias("n_stopwords"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        ok_len.alias("ok_word_count"),
        ok_wlen.alias("ok_mean_word_len"),
        ok_stop.alias("ok_stopwords"),
        ok_alpha.alias("ok_alpha_words"),
        (ok_len & ok_wlen & ok_stop & ok_alpha).alias("passes_gopher"),
        *[F.col(c) for c in extra_cols],
    )
