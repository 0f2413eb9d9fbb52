"""Deduplication operator family for the training-data plane.

Five strategies, each a ``DataFrame → DataFrame`` operator over the
``documents`` table (doc_id, text, …):

- ``exact_dedup``       — hash-groupBy on normalized text (keep min id)
- ``ngram_jaccard_pairs`` — exact word-n-gram Jaccard over a shingle
                           self-join (the small-scale oracle-checkable
                           ground truth)
- ``minhash_lsh_pairs`` — MinHash signatures + banded LSH bucketing →
                           candidate pairs → exact-Jaccard verify (the
                           100 TB path)
- ``simhash64``         — 64-bit SimHash fingerprints + near-dup pairs
                           by Hamming distance
- ``embedding_cosine_pairs`` — near-dup by embedding cosine ≥ τ

Scale notes:
- The exact n-gram self-join is quadratic in docs-per-shingle — fine as
  an oracle at sf≤0.1, NOT the 100 TB plan.
- MinHash+LSH is the scale path: signatures are one narrow projection
  (xxhash64, JVM-side), candidates come from equi-joins on (band,
  bucket-hash) — shuffle proportional to candidate count, never all
  pairs. Band/row parameters tune the S-curve; verify step removes
  false positives.
- SimHash reduces each doc to 8 bytes; near-dup detection is a
  band-rotate equi-join (pigeonhole on Hamming distance), also
  all-pairs-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles


def _norm_text(text_col: str):
    return F.regexp_replace(F.lower(F.trim(F.col(text_col))), " +", " ")


def _hash_family(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic odd multipliers + offsets for the multiply-add
    minhash permutation family (Park–Miller LCG driven)."""
    state = seed
    out = []
    for _ in range(k):
        state = (state * 48271) % 2147483647
        a = (state * 2 + 1) & 0x7FFFFFFFFFFFFFFF  # odd
        state = (state * 48271) % 2147483647
        b = state
        out.append((a, b))
    return out


def exact_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: one survivor (min id) per normalized-text group.

    Single hash aggregate on md5(normalized text) — at 100 TB the
    shuffle carries (hash, id) pairs only, never document bodies.
    """
    h = F.md5(_norm_text(text_col))
    return (
        docs.select(F.col(id_col), h.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: int | None = None,
    shingle_df: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.

    jaccard(A,B) = |A∩B| / (|A|+|B|−|A∩B|); pairs with id_a < id_b and
    jaccard ≥ threshold. With ``max_doc_freq`` unset this is the exact
    ground truth the approximate strategies are validated against.

    ``max_doc_freq``: the scale guard. Candidate generation pivots on
    shingles, so one stop-phrase shingle shared by half the corpus
    yields a quadratic candidate blowup. Shingles with document
    frequency > max_doc_freq are dropped from the UNIVERSE
    (intersection AND sizes — Jaccard is then exact over the capped
    shingle set); such shingles cannot discriminate near-dups anyway.

    Physical strategy when capped: ONE aggregation builds the sorted
    posting list per shingle, the DF filter is a predicate on the same
    aggregate (free), and candidate pairs are expanded IN-ROW from each
    posting list (≤ C(max_doc_freq, 2) structs per shingle) — no
    shingle self-join shuffle at all; the only remaining wide ops are
    the posting-list groupBy and the (id_a, id_b) count. Uncapped, the
    exact ground-truth baseline keeps the classic self-join (an
    unbounded posting list must not be materialized into one row).
    """
    sh = (
        shingle_df
        if shingle_df is not None
        else shingles(docs, text_col=text_col, n=n, id_col=id_col)
    )
    if max_doc_freq is not None:
        # Cached: both the sizes leg and the pair-expansion leg read
        # this frame, and it is SMALL by construction (<= one row per
        # shingle that survives the DF cap, each row a <= max_doc_freq
        # id list) — without the cache the collect_list aggregate runs
        # twice. Spark's CacheManager dedups by canonicalized plan, so
        # repeated calls with identical inputs share one entry.
        posting = (
            sh.groupBy("shingle")
            .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
            .filter(F.size("ids") <= max_doc_freq)
            .cache()
        )
        # sizes over the capped universe: explode the kept posting lists
        sizes = (
            posting.select(F.explode("ids").alias(id_col))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_shingles"))
        )
        # in-row i<j pair expansion over the sorted ids (id_a < id_b holds
        # by construction); ids is a projected column, so the lambda does
        # not re-evaluate upstream expressions (CLAUDE.md)
        pair_expr = F.expr(
            "flatten(transform(ids, (a, i) -> "
            "transform(slice(ids, i + 2, size(ids)), "
            "b -> struct(a AS id_a, b AS id_b))))"
        )
        common = (
            posting.select(F.explode(pair_expr).alias("p"))
            .select("p.id_a", "p.id_b")
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("common"))
        )
    else:
        sh = sh.cache()
        sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
        a = sh.select(F.col(id_col).alias("id_a"), "shingle")
        b = sh.select(F.col(id_col).alias("id_b"), "shingle")
        # Self-join strategy: at corpus scale the shingle posting lists
        # are the big side and MUST shuffle (sort-merge on shingle); when
        # one side fits in memory Catalyst/AQE picks broadcast.
        common = (
            a.join(b, "shingle")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("common"))
        )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("nb"))
    jac = (
        common.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("common")
                / (F.col("na") + F.col("nb") - F.col("common"))
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold)


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 64,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_df: DataFrame | None = None,
) -> DataFrame:
    """MinHash signature per document: sig[i] = min over shingles of
    xxhash64(i || shingle). One explode + one groupBy; the aggregate
    carries num_hashes longs per doc."""
    sh = (
        shingle_df
        if shingle_df is not None
        else shingles(docs, text_col=text_col, n=n, id_col=id_col)
    )
    base = F.xxhash64("shingle")
    mins = [
        F.min(base * F.lit(a) + F.lit(b)).alias(f"h{i}")
        for i, (a, b) in enumerate(_hash_family(num_hashes))
    ]
    sig = sh.groupBy(id_col).agg(*mins)
    return sig.select(
        id_col, F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("signature")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_df: DataFrame | None = None,
) -> DataFrame:
    """MinHash + banded LSH near-dup candidates, verified with exact
    Jaccard. Returns (id_a, id_b, est_jaccard, jaccard) with
    jaccard ≥ threshold.

    Candidates = docs agreeing on ALL rows of ≥1 band (equi-join on the
    band hash — no all-pairs shuffle). est_jaccard = fraction of
    matching signature positions.
    """
    rows = num_hashes // bands
    # ONE aggregation pass over the shingles produces both the minhash
    # signature AND the shingle-hash set per doc — the signature/verify
    # stages would otherwise each shuffle the shingle frame. The shingle
    # STRING is hashed once (xxhash64); the num_hashes family is derived
    # with 64-bit multiply-add permutations (a_i·h + b_i) — long
    # arithmetic instead of num_hashes string hashes per row. The verify
    # set keeps the 8-byte hash, not the string: Jaccard over hashed
    # shingles equals exact Jaccard up to 64-bit collisions (~1e-15 per
    # pair at 10^3 shingles/doc), and the shuffle carries longs instead
    # of n-gram strings.
    a_b = _hash_family(num_hashes)
    sh = (
        shingle_df
        if shingle_df is not None
        else shingles(docs, text_col=text_col, n=n, id_col=id_col)
    ).withColumn("__h0", F.xxhash64("shingle"))
    # The signature derives IN-ROW from the collected hash set:
    # sig[i] = min_h (h·aᵢ + bᵢ) over the per-doc distinct hashes, and
    # min commutes with set collection, so array_min(transform(set))
    # equals the 64 separate min() aggregates bit-for-bit (same
    # wrapping long arithmetic). One agg expression instead of 65
    # keeps the analyzed tree small — the 65-column form spent ~1.5 s
    # per call in Catalyst analysis alone (re-analyzed per DataFrame
    # op), dominating this operator's cost at any data size. The
    # per-element work is identical O(num_hashes·|set|).
    fam = F.array(
        *[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for a, b in a_b
        ]
    )
    per_doc = (
        sh.groupBy(id_col)
        .agg(F.collect_set("__h0").alias("__shset"))
        .select(
            id_col,
            F.transform(
                fam,
                lambda p: F.array_min(
                    F.transform(
                        F.col("__shset"),
                        lambda h: h * p["a"] + p["b"],
                    )
                ),
            ).alias("signature"),
            "__shset",
        )
        .cache()
    )
    sig = per_doc.select(id_col, "signature")
    banded = sig.select(
        id_col,
        "signature",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.element_at("signature", b * rows + r + 1) for r in range(rows)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "signature", "bb.band", "bb.bucket")
    a = banded.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "bucket")
    # Dedup candidates on the bare id pair BEFORE re-attaching the wide
    # signature arrays (hash-aggregating 64-long arrays is needless work).
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # Attach each side's (signature, shingle set) in ONE join per side —
    # est_jaccard and the exact-Jaccard verify happen in the same
    # projection. The verify is O(|candidates|·|set|) via in-row
    # array_intersect, never the all-pairs shingle self-join the exact
    # operator does.
    side_a = per_doc.select(
        F.col(id_col).alias("id_a"),
        F.col("signature").alias("sig_a"),
        F.col("__shset").alias("__sa"),
    )
    side_b = per_doc.select(
        F.col(id_col).alias("id_b"),
        F.col("signature").alias("sig_b"),
        F.col("__shset").alias("__sb"),
    )
    inter = F.size(F.array_intersect("__sa", "__sb")).cast("double")
    union_size = F.size("__sa") + F.size("__sb") - F.size(F.array_intersect("__sa", "__sb"))
    return (
        cand.join(side_a, "id_a")
        .join(side_b, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(
                    F.filter(
                        F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                        lambda m: m,
                    )
                )
                / F.lit(float(num_hashes))
            ).alias("est_jaccard"),
            (inter / union_size).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_pairs_md5(
    docs: DataFrame,
    num_hashes: int = 12,
    bands: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_df: DataFrame | None = None,
    with_exact: bool = False,
) -> DataFrame:
    """MinHash + banded LSH with an md5-string hash family — the
    ORACLE-CHECKABLE variant of ``minhash_lsh_pairs``.

    The production operator's xxhash64 multiply-add family is the
    100 TB fast path but has no DuckDB equivalent, so its driver check
    is rows-only. This variant draws each permutation as
    ``min(md5(i || '|' || shingle))`` — a salted random-oracle
    min-wise family both engines compute bit-identically — so the
    full signature → banding → candidate-join → signature-agreement
    pipeline is pinned value-exact by SQL. Same plan shape as the
    fast path (one shingle aggregate, band equi-join, no all-pairs);
    ~``num_hashes``× the hashing cost, which is why it is the
    correctness witness, not the default.

    Returns (id_a, id_b, est_jaccard) for every banded candidate pair,
    est_jaccard = fraction of agreeing signature positions; with
    ``with_exact`` also the exact shingle-set ``jaccard`` (computed by
    a candidate-scoped join, never all-pairs) for calibration.
    """
    rows = num_hashes // bands
    sh = (
        shingle_df
        if shingle_df is not None
        else shingles(docs, text_col=text_col, n=n, id_col=id_col)
    )
    # cached: the signature frame feeds banding AND both sides of the
    # agreement join — uncached, the num_hashes·|shingles| md5 aggregate
    # re-evaluates three times per enumeration (and callers that
    # symmetrize the pair output would double even that). |docs| rows of
    # 32-char digests — answer-sized, same policy as the xxhash variant.
    per_doc = sh.groupBy(id_col).agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(
                f"h{i}"
            )
            for i in range(num_hashes)
        ]
    ).cache()
    banded = per_doc.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.col(f"h{b * rows + r}")
                                    for r in range(rows)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    a = banded.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "bucket")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    agree = sum(
        F.when(F.col(f"a.h{i}") == F.col(f"b.h{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    est = (
        cand.join(per_doc.alias("a"), F.col("id_a") == F.col(f"a.{id_col}"))
        .join(per_doc.alias("b"), F.col("id_b") == F.col(f"b.{id_col}"))
        .select(
            "id_a",
            "id_b",
            (agree / F.lit(float(num_hashes))).alias("est_jaccard"),
        )
    )
    if not with_exact:
        return est
    # exact Jaccard for the CANDIDATE pairs only (calibration ground
    # truth): common-shingle counts via a candidate-scoped equi-join —
    # never the all-pairs shingle self-join
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    sh_a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    sh_b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        cand.join(sh_a, "id_a")
        .join(sh_b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    c = F.coalesce(F.col("common"), F.lit(0))
    return (
        est.join(common, ["id_a", "id_b"], "left")
        .join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            "est_jaccard",
            (c.cast("double") / (F.col("na") + F.col("nb") - c)).alias(
                "jaccard"
            ),
        )
    )


def connected_components(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b", max_iter: int = 25
) -> DataFrame:
    """Connected components over a near-dup pair graph → (id, cluster_id)
    with cluster_id = min member id.

    Pregel-style min-label propagation on DataFrames: each round joins
    the symmetric edge list against current labels and takes the
    per-node min. Rounds needed = cluster diameter — near-dup clusters
    are shallow (a handful of hops), so this converges in a few rounds;
    `localCheckpoint` after every round truncates the lineage so the
    plan does not grow with iterations (the standard failure mode of
    iterative DataFrame algorithms). All steps are hash joins/aggs on
    (id, label) pairs — shuffle is O(|edges|) per round, nothing
    quadratic, and driver involvement is one boolean convergence probe
    per round.
    """
    from open_source_financial_time_series_data_pipeline_architecture_spark.operators.graph import (
        _INTEGRAL,
        _label_sum,
    )

    # one-pass symmetrization (the two-select union evaluated the pair
    # enumeration subtree twice) + checkpoint so every round reads the
    # materialized edge list
    sym = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
                    ),
                    F.struct(
                        F.col(id_b).alias("src"), F.col(id_a).alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .localCheckpoint(eager=True)
    )
    # fused round-0 hop: min(id, min neighbor) ≡ first propagation over
    # identity labels (every vertex appears as src in the symmetric list)
    labels = (
        sym.groupBy(F.col("src").alias("id"))
        .agg(F.min("dst").alias("__m"))
        .select("id", F.least(F.col("id"), F.col("__m")).alias("label"))
        .localCheckpoint(eager=True)
    )
    integral = isinstance(pairs.schema[id_a].dataType, _INTEGRAL)
    prev_sum = _label_sum(labels) if integral else None
    for _ in range(max_iter):
        prop = sym.join(labels, sym["dst"] == labels["id"]).select(
            sym["src"].alias("id"), F.col("label")
        )
        new_labels = (
            labels.unionByName(prop)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            # lazy: the convergence probe materializes it
            .localCheckpoint(eager=False)
        )
        if integral:
            # labels are monotone non-increasing → an exact decimal sum
            # is a "did anything move" fingerprint (one scan, no join)
            cur_sum = _label_sum(new_labels)
            improved = int(cur_sum != prev_sum)
            prev_sum = cur_sum
        else:
            improved = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.label") < F.col("o.label"))
                .limit(1)
                .count()
            )
        labels = new_labels
        if improved == 0:
            break
    return labels.select("id", F.col("label").alias("cluster_id"))


def dedup_cluster_assignments(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Full corpus-dedup decision: every document → its near-dup cluster
    (cluster_id = min doc id in the component; singletons are their own
    cluster) plus the keep/drop flag ``is_canonical``.

    This is the step that turns a pair list into an actionable training
    corpus: keep `is_canonical`, drop the rest. Pair generation defaults
    to exact n-gram Jaccard (the oracle path); pass ``pairs`` from
    `minhash_lsh_pairs` for the 100 TB path — the clustering is
    identical either way.
    """
    p = (
        pairs
        if pairs is not None
        else ngram_jaccard_pairs(docs, n, threshold, text_col, id_col)
    )
    cc = connected_components(p)
    return (
        docs.select(id_col)
        .join(cc, docs[id_col] == cc["id"], "left")
        .select(
            F.col(id_col),
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("is_canonical", F.col(id_col) == F.col("cluster_id"))
    )


def simhash64(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash over word unigrams: bit j of the fingerprint is
    the majority vote of bit j across xxhash64(word) for all words.

    Pure higher-order functions (no UDF): per-word hash → per-bit ±1
    contributions aggregated with explode + groupBy.
    """
    words = docs.select(
        id_col, F.explode(F.split(_norm_text(text_col), " ")).alias("w")
    )
    hashed = words.select(id_col, F.xxhash64("w").alias("h"))
    bit_sums = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(64)
        ]
    )
    # shiftleft + bitwise OR materializes ALL 64 bits: shiftleft(1, 63)
    # wraps to the sign bit (Java shift semantics), so bit 63 is real —
    # a multiply-add by 2^63 would overflow the long literal instead
    fp_expr = F.lit(0).cast("long")
    for j in range(64):
        bit = F.when(F.col(f"b{j}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fp_expr = fp_expr.bitwiseOR(F.shiftleft(bit, j))
    fp = bit_sums.select(id_col, fp_expr.alias("simhash"))
    return fp


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Pigeonhole blocking: split the 64-bit fingerprint into
    (max_hamming+1) bands — two fingerprints within the distance budget
    must agree exactly on ≥1 band, so candidates come from band
    equi-joins, not an all-pairs comparison.
    """
    nbands = max_hamming + 1
    width = 64 // nbands
    fp = simhash64(docs, text_col, id_col).cache()
    banded = fp.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for b in range(nbands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "simhash", "bb.band", "bb.key")
    a = banded.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("fp_a"), "band", "key")
    b = banded.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("fp_b"), "band", "key")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "fp_a", "fp_b")
        .distinct()
    )
    return cand.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def simhash_pairs_md5(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    nbits: int = 32,
) -> DataFrame:
    """SimHash near-dup pairs with an md5-derived bit source — the
    ORACLE-CHECKABLE variant of ``simhash_pairs``.

    Same algorithm (per-bit majority vote over word hashes, pigeonhole
    banding, exact Hamming verify) but the per-word hash is the first
    8 hex chars of md5(word) parsed as an integer, which DuckDB
    computes bit-identically (``('0x' || substr(md5(w),1,8))::BIGINT``)
    — so fingerprints, candidate bands and Hamming distances are all
    pinned value-exact by SQL. xxhash64 stays the production bit
    source (one 64-bit hash vs md5's digest cost).

    Returns (id_a, id_b, hamming) with hamming ≤ max_hamming.
    """
    nbands = max_hamming + 1
    width = nbits // nbands
    words = docs.select(
        id_col, F.explode(F.split(_norm_text(text_col), " ")).alias("w")
    )
    v = F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long")
    hashed = words.select(id_col, v.alias("h"))
    bit_sums = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(nbits)
        ]
    )
    fp_expr = F.lit(0).cast("long")
    for j in range(nbits):
        bit = F.when(F.col(f"b{j}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fp_expr = fp_expr.bitwiseOR(F.shiftleft(bit, j))
    fp = bit_sums.select(id_col, fp_expr.alias("simhash"))
    banded = fp.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for b in range(nbands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "simhash", "bb.band", "bb.key")
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("fp_a"), "band", "key"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("fp_b"), "band", "key"
    )
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "fp_a", "fp_b")
        .distinct()
    )
    return cand.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
        .cast("long")
        .alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def embedding_cosine_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup pairs by embedding cosine similarity ≥ threshold.

    Brute-force all-pairs (id_a < id_b) — correct baseline; the scale
    path is `similarity.lsh_bucketed_pairs` (random-projection blocking).
    """
    from ..functions.vector import cosine_similarity

    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a", "id_b", cosine_similarity("va", "vb").alias("cosine")
    ).filter(F.col("cosine") >= threshold)


def containment_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: int | None = 20,
    shingle_df: DataFrame | None = None,
) -> DataFrame:
    """Directional near-dup detection by n-gram CONTAINMENT
    C(A,B) = |A∩B| / |A| — the asymmetric companion to Jaccard that
    catches a short document embedded inside a long one (quote-and-
    expand spam, boilerplate wrappers), which symmetric Jaccard misses
    because the union is dominated by the long side.

    Emits (id_a < id_b) pairs where EITHER direction's containment
    reaches ``threshold``, with both directions reported. Same
    hot-shingle DF cap and in-row posting-list pair expansion as
    ``ngram_jaccard_pairs`` — candidate shuffle is bounded by
    C(max_doc_freq, 2) per shingle, never all pairs.
    """
    sh = (
        shingle_df
        if shingle_df is not None
        else shingles(docs, text_col=text_col, n=n, id_col=id_col)
    )
    posting = sh.groupBy("shingle").agg(
        F.sort_array(F.collect_list(id_col)).alias("ids")
    )
    if max_doc_freq is not None:
        # same canonicalized plan as ngram_jaccard_pairs' capped
        # posting frame -> CacheManager shares ONE entry between the
        # Jaccard and containment paths (and between this function's
        # own sizes and pair legs)
        posting = posting.filter(F.size("ids") <= max_doc_freq).cache()
    sizes = (
        posting.select(F.explode("ids").alias(id_col))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shingles"))
    )
    pair_expr = F.expr(
        "flatten(transform(ids, (a, i) -> "
        "transform(slice(ids, i + 2, size(ids)), "
        "b -> struct(a AS id_a, b AS id_b))))"
    )
    common = (
        posting.select(F.explode(pair_expr).alias("p"))
        .select("p.id_a", "p.id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("nb"))
    out = (
        common.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("common") / F.col("na")).alias("containment_ab"),
            (F.col("common") / F.col("nb")).alias("containment_ba"),
        )
    )
    return out.filter(
        (F.col("containment_ab") >= threshold)
        | (F.col("containment_ba") >= threshold)
    )


def cross_source_overlap(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    chunk_words: int = 10,
) -> DataFrame:
    """Source-pair contamination matrix: for every pair of sources, how
    many distinct ``chunk_words``-word passage fingerprints appear in
    BOTH — the "is corpus B partly a re-crawl of corpus A?" screen run
    before mixing sources into a training blend. Chunk granularity
    (same positional chunking as ``boilerplate_chunks``) catches shared
    passages whole-document hashing misses.

    One narrow (source, md5(chunk)) projection → distinct →
    self-equi-join on fingerprint (sources per fingerprint are few, so
    the join output is near-linear) → count per ordered pair, with
    per-source distinct totals broadcast back for the overlap ratio.
    """
    base = docs.select(
        F.col(source_col).alias("source"),
        F.split(F.trim(F.col(text_col)), " +").alias("__ws"),
    )
    cw = chunk_words
    # __ws is a projected column, so the lambda does not re-evaluate
    # the split per element (CLAUDE.md).
    chunk_fps = F.when(
        F.size("__ws") >= cw,
        F.transform(
            F.sequence(
                F.lit(0).cast("long"),
                (F.floor(F.size("__ws") / cw) - 1).cast("long"),
            ),
            lambda c: F.md5(F.array_join(F.slice("__ws", c * cw + 1, cw), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    fp = base.select(
        "source", F.explode(chunk_fps).alias("fingerprint")
    ).distinct()
    totals = fp.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_distinct")
    )
    a = fp.select(F.col("source").alias("source_a"), "fingerprint")
    b = fp.select(F.col("source").alias("source_b"), "fingerprint")
    shared = (
        a.join(b, "fingerprint")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    ta = totals.select(
        F.col("source").alias("source_a"), F.col("n_distinct").alias("na")
    )
    tb = totals.select(
        F.col("source").alias("source_b"), F.col("n_distinct").alias("nb")
    )
    return (
        shared.join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "na",
            "nb",
            F.round(
                F.col("n_shared") / F.least(F.col("na"), F.col("nb")), 6
            ).alias("overlap_ratio"),
        )
    )
