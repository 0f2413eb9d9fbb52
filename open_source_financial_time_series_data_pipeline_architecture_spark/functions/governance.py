"""Security / governance operators (SURVEY §2.12 V1–V3).

- V1 row-level security → filter-injected views (the reference enables
  Postgres RLS with a tenant policy,
  /root/reference/sql/timescaledb_schema.sql:418-436 and
  src/security/rls_encryption_audit.py:19-45). Spark has no row
  policies; the equivalent is a view/DataFrame wrapper that injects the
  tenant predicate before any user expression — Catalyst then pushes it
  into the scan, so isolation also prunes partitions.
- V2 audit log → append-only parquet table
  (src/security/rls_encryption_audit.py:47-120).
- V3 field encryption → built-in aes_encrypt/aes_decrypt
  (src/security/rls_encryption_audit.py:122-160; pgcrypto equivalent).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tenant_view(
    df: DataFrame, tenant_col: str, allowed_tenants: list
) -> DataFrame:
    """V1 — RLS-equivalent tenant filter. Apply BEFORE handing the
    DataFrame to tenant code; the predicate lands in the parquet scan
    (PushedFilters), so cross-tenant rows are never materialized."""
    return df.filter(F.col(tenant_col).isin(allowed_tenants))


def register_tenant_view(
    spark: SparkSession,
    source_view: str,
    view_name: str,
    tenant_col: str,
    allowed_tenants: list,
) -> None:
    """SQL-side variant of `tenant_view`.

    Security note: the predicate is built with column EXPRESSIONS
    (`isin`), never interpolated SQL text — a tenant value containing a
    quote is just a value, not a way out of the RLS predicate. The
    identifiers still land in SQL (view names can't be parameterized),
    so they are validated against a strict identifier charset.
    """
    for ident in (source_view, view_name, tenant_col):
        if not ident.replace("_", "").isalnum() or ident[0].isdigit():
            raise ValueError(f"invalid identifier: {ident!r}")
    spark.table(source_view).filter(
        F.col(tenant_col).isin(allowed_tenants)
    ).createOrReplaceTempView(view_name)


AUDIT_SCHEMA = (
    "audit_time timestamp, actor string, action string, object string, "
    "detail string"
)


def audit_entry(
    spark: SparkSession, actor: str, action: str, obj: str, detail: str = ""
) -> DataFrame:
    return spark.createDataFrame(
        [(_dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None), actor, action, obj, detail)],
        AUDIT_SCHEMA,
    )


def append_audit(entry: DataFrame, audit_dir: str) -> None:
    """V2 — append-only audit table (no updates, no deletes)."""
    entry.write.mode("append").parquet(audit_dir)


def encrypt_column(
    df: DataFrame, col: str, key: str, mode: str = "GCM"
) -> DataFrame:
    """V3 — AES field encryption. GCM (default) is randomized —
    semantically secure but non-deterministic; use mode='ECB' only when
    a deterministic cyphertext is required for equality joins (the
    classic deterministic-encryption tradeoff)."""
    # column-form aes_encrypt: the key is a bound literal, NOT SQL text —
    # it never appears in query plans, EXPLAIN output, or logs
    return df.withColumn(
        col,
        F.aes_encrypt(
            F.col(col).cast("string"), F.lit(key), F.lit(mode)
        ),
    )


def decrypt_column(
    df: DataFrame, col: str, key: str, mode: str = "GCM"
) -> DataFrame:
    return df.withColumn(
        col,
        F.aes_decrypt(F.col(col), F.lit(key), F.lit(mode)).cast("string"),
    )


# -- PII / secret pattern scanning (training-data governance) ---------------
#
# RE2-compatible patterns only (no lookaround/backreferences) so the
# same literal runs identically under Spark's Java regex and the DuckDB
# oracle's RE2. Keys are stable labels carried into the scan output.
PII_PATTERNS: dict[str, str] = {
    "digit_run": "[0-9]{4,}",
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "id_token": "[A-Za-z]+#[0-9]+",
}


def pii_scan(
    sources: list[tuple[str, DataFrame, str]],
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Pattern-scan text columns across tables: one full-column pass per
    table computes rows-matched and total-matches for EVERY pattern at
    once (all regexp_count expressions share the scan, column pruning
    reaches parquet), then the per-table 1-row aggregates are exploded
    to long format and unioned — the union is over tiny aggregated
    frames, never raw data.

    ``sources``: (label, df, text_column) triples.
    Returns (src, pattern, rows_matched, total_matches).
    """
    patterns = patterns or PII_PATTERNS
    parts = []
    for label, df, col in sources:
        aggs = []
        for i, pat in enumerate(patterns.values()):
            n = F.regexp_count(F.col(col), F.lit(pat))
            aggs.append(
                F.count(F.when(n > 0, F.lit(1))).cast("long").alias(f"rm_{i}")
            )
            aggs.append(
                F.coalesce(F.sum(n), F.lit(0)).cast("long").alias(f"tm_{i}")
            )
        wide = df.agg(*aggs)
        rows = F.array(
            *[
                F.struct(
                    F.lit(name).alias("pattern"),
                    F.col(f"rm_{i}").alias("rows_matched"),
                    F.col(f"tm_{i}").alias("total_matches"),
                )
                for i, name in enumerate(patterns)
            ]
        )
        parts.append(
            wide.select(F.lit(label).alias("src"), F.inline(rows))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def redact_digit_runs(
    df: DataFrame, col: str, keep_last: int = 4, min_len: int = 4
) -> DataFrame:
    """Redaction primitive: pull the first long digit run out of ``col``
    and emit a masked form that keeps only the last ``keep_last``
    digits (`*****0042`). Pure built-in expressions — no UDF."""
    run = F.regexp_extract(F.col(col), f"([0-9]{{{min_len},}})", 1)
    masked = F.when(
        run == "", F.lit(None).cast("string")
    ).otherwise(
        F.concat(
            F.repeat(
                F.lit("*"),
                F.greatest(F.length(run) - keep_last, F.lit(0)),
            ),
            run.substr(-keep_last, keep_last),
        )
    )
    return df.withColumn("digit_run", F.nullif(run, F.lit(""))).withColumn(
        "masked_run", masked
    )


def dp_laplace_noise(seed, scale: float):
    """Deterministic seeded Laplace(scale) noise as a Column — the
    ε-differential-privacy mechanism with a REPRODUCIBLE draw: the
    uniform comes from the first 8 hex digits of md5(seed) (exactly the
    repo's salted-md5 witness family), mapped by the Laplace inverse
    CDF  noise = −b·sign(u)·ln(1 − 2|u|),  u ∈ (−½, ½).

    u = (v + 0.5) / 2³² − 0.5 keeps |u| strictly below ½ (no ln(0))
    and never exactly 0 (v is an integer, so v + 0.5 ≠ 2³¹) — the
    formula is total. Determinism is what makes a DP release AUDITABLE
    (and DuckDB-witnessable) while remaining a faithful Laplace draw:
    the seed acts as the mechanism's recorded randomness, per-key
    unique so draws are independent across keys."""
    v = F.conv(F.substring(F.md5(seed), 1, 8), 16, 10).cast("bigint")
    u = (v + F.lit(0.5)) / F.lit(4294967296.0) - F.lit(0.5)
    return -F.lit(scale) * F.signum(u) * F.log(1.0 - 2.0 * F.abs(u))


def dp_release(
    df: DataFrame,
    group_col: str,
    value_col: str,
    epsilon: float = 1.0,
    value_cap: float = 100.0,
    seed: str = "dp-v1",
) -> DataFrame:
    """ε-differentially-private per-group release of a COUNT and a
    clipped SUM (the two workhorse DP aggregates): the privacy budget
    splits evenly, each statistic gets Laplace noise calibrated to its
    sensitivity (count: 1; sum: ``value_cap`` after per-row clipping —
    clipping is what BOUNDS the sensitivity, the textbook mechanism).
    One hash aggregate + map-side noise — scales like any groupBy.

    Returns exact n/sum alongside the noisy values (callers drop the
    exact columns before publishing; keeping them here makes the
    mechanism testable) plus the per-statistic epsilon."""
    eps_each = epsilon / 2.0
    clipped = F.least(
        F.greatest(F.col(value_col).cast("double"), F.lit(0.0)),
        F.lit(float(value_cap)),
    )
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact"),
        F.sum(clipped).alias("sum_clipped"),
    )
    return agg.select(
        group_col,
        "n_exact",
        (
            F.col("n_exact")
            + dp_laplace_noise(
                F.concat(F.lit(f"{seed}-count-"), F.col(group_col)),
                1.0 / eps_each,
            )
        ).alias("dp_count"),
        F.col("sum_clipped"),
        (
            F.col("sum_clipped")
            + dp_laplace_noise(
                F.concat(F.lit(f"{seed}-sum-"), F.col(group_col)),
                float(value_cap) / eps_each,
            )
        ).alias("dp_sum"),
        F.lit(eps_each).alias("epsilon_count"),
        F.lit(eps_each).alias("epsilon_sum"),
    )


# ---------------------------------------------------------------------------
# Reproducible-training manifest (reference src/modeling/
# train_reproducible.py:53-96: compute_data_hash / compute_schema_hash
# pin the EXACT dataset a model saw). The reference hashes the CSV
# serialization — order-dependent and single-node. Redesign for scale:
# an ORDER-INDEPENDENT content fingerprint (bit_xor fold of per-row
# md5 words — commutative, map-side combinable, one hash aggregate at
# any data size) plus a deterministic content-hash train/val split
# (md5-bucketed — the seed-pinning analog: re-running the pipeline on
# the same rows reproduces the same split with NO RNG state at all).
# ---------------------------------------------------------------------------


def dataset_fingerprint(
    df: DataFrame,
    canon_cols: list,
    split_col: str,
    split_buckets: int = 5,
    train_buckets: int = 4,
) -> DataFrame:
    """One row per split + an ``all`` rollup row: ``(split, n_rows,
    content_xor32, t_min_us, t_max_us, schema_hash)``.

    ``canon_cols`` are pre-canonicalized Columns (strings/bigints —
    the caller fixes float formatting before hashing); each row hashes
    to the first 32 bits of md5(concat_ws('|', ...)), and the dataset
    fingerprint is the bit_xor fold — any row change, add, or drop
    flips it (note: xor cancels EXACT duplicate rows pairwise; feed a
    unique key among ``canon_cols``, as any training manifest should).
    ``schema_hash`` = md5 of the canonical (name, type) list in field
    order — the drift tripwire for the feature contract."""
    import hashlib
    import json

    schema_canon = json.dumps(
        [[f.name, f.dataType.simpleString()] for f in df.schema.fields]
    )
    schema_hash = hashlib.md5(schema_canon.encode()).hexdigest()
    canon = F.concat_ws("|", *canon_cols)
    row_h = F.conv(F.substring(F.md5(canon), 1, 8), 16, 10).cast("long")
    split_b = F.conv(
        F.substring(F.md5(F.col(split_col)), 1, 2), 16, 10
    ).cast("long") % split_buckets
    split = F.when(split_b < train_buckets, "train").otherwise("val")
    tu = F.unix_micros(F.col("time"))
    return (
        df.select(
            split.alias("split"), row_h.alias("h"), tu.alias("tu")
        )
        .rollup("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.expr("bit_xor(h)").cast("bigint").alias("content_xor32"),
            F.min("tu").alias("t_min_us"),
            F.max("tu").alias("t_max_us"),
        )
        .select(
            F.coalesce(F.col("split"), F.lit("all")).alias("split"),
            "n_rows",
            "content_xor32",
            "t_min_us",
            "t_max_us",
            F.lit(schema_hash).alias("schema_hash"),
        )
    )
