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
