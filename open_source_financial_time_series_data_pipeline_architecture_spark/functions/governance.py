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
    """SQL-side variant: CREATE VIEW ... WHERE tenant IN (...)."""
    quoted = ", ".join(
        f"'{t}'" if isinstance(t, str) else str(t) for t in allowed_tenants
    )
    spark.sql(
        f"CREATE OR REPLACE TEMP VIEW {view_name} AS "
        f"SELECT * FROM {source_view} WHERE {tenant_col} IN ({quoted})"
    )


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
    return df.withColumn(
        col,
        F.expr(f"aes_encrypt(cast({col} as string), '{key}', '{mode}')"),
    )


def decrypt_column(
    df: DataFrame, col: str, key: str, mode: str = "GCM"
) -> DataFrame:
    return df.withColumn(
        col, F.expr(f"cast(aes_decrypt({col}, '{key}', '{mode}') as string)")
    )
