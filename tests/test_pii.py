"""PII detection/redaction: pattern correctness on crafted strings,
non-overlap between types, and the Spark↔DuckDB dialect contract."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.functions import pii as P

CASES = [
    # (text, expected counts per type, expected redaction)
    (
        "mail a.b+c@sub.example.org now",
        {"email": 1, "ssn": 0, "phone": 0, "ipv4": 0},
        "mail [EMAIL] now",
    ),
    (
        "ssn 123-45-6789 phone 555-010-1234 ip 10.0.0.1",
        {"email": 0, "ssn": 1, "phone": 1, "ipv4": 1},
        "ssn [SSN] phone [PHONE] ip [IP]",
    ),
    (
        "no pii here just words 12345",
        {"email": 0, "ssn": 0, "phone": 0, "ipv4": 0},
        "no pii here just words 12345",
    ),
    (  # a phone is NOT an ssn and vice versa (3-3-4 vs 3-2-4)
        "x 555-010-1234 y 123-45-6789 z",
        {"email": 0, "ssn": 1, "phone": 1, "ipv4": 0},
        "x [PHONE] y [SSN] z",
    ),
    (  # \b anchoring: no boundary between 'v' and '1', so the match
        # starts at the first boundary-preceded quad (2.3.4.5)
        "v1.2.3.4.5 stays",
        {"email": 0, "ssn": 0, "phone": 0, "ipv4": 1},
        "v1.[IP] stays",
    ),
    (
        "two mails a@b.io c@d.io",
        {"email": 2, "ssn": 0, "phone": 0, "ipv4": 0},
        "two mails [EMAIL] [EMAIL]",
    ),
]


def test_counts_and_redaction_spark(spark):
    df = spark.createDataFrame([(i, t) for i, (t, _, _) in enumerate(CASES)], "i int, t string")
    cols = P.pii_counts(F.col("t"))
    out = df.select(
        "i",
        P.redact(F.col("t")).alias("red"),
        *[c.alias(n) for n, c in cols.items()],
    ).orderBy("i").collect()
    for row, (text, want, red) in zip(out, CASES):
        got = {n: row[n] for n in P.PII_PATTERNS}
        assert got == want, f"{text!r}: {got} != {want}"
        assert row["red"] == red, f"{text!r}: {row['red']!r}"


def test_duckdb_dialect_agrees():
    con = duckdb.connect()
    for text, want, red in CASES:
        lit = text.replace("'", "''")
        for name, sql in P.counts_sql(f"'{lit}'").items():
            got = con.execute(f"SELECT {sql}").fetchone()[0]
            assert got == want[name], (text, name, got)
        got_red = con.execute(
            f"SELECT {P.redact_sql(repr(text))}"
        ).fetchone()[0]
        assert got_red == red, (text, got_red)
