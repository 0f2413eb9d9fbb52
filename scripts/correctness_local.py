#!/usr/bin/env python
"""Driver-replica correctness sweep over EVERY registered query.

The driver's gate (CORRECTNESS_r{N}.json) hash-checks only the first 50
``queries()`` entries.  This script runs the SAME comparison — strict
harness: value-exact, dtype-kind-exact, ns-preserving timestamps,
array/-0.0 hazards rejected — for ALL queries at sf0.01 and writes
``CORRECTNESS_LOCAL.json`` in the driver's row format, so the
correctness of the other 300+ queries is machine-readable and
reproducible, not just a pytest pass count.

Usage:  python scripts/correctness_local.py  [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    import __spark_entry__ as entry_mod
    from open_source_financial_time_series_data_pipeline_architecture_spark.session import (
        default_parallelism,
        get_spark,
    )
    from tests.oracle_harness import compare_frames, duckdb_con

    spark = get_spark(
        app_name="correctness-local",
        master=f"local[{default_parallelism()}]",
    )
    con = duckdb_con(SF_DIR)
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    out: dict[str, dict] = {}
    n_pass = n_fail = n_rows_only = 0
    for name, fn in queries.items():
        row = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            df = fn(spark, SF_DIR)
            if name not in oracles:
                row["spark_rows"] = df.count()
                row["err"] = "no_oracle"
                n_rows_only += 1
            else:
                # strict compare raises on ANY divergence the driver
                # hash would see; both sides execute exactly ONCE and
                # the recorded counts come from the compared frames
                got = df.toPandas()
                exp = con.execute(oracles[name]).df()
                row["spark_rows"] = len(got)
                row["oracle_rows"] = len(exp)
                compare_frames(got, exp, name)
                row["rows_match"] = row["schema_match"] = row["hash_match"] = True
                n_pass += 1
        except Exception as exc:  # record, keep sweeping
            msg = (str(exc).splitlines() or [""])[0][:300] or type(exc).__name__
            if row["err"] != "no_oracle":
                row["err"] = msg
                if row["spark_rows"] is not None and row["oracle_rows"] is not None:
                    row["rows_match"] = row["spark_rows"] == row["oracle_rows"]
                row["hash_match"] = False
                n_fail += 1
        out[name] = row
        status = row["err"] or ("pass" if row["hash_match"] else "?")
        print(f"{name}: {status}", flush=True)
    with open(os.path.join(REPO, "CORRECTNESS_LOCAL.json"), "w") as fh:
        json.dump(
            {
                "sf_dir": SF_DIR,
                "n_queries": len(out),
                "n_hash_pass": n_pass,
                "n_fail": n_fail,
                "n_rows_only": n_rows_only,
                "rows": out,
            },
            fh,
            indent=1,
        )
    print(
        f"TOTAL {len(out)} queries: {n_pass} hash-pass, "
        f"{n_fail} fail, {n_rows_only} rows-only"
    )
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
