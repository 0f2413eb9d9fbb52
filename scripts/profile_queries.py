#!/usr/bin/env python
"""Per-query profiling harness for the optimization rounds.

For each named query: time DataFrame CONSTRUCTION (driver-side python +
analysis work, e.g. versioned-manifest replay) separately from EXECUTION
(noop sink), best-of-N each, and dump `.explain("formatted")` to
plans/<round>/<name>_<tag>.txt.

Usage:
  python scripts/profile_queries.py --tag before --round r09 q1 q2 ...
  python scripts/profile_queries.py --tag before --round r09 --top 20
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from open_source_financial_time_series_data_pipeline_architecture_spark.session import (
    default_parallelism,
    get_spark,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--round", dest="round_", default="r09")
    ap.add_argument("--top", type=int, default=0,
                    help="profile the N most expensive BENCH_FULL.json rows")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod

    names = list(args.names)
    if args.top:
        full = json.load(open(os.path.join(REPO, "BENCH_FULL.json")))
        ranked = sorted(full["queries"].items(), key=lambda kv: -kv[1])
        names += [n for n, _ in ranked[: args.top] if n not in names]

    spark = get_spark(app_name="fts-profile",
                      master=f"local[{default_parallelism()}]")
    queries = entry_mod.queries()
    plans_dir = os.path.join(REPO, "plans", args.round_)
    os.makedirs(plans_dir, exist_ok=True)

    # warmup
    queries["vwap_5m"](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    results = {}
    for name in names:
        if name not in queries:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext._jvm.System.gc()
        best_build = best_exec = float("inf")
        df = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            df = queries[name](spark, SF_DIR)
            t1 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"profile:{name}")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            spark.sparkContext.setJobDescription(None)
            best_build = min(best_build, t1 - t0)
            best_exec = min(best_exec, t2 - t1)
        if not args.no_plans:
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        results[name] = {"build_s": round(best_build, 3),
                         "exec_s": round(best_exec, 3),
                         "total_s": round(best_build + best_exec, 3)}
        print(f"{name:45s} build {best_build:7.3f}  exec {best_exec:7.3f}")

    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
