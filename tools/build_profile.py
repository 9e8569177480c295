#!/usr/bin/env python
"""Per-query build/plan/execute decomposition (optimization-round guide §1).

For every registered query (or a --only subset), measures on a warm session:

- ``build_s``  — Python-side DataFrame construction (the registered callable;
  includes any sizing jobs the builder legitimately runs, e.g. the iterative
  loops' convergence counts),
- ``plan_s``   — Catalyst analysis + optimization + physical planning
  (``df._jdf.queryExecution().executedPlan()``; with AQE this stops at the
  AdaptiveSparkPlan wrapper, i.e. no stages run),
- ``exec_s``   — the noop-sink write minus the already-paid build (the same
  timed action bench.py uses).

Each phase is min-of-N (default 2) with the FIRST full pass discarded as
warmup, mirroring bench.py's min-of-interleaved methodology. Output: one JSON
line per query plus a sorted summary to stdout; optionally a JSON file via
--out.

Usage:
    python tools/build_profile.py [--only q1,q2] [--runs 2] [--out f.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default="")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from distributed_system_mapreduce_spark.registry import QUERIES
    from distributed_system_mapreduce_spark.session import get_spark

    names = sorted(
        n for n in args.only.split(",") if n
    ) or sorted(QUERIES)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("dsmr-build-profile", cpus=cpus,
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm pass (codegen cache, tracked caches, JVM classloading) — discarded
    for n in names:
        QUERIES[n](spark, args.sf_dir).write.format("noop").mode(
            "overwrite").save()

    rows: dict[str, dict] = {
        n: {"build_s": [], "plan_s": [], "exec_s": []} for n in names
    }
    for _ in range(args.runs):
        for n in names:
            t0 = time.perf_counter()
            df = QUERIES[n](spark, args.sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            rows[n]["build_s"].append(t1 - t0)
            rows[n]["plan_s"].append(t2 - t1)
            rows[n]["exec_s"].append(t3 - t2)

    out: dict[str, dict] = {}
    for n in names:
        out[n] = {k: round(min(v), 3) for k, v in rows[n].items()}
        out[n]["total_s"] = round(sum(out[n].values()), 3)
    for n in sorted(out, key=lambda n: -out[n]["total_s"]):
        print(json.dumps({n: out[n]}))
    tot = {
        k: round(sum(out[n][k] for n in out), 2)
        for k in ("build_s", "plan_s", "exec_s", "total_s")
    }
    print(json.dumps({"SUM": tot, "n": len(out)}))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump({"totals": tot, "queries": out}, fh, indent=1,
                      sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
