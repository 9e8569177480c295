#!/usr/bin/env python
"""Registry-wide oracle parity at sf0.1 — 10x the driver's check scale.

The driver and tests/test_parity.py hash-compare every oracled query at
sf0.01. Several operators have SCALE-DEPENDENT behavior that both engines
mirror (hot-shingle stop-lists that only trip past a document-frequency
cap, salted-top-k bucket survivors, AQE join-strategy flips): a sweep at
sf0.1 exercises those branches on real data volumes the small fixture
cannot reach. This tool runs the full compare at sf0.1 with a per-query
wall budget (some recursive-CTE oracles — reachability closures — are
quadratic in DuckDB and are expected to blow the budget; a timeout is
recorded as SKIPPED, not failed, and the Spark side is still executed so
a Spark-side crash at scale would surface).

Usage: python tools/parity_bigsf.py [--sf-dir /root/testdata/sf0.1]
           [--budget 120] [--out /tmp/PARITY_SF01.json]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import queue as queue_mod
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _oracle_worker(sql: str, sf_dir: str, out_path: str, q):
    """DuckDB side in a subprocess so a runaway recursive CTE can be
    killed without taking the sweep down.

    The result parquet is written to ``out_path`` and only the PATH goes
    on the queue: putting the bytes themselves deadlocks when the payload
    exceeds the OS pipe buffer (~64 KB — any full-scan query at sf0.1),
    because the mp.Queue feeder thread blocks and the child never exits
    while the parent sits in proc.join() (ADVICE r14, medium).
    """
    try:
        from distributed_system_mapreduce_spark.testing import duck_connection

        con = duck_connection(sf_dir)
        df = con.execute(sql).df()
        df.to_parquet(out_path)
        q.put(("ok", out_path))
    except Exception as ex:  # noqa: BLE001
        q.put(("err", f"{type(ex).__name__}: {str(ex)[:200]}"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--budget", type=float, default=120.0)
    ap.add_argument("--out", default="/tmp/PARITY_SF01.json")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    import pandas as pd

    from distributed_system_mapreduce_spark.registry import ORACLES, QUERIES
    from distributed_system_mapreduce_spark.session import get_spark
    from distributed_system_mapreduce_spark.testing import compare_frames
    from distributed_system_mapreduce_spark.cache import clear_tracked_caches

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("dsmr-parity-sf01", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    names = (
        [n for n in args.only.split(",") if n]
        if args.only
        else sorted(QUERIES)
    )
    results: dict[str, dict] = {}
    n_ok = n_skip = n_fail = n_rows_only = 0
    tmp_dir = tempfile.mkdtemp(prefix="parity_sf01_")
    for name in names:
        t0 = time.perf_counter()
        rec: dict = {}
        try:
            sdf = QUERIES[name](spark, args.sf_dir).toPandas()
            rec["spark_rows"] = int(len(sdf))
            rec["spark_s"] = round(time.perf_counter() - t0, 2)
        except Exception as ex:  # noqa: BLE001
            rec["err"] = f"spark: {type(ex).__name__}: {str(ex)[:200]}"
            results[name] = rec
            n_fail += 1
            print(json.dumps({name: rec}), flush=True)
            continue
        if name not in ORACLES:
            rec["err"] = "no_oracle"
            n_rows_only += 1
            results[name] = rec
            continue
        q: mp.Queue = mp.Queue()
        tmp_path = os.path.join(tmp_dir, f"{name}.parquet")
        proc = mp.Process(
            target=_oracle_worker,
            args=(ORACLES[name], args.sf_dir, tmp_path, q),
        )
        proc.start()
        # Drain the queue while the worker runs (never a blind join-then-get:
        # a worker killed before putting anything — OOM on a runaway CTE —
        # would make an unconditional q.get() hang the sweep; ADVICE r14 low).
        deadline = time.monotonic() + args.budget
        outcome = None
        while outcome is None:
            try:
                outcome = q.get(timeout=1.0)
            except queue_mod.Empty:
                if not proc.is_alive():
                    # crashed without reporting (segfault / OOM-kill)
                    outcome = (
                        "err",
                        f"oracle worker died, exitcode={proc.exitcode}",
                    )
                elif time.monotonic() > deadline:
                    break
        if outcome is None:
            proc.terminate()
            proc.join()
            rec["err"] = "oracle_timeout"
            n_skip += 1
        else:
            proc.join(10)
            if proc.is_alive():
                proc.terminate()
                proc.join()
            status, payload = outcome
            if status == "err":
                rec["err"] = f"oracle: {payload}"
                n_fail += 1
            else:
                odf = pd.read_parquet(payload)
                os.unlink(payload)
                problems = compare_frames(sdf, odf, name)
                if problems:
                    rec["err"] = "; ".join(problems)[:300]
                    n_fail += 1
                else:
                    n_ok += 1
        results[name] = rec
        if rec.get("err") and rec["err"] != "no_oracle":
            print(json.dumps({name: rec}), flush=True)
        # the big-SF working set is large; don't let tracked caches from
        # one query family pin memory for the whole sweep
        if len(results) % 40 == 0:
            clear_tracked_caches()

    summary = {
        "sf_dir": args.sf_dir,
        "checked": len(results),
        "hash_ok": n_ok,
        "rows_only": n_rows_only,
        "oracle_timeout_skipped": n_skip,
        "failed": n_fail,
    }
    with open(args.out, "w") as fh:
        json.dump({"summary": summary, "results": results}, fh, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
