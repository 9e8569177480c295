#!/usr/bin/env python
"""Regenerate the cumulative driver-verification ledger from the committed
CORRECTNESS_r*.json artifacts (VERDICT r14 #6: the hand-carried COVERAGE.md
count drifted to an undercount — 98 vs the artifact union's 114 — so the
ledger is now DERIVED, never hand-edited).

A query counts as *driver-hash-verified* if ANY round's artifact records
``hash_match: true`` for it; *driver-rows-only* if some round ran it
(``err`` null/"no_oracle", ``spark_rows`` present) without a hash match and
no other round hash-verified it.

Usage: python tools/driver_ledger.py [--repo /root/repo] [--json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os


def build_ledger(repo: str) -> dict:
    hash_green: dict[str, str] = {}  # name -> first round it went green
    rows_only: dict[str, str] = {}
    rounds = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    for path in rounds:
        rnd = os.path.basename(path)[len("CORRECTNESS_") : -len(".json")]
        with open(path) as fh:
            data = json.load(fh)
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            if rec.get("hash_match"):
                hash_green.setdefault(name, rnd)
            elif rec.get("spark_rows") is not None and rec.get("err") in (
                None,
                "no_oracle",
            ):
                rows_only.setdefault(name, rnd)
    rows_only_ever = {
        k: v for k, v in rows_only.items() if k not in hash_green
    }
    return {
        "artifacts": [os.path.basename(p) for p in rounds],
        "hash_green": dict(sorted(hash_green.items())),
        "rows_only_ever": dict(sorted(rows_only_ever.items())),
        "n_hash_green": len(hash_green),
        "n_rows_only_ever": len(rows_only_ever),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--repo",
        default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    ap.add_argument("--json", action="store_true", help="full JSON dump")
    args = ap.parse_args()
    ledger = build_ledger(args.repo)
    if args.json:
        print(json.dumps(ledger, indent=1))
    else:
        print(
            f"{ledger['n_hash_green']} distinct queries driver-hash-green "
            f"across {len(ledger['artifacts'])} artifacts; "
            f"{ledger['n_rows_only_ever']} ever rows-only "
            f"({', '.join(ledger['rows_only_ever'])})"
        )


if __name__ == "__main__":
    main()
