"""Committed-artifact freshness gate (VERDICT r8 #1c).

``CORRECTNESS_LOCAL.json`` is the committed record that the FULL registry
(not just the driver's 50-query window) holds oracle parity. Rounds 5-8
each shipped a stale copy — generated several commits before the snapshot,
so its query list and provenance lagged the registry it claimed to cover.
This test turns that process failure into a red test: the artifact must
have been regenerated from the EXACT package sources being tested.

The check is pure file I/O (no Spark): compare the artifact's recorded
``provenance.source_sha256`` against a fresh hash of the current package
tree, and its ``queries_n`` against the live registry size. Regenerate
with ``python correctness_full.py`` (~minutes) as the final commit of any
round that touched the package.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(ROOT, "CORRECTNESS_LOCAL.json")


def _load():
    assert os.path.exists(ARTIFACT), (
        "CORRECTNESS_LOCAL.json missing — run `python correctness_full.py`"
    )
    with open(ARTIFACT) as fh:
        return json.load(fh)


def test_artifact_matches_current_sources():
    """The artifact's provenance hash must equal a hash of the sources as
    they exist NOW — any package edit without regeneration is a failure."""
    sys.path.insert(0, ROOT)
    try:
        from correctness_full import _provenance
    finally:
        sys.path.remove(ROOT)
    art = _load()
    prov = art.get("provenance") or {}
    current = _provenance()["source_sha256"]
    assert prov.get("source_sha256") == current, (
        "CORRECTNESS_LOCAL.json is stale: provenance.source_sha256 "
        f"{str(prov.get('source_sha256'))[:12]}… does not match the current "
        f"package hash {current[:12]}… — rerun `python correctness_full.py` "
        "and commit the refreshed artifact."
    )


def test_artifact_covers_full_registry():
    from distributed_system_mapreduce_spark.registry import QUERIES

    art = _load()
    n = art.get("queries_n", len(art.get("results", {})))
    assert n == len(QUERIES), (
        f"artifact covers {n} queries but the registry holds {len(QUERIES)}"
    )


def test_artifact_reports_zero_failures():
    art = _load()
    assert art.get("failed_n") == 0, art.get("failed_n")
    bad = [
        k for k, v in art.get("results", {}).items()
        # "no_oracle" marks the declared rows-only queries, not a failure
        if isinstance(v, dict) and v.get("err") not in (None, "no_oracle")
    ]
    assert not bad, bad


PARITY_ARTIFACT = os.path.join(ROOT, "PARITY_SF01.json")


def _load_parity():
    assert os.path.exists(PARITY_ARTIFACT), (
        "PARITY_SF01.json missing — run `python tools/parity_bigsf.py`"
    )
    with open(PARITY_ARTIFACT) as fh:
        return json.load(fh)


def test_parity_sf01_matches_current_sources():
    """VERDICT r15 #4: the sf0.1 parity sweep caught the only two real
    correctness bugs found in three rounds, so its artifact is enforced
    fresh exactly like CORRECTNESS_LOCAL.json — per-file, so the failure
    names WHICH module changed and the fix is a targeted
    `python tools/parity_bigsf.py --changed-only --merge`, not a full
    re-sweep."""
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    try:
        from parity_bigsf import _file_hashes
    finally:
        sys.path.remove(os.path.join(ROOT, "tools"))
    art = _load_parity()
    stamped = (art.get("provenance") or {}).get("source_files")
    assert stamped, (
        "PARITY_SF01.json predates per-file provenance stamping — rerun "
        "`python tools/parity_bigsf.py` to regenerate with a stamp."
    )
    current = _file_hashes()
    changed = sorted(
        f for f in set(stamped) | set(current)
        if stamped.get(f) != current.get(f)
    )
    assert not changed, (
        f"PARITY_SF01.json is stale for {changed} — rerun "
        "`python tools/parity_bigsf.py --changed-only --merge` and commit "
        "the refreshed artifact."
    )


def test_parity_sf01_covers_full_registry_with_zero_failures():
    from distributed_system_mapreduce_spark.registry import QUERIES

    art = _load_parity()
    results = art.get("results") or {}
    missing = sorted(set(QUERIES) - set(results))
    assert not missing, f"PARITY_SF01.json missing queries: {missing}"
    summary = art.get("summary") or {}
    assert summary.get("failed") == 0, summary
    bad = {
        k: v.get("err") for k, v in results.items()
        if isinstance(v, dict)
        and v.get("err") not in (None, "no_oracle", "oracle_timeout")
    }
    assert not bad, bad


def test_parity_sf01_provenance_head_is_clean():
    art = _load_parity()
    prov = art.get("provenance") or {}
    assert prov.get("source_dirty") is False, (
        f"provenance.source_dirty={prov.get('source_dirty')!r} — rerun "
        "`python tools/parity_bigsf.py --changed-only --merge` AFTER the "
        "last source-touching commit."
    )


def test_artifact_provenance_head_is_clean():
    """VERDICT r13 #5: the committed artifact's ledger must be generated
    from a CLEAN tree, so provenance.git_head fully describes the hashed
    sources (r13 shipped an artifact whose git_head lagged the last source
    commit because the sweep ran pre-commit on a dirty tree). A missing
    source_dirty key means the artifact predates the field — regenerate."""
    art = _load()
    prov = art.get("provenance") or {}
    assert prov.get("source_dirty") is False, (
        f"provenance.source_dirty={prov.get('source_dirty')!r} — rerun "
        "`python correctness_full.py` AFTER the last source-touching "
        "commit so git_head names the tree the sweep actually ran on."
    )
