"""F.round tie-portability audit gate (VERDICT r15 #3).

The r15 sf0.1 sweep proved double-path rounds of fixed-scale rationals
diverge between engines at reachable tie points. r15/r16 converted every
such site to exactmath's all-integer half-up; what REMAINS on F.round
must be provably tie-safe. tools/round_audit.py classifies every site:
``repr_int`` and ``irrational`` are auto-safe, and each ``rational``
site must carry an allowlist entry stating WHY its ties are unreachable
(native-scale / exact-decimal / bounded-interp / free-double /
square-parity / dyadic-growth / hetero-mean). An unclassified site —
e.g. a new operator rounding a quotient through a double — fails here
until it is either converted to round_div or justified.
"""

from __future__ import annotations

import os
import sys
from decimal import Decimal

import duckdb
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))
from round_audit import KNOWN_RATIONAL_SAFE, audit  # noqa: E402

CLASSES = {
    "native-scale",
    "exact-decimal",
    "bounded-interp",
    "free-double",
    "square-parity",
    "dyadic-growth",
    "hetero-mean",
}


def test_every_rational_round_site_is_classified():
    sites = [s for s in audit() if s["kind"] == "rational"]
    unlisted = [
        f"{s['file']}:{s['line']}  {s['expr'][:80]}"
        for s in sites
        if (s["file"], s["expr"]) not in KNOWN_RATIONAL_SAFE
    ]
    assert not unlisted, (
        "F.round sites whose input could be a fixed-scale rational, with "
        "no tie-safety justification — convert to exactmath.round_div "
        "(+ sql_round_div in the oracle) or add a classified entry to "
        "tools/round_audit.py KNOWN_RATIONAL_SAFE:\n" + "\n".join(unlisted)
    )


def test_allowlist_entries_use_known_classes_and_are_live():
    sites = {(s["file"], s["expr"]) for s in audit() if s["kind"] == "rational"}
    stale = [k for k in KNOWN_RATIONAL_SAFE if k not in sites]
    assert not stale, (
        f"allowlist entries no longer matching any live F.round site "
        f"(expression changed or converted — prune them): {stale[:5]}"
    )
    bad = {
        k: v.split(":")[0]
        for k, v in KNOWN_RATIONAL_SAFE.items()
        if v.split(":")[0] not in CLASSES
    }
    assert not bad, bad


def test_exact_decimal_round_is_tie_portable(spark):
    """The exact-decimal class rests on both engines rounding DECIMALs
    HALF_UP away from zero — pin it on exact ties, both signs."""
    duck = duckdb.execute(
        "select round(cast(2.005 as decimal(18,3)), 2),"
        "       round(cast(-2.005 as decimal(18,3)), 2),"
        "       round(cast(0.125 as decimal(18,3)), 2)"
    ).fetchone()
    row = spark.sql(
        "select round(cast(2.005 as decimal(18,3)), 2) a,"
        "       round(cast(-2.005 as decimal(18,3)), 2) b,"
        "       round(cast(0.125 as decimal(18,3)), 2) c"
    ).collect()[0]
    assert (row.a, row.b, row.c) == duck == (
        Decimal("2.01"),
        Decimal("-2.01"),
        Decimal("0.13"),
    )


@pytest.mark.parametrize("r", ["0.000000005", "-0.000000125", "1.999999995"])
def test_square_parity_no_ties(r):
    """The square-parity class: the square of ANY 9-dp decimal can never
    terminate at scale 10 with final digit 5 (odd 2-adic valuation is
    impossible for a square). Brute-check the claim near the witnesses."""
    base = int(Decimal(r) * 10 ** 9)
    for dn in range(-50, 51):
        m = (base + dn) ** 2  # the square in 1e-18 units
        # tie at scale 9 <=> m ≡ 5*10^8 (mod 10^9)
        assert m % 10 ** 9 != 5 * 10 ** 8, (r, dn)
