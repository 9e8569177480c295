"""Exact cross-engine rounding of rational quotients (r15).

The r15 sf0.1 parity sweep caught `mv_incremental_refresh` diverging on a
quotient that landed EXACTLY on a half at the rounding scale
(101299573.10 / 400 = 253248.93275): Spark's `round(double)` rounds the
double's shortest decimal representation half-up (253248.93274999998 →
.9327, the nearest double being just below the half), while DuckDB's
resolves the same value up (.9328). No double-path rounding of an exact
rational is engine-portable at its tie points — and ties are REACHABLE
whenever the numerator has fixed scale (integer counts, 2-dp money, 4-dp
rates) and the denominator is a row count: sum/400 at 4 dp fired in a
60k-row fixture.

The portable form: round-half-up(num/den, s) computed entirely on
integers — floor((2·num·10^s + den) / (2·den)) — then ONE division by
10^s whose result both engines derive from the identical integer.
:func:`round_div` builds that as Spark Column algebra; :func:`sql_round_div`
emits the DuckDB mirror (hugeint `//` is exact integer floor-division).

Denominators must be positive (zero/NULL yields NULL — degenerate
corpora stay total); numerators may be negative — the round is half
AWAY from zero (both engines' HALF_UP semantics), computed as the
magnitude formula on |num| with the sign restored after.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_div(
    num: Column, den: Column, scale: int, num_scale: int | None = None
) -> Column:
    """round-half-up(num/den, scale) as a double, exact at tie points.

    ``num`` must have fixed decimal scale ``num_scale`` (default:
    ``scale``) so num*10^num_scale is an integer — integer counts
    (num_scale 0 works via the default whenever scale >= 0), 2-dp money
    sums, 9-dp probability sums. ``den`` must be a positive integer
    column.

    With q = num*10^num_scale and d = den*10^(num_scale-scale) (both
    integers; num_scale >= scale required):
    round-half-up(num/den, scale)*10^scale = floor((2q + d) / (2d)) —
    all-integer decimal algebra. The `%`-then-divide is exact because
    (x - x % y) is exactly divisible, so Spark's decimal division
    introduces no rounding. The final /10^scale is the same IEEE double
    op DuckDB's mirror performs on the same integer.

    MAGNITUDE CEILING (~10^32, ADVICE r15): the num*10^num_scale multiply
    types as decimal(38, num_scale) x integer, which Spark's
    precision-loss adjustment resolves to decimal(38, min(num_scale, 6))
    rather than raising — exact only while the SCALED numerator
    |num|*10^num_scale fits ~32 integer digits (38 minus the adjusted
    scale's 6). Beyond that Spark silently rounds q instead of erroring,
    and the "exact at tie points" guarantee quietly dies. Every current
    call site is an aggregate of fixture-bounded integers (cents,
    counts, scaled rates: <= ~10^20 even at 100 TB), leaving 12 orders
    of headroom; a NEW call site whose scaled numerator can approach
    10^32 must restructure (reduce num_scale, or pre-divide den) rather
    than rely on this function. tests/test_exactmath.py pins the
    behavior at the ceiling so a Spark upgrade changing the adjustment
    surfaces loudly.
    """
    if num_scale is None:
        num_scale = scale
    if num_scale < scale:
        raise ValueError("num_scale must be >= scale")
    # widen num to decimal BEFORE the 10^num_scale multiply: a LONG num
    # near 2^63 would overflow the long multiply (ANSI raise) even though
    # the scaled value fits decimal(38,0) comfortably
    num_wide = num.cast(f"decimal(38,{num_scale})")
    q = F.abs((num_wide * F.lit(10 ** num_scale)).cast("decimal(38,0)"))
    den_eff = (den * F.lit(10 ** (num_scale - scale))).cast("decimal(38,0)")
    d = (den_eff * F.lit(2)).cast("decimal(38,0)")
    x = q * F.lit(2) + den_eff
    scaled = ((x - x % d) / d).cast("decimal(38,0)")
    # negative numerators round half AWAY from zero (both engines' HALF_UP
    # semantics): magnitude on |q|, sign restored after
    signed = F.when(num < 0, -scaled).otherwise(scaled)
    # CASE WHEN short-circuits, so the modulo never sees a zero divisor
    # under ANSI mode; a zero/NULL denominator yields NULL (degenerate
    # corpora must stay total — tests/test_degenerate.py).
    return F.when(
        den > 0, signed.cast("double") / F.lit(float(10 ** scale))
    ).alias("round_div")


def round_div_long(
    num: Column, den: Column, scale: int, num_scale: int | None = None
) -> Column:
    """:func:`round_div` on the LONG codegen fast path — same half-up
    integer algebra, no decimal arithmetic.

    round_div's decimal(38) pipeline is exact to ~10^32 but measurably
    slow on per-row hot paths (the r16 calm-window bench showed the
    jaccard pair scorers regressing ~30% after conversion — five decimal
    ops per candidate pair). The floor division is one long
    IntegralDivide (exact on ALL longs), so the operating envelope is set
    only by long-overflow safety and the final double cast:

    - REQUIRES |num| < 2^61 / 10^num_scale and
      den < 2^61 / 10^(num_scale - scale): keeps the dividend
      x = 2·|num|·10^ns + den_eff inside long range without relying on
      ANSI overflow detection. Explicit per-row guards raise loudly past
      either bound — never a silent wrong round.
    - REQUIRES the scaled quotient round(|num/den|·10^scale) <= 2^52: the
      result crosses one double cast, exact only under 2^53. Guarded on
      the computed quotient itself, so the bound adapts to the data
      rather than to a worst-case operand product.

    Use for per-row ratios of integers up to ~2.3e18/10^ns (shingle
    counts, set sizes, ranks, nano-scaled residuals); keep
    :func:`round_div` for anything wider. Semantics (half away from
    zero, NULL on zero/NULL denominator) and the DuckDB mirror
    (:func:`sql_round_div`) are identical.
    """
    if num_scale is None:
        num_scale = scale
    if num_scale < scale:
        raise ValueError("num_scale must be >= scale")
    # operand guards: qn = |num|·10^ns <= 2^61 and den_eff <= 2^61 give
    # x = 2·qn + den_eff < 3·2^61 < 2^63 — no long overflow anywhere in
    # the algebra, independent of ANSI mode
    num_lim = (1 << 61) // (10 ** num_scale)
    den_lim = (1 << 61) // (10 ** (num_scale - scale))
    num_ok = F.when(F.abs(num) < F.lit(num_lim), num).otherwise(
        F.raise_error(
            F.lit(
                "round_div_long: |num| exceeds the 2^61/10^num_scale "
                "long-overflow bound — use round_div (decimal path)"
            )
        )
    )
    den_ok = F.when(den < F.lit(den_lim), den).otherwise(
        F.raise_error(
            F.lit(
                "round_div_long: den exceeds the 2^61/10^(ns-scale) "
                "long-overflow bound — use round_div (decimal path)"
            )
        )
    )
    qn = F.abs(num_ok.cast("long") * F.lit(10 ** num_scale))
    den_eff = den_ok.cast("long") * F.lit(10 ** (num_scale - scale))
    d = den_eff * F.lit(2)
    x = qn * F.lit(2) + den_eff
    # r16 optimization-round change (guide §4.1 "prefer built-ins",
    # measured on the million-pair jaccard frames): one long
    # IntegralDivide (`div`) replaces the pmod → subtract → double-divide
    # → cast chain. x, d > 0, so truncation == floor — and exact on all
    # longs, which is what lets the old 2^52 DIVIDEND guard relax into
    # the wider operand guards above plus the result guard below.
    scaled = F.call_function("div", x, d)
    # result guard: the double cast below is exact only under 2^53
    scaled_ok = F.when(scaled <= F.lit(1 << 52), scaled).otherwise(
        F.raise_error(
            F.lit(
                "round_div_long: scaled quotient exceeds the 2^52 "
                "double-exactness bound — use round_div (decimal path)"
            )
        )
    )
    signed = F.when(num < 0, -scaled_ok).otherwise(scaled_ok)
    return F.when(
        den > 0, signed.cast("double") / F.lit(float(10 ** scale))
    ).alias("round_div")


def round_div_long_or_dec(
    num: Column, den: Column, scale: int, num_scale: int | None = None
) -> Column:
    """:func:`round_div` semantics with a per-row long fast path.

    For integer-valued ``num``/``den`` columns whose magnitude is usually
    small but not provably bounded (per-vertex wedge counts, residual
    numerators): rows where a conservative guard proves the long algebra
    exact take :func:`round_div_long`'s codegen path; the rest fall back
    to the decimal path — never a raise, never a wrong round. The CASE
    branches evaluate lazily, so the common case pays long ops only.

    Guard (all three overflow-free to EVALUATE, which is what lets the
    guard itself run on arbitrarily wide rows):

    - |num| < 2^60/10^ns and den < 2^60/10^(ns-sc): strictly inside
      round_div_long's 2^61 operand bounds, so its operand raises can't
      fire;
    - |num|·10^sc < den·2^50, compared in DOUBLE (doubles can't
      overflow; the 4x margin to round_div_long's 2^52 result guard
      dwarfs double rounding error): bounds the scaled quotient at
      ~2^50, so the result raise can't fire either. The double compare
      is deterministic (IEEE) and Spark-side only — the oracle mirrors
      the full integer formula, so which path a row takes never affects
      parity.
    """
    if num_scale is None:
        num_scale = scale
    if num_scale < scale:
        raise ValueError("num_scale must be >= scale")
    num_lim = (1 << 60) // (10 ** num_scale)
    den_lim = (1 << 60) // (10 ** (num_scale - scale))
    fits = (
        num.isNotNull()
        & den.isNotNull()
        & (F.abs(num) < F.lit(num_lim))
        & (den < F.lit(den_lim))
        & (
            F.abs(num).cast("double") * F.lit(float(10 ** scale))
            < den.cast("double") * F.lit(float(1 << 50))
        )
    )
    return F.when(
        fits, round_div_long(num, den, scale, num_scale)
    ).otherwise(round_div(num, den, scale, num_scale))


def sql_round_div(
    num_sql: str, den_sql: str, scale: int, num_scale: int | None = None
) -> str:
    """DuckDB mirror of :func:`round_div`: same integers, same final op.

    ``num_sql`` must be an expression whose value times 10**num_scale is
    an integer (cast to a sufficiently-scaled DECIMAL by the caller, e.g.
    ``sum(cast(x as decimal(18,4)))`` with num_scale=4, or any integer
    aggregate with the default); ``den_sql`` a positive integer
    expression.
    """
    if num_scale is None:
        num_scale = scale
    if num_scale < scale:
        raise ValueError("num_scale must be >= scale")
    q = f"abs(cast(({num_sql}) * {10 ** num_scale} as hugeint))"
    d = f"(cast({den_sql} as hugeint) * {10 ** (num_scale - scale)})"
    sign = f"(case when ({num_sql}) < 0 then -1 else 1 end)"
    return (
        f"(cast({sign} * ((2 * {q} + {d}) // (2 * {d})) as double)"
        f" / {10 ** scale})"
    )


def split_units(col: Column, unit: int) -> tuple[Column, Column]:
    """Per-row (quotient, remainder) of a non-negative integer-valued
    LONG column by ``unit`` — the fast-sum decomposition: summing q and r
    separately keeps both aggregates on Spark's long codegen fast path
    (a decimal(38,0) sum leaves it, measured 2-4x slower), while the
    recombined total stays exact far beyond long range: with unit=10^6,
    sum(q) overflows only past ~9e18 DOLLARS of total charge. Pair with
    :func:`recombine_units`."""
    r = F.pmod(col, F.lit(unit))
    # (col - r) is exactly divisible; the double division is exact for
    # per-row quotients below 2^53 (all call sites are ≤ ~1e6)
    q = ((col - r) / F.lit(unit)).cast("long")
    return q, r


def recombine_units(sum_q: Column, sum_r: Column, unit: int) -> Column:
    """Exact decimal total from the two long sums of :func:`split_units`:
    sum_q*unit + sum_r as decimal(38,0)."""
    return sum_q.cast("decimal(38,0)") * F.lit(unit) + sum_r.cast(
        "decimal(38,0)"
    )
