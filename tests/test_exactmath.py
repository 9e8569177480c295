"""exactmath.round_div / sql_round_div — the r15 tie-portability helpers.

Both must equal Python's Decimal ROUND_HALF_UP (the semantics Spark's
decimal `round` and DuckDB's decimal `round` share) on arbitrary
rationals, INCLUDING exact tie points — the case a double-path round
resolves differently per engine (caught live by the sf0.1 parity sweep
on mv_incremental_refresh).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.exactmath import (
    round_div,
    round_div_long,
    round_div_long_or_dec,
    sql_round_div,
)

SETTINGS = dict(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _expected(s: Decimal, n: int, sc: int) -> float:
    return float(
        (s / n).quantize(Decimal(1).scaleb(-sc), rounding=ROUND_HALF_UP)
    )


@settings(**SETTINGS)
@given(
    raw=st.integers(-(10 ** 12), 10 ** 12),
    n=st.integers(1, 10 ** 6),
    scales=st.sampled_from([(2, 2), (4, 4), (6, 6), (2, 9), (6, 9), (4, 6)]),
)
def test_round_div_matches_decimal_half_up(spark, raw, n, scales):
    sc, ns = scales
    s = Decimal(raw) / 10 ** ns
    got = (
        spark.createDataFrame([(s, n)], f"s decimal(30,{ns}), n long")
        .select(round_div(F.col("s"), F.col("n"), sc, ns).alias("r"))
        .collect()[0]["r"]
    )
    duck = duckdb.execute(
        "select "
        + sql_round_div(f"cast({s} as decimal(30,{ns}))", str(n), sc, ns)
    ).fetchone()[0]
    expect = _expected(s, n, sc)
    assert got == duck == expect, (s, n, sc, ns, got, duck, expect)


@pytest.mark.parametrize(
    "s,n,sc,ns",
    [
        # the live sf0.1 divergence: exact half at 4 dp
        (Decimal("101299573.1000"), 400, 4, 4),
        # negative exact half: half AWAY from zero on both engines
        (Decimal("-2.675000000"), 1, 2, 9),
        # tie exactly at the target scale from an integer ratio (integer
        # numerators use the default num_scale == scale)
        (Decimal("1"), 8, 2, 2),  # 0.125 -> 0.13
        (Decimal("-1"), 8, 2, 2),  # -0.125 -> -0.13
    ],
)
def test_round_div_tie_points(spark, s, n, sc, ns):
    got = (
        spark.createDataFrame([(s, n)], f"s decimal(30,{max(ns,1)}), n long")
        .select(round_div(F.col("s"), F.col("n"), sc, ns).alias("r"))
        .collect()[0]["r"]
    )
    duck = duckdb.execute(
        "select "
        + sql_round_div(
            f"cast({s} as decimal(30,{max(ns, 1)}))", str(n), sc, ns
        )
    ).fetchone()[0]
    expect = _expected(s, n, sc)
    assert got == duck == expect, (s, n, sc, ns, got, duck, expect)


def test_round_div_magnitude_ceiling(spark):
    """ADVICE r15: round_div's exactness silently depends on Spark's
    precision-loss adjustment — num(decimal(38,ns)) * 10^ns resolves to
    decimal(38,6), exact only while the scaled numerator stays within
    ~32 integer digits. Pin BOTH sides of the documented ceiling: a
    numerator at ~10^30 (12 digits of headroom below it, the widest any
    real call site can reach even at 100 TB) stays tie-exact, and the
    adjustment itself still resolves wide products to scale 6 rather
    than raising, so a Spark upgrade that changes either behavior
    surfaces here before it can silently corrupt a new call site."""
    # exact tie at 2 dp with a ~1e30-cent-scale numerator: 1e30+5, /1e3,
    # scale 2 -> q=1e32+500 (32 digits, at the documented edge but exact)
    s = Decimal(10**30 + 5) / 100
    got = (
        spark.createDataFrame([(s, 1000)], "s decimal(38,2), n long")
        .select(round_div(F.col("s"), F.col("n"), 2, 2).alias("r"))
        .collect()[0]["r"]
    )
    duck = duckdb.execute(
        "select "
        + sql_round_div(f"cast({s} as decimal(38,2))", "1000", 2, 2)
    ).fetchone()[0]
    expect = _expected(s, 1000, 2)
    assert got == duck == expect, (got, duck, expect)
    # the adjustment behavior itself: decimal(38,9) * 10^9 must come out
    # decimal(38,6) (precision-loss adjustment), not raise — the premise
    # the ceiling analysis in the docstring rests on
    wide = (
        spark.createDataFrame([(Decimal("1.5"),)], "x decimal(38,9)")
        .select((F.col("x") * F.lit(10**9)).alias("p"))
    )
    assert wide.schema["p"].dataType.simpleString() == "decimal(38,6)", (
        wide.schema["p"].dataType.simpleString()
    )


def test_round_div_zero_denominator_is_null(spark):
    """Totality on degenerate corpora: NULL, never an ANSI divide error."""
    r = (
        spark.createDataFrame(
            [(Decimal("1.00"), 0)], "s decimal(30,2), n long"
        )
        .select(round_div(F.col("s"), F.col("n"), 2).alias("r"))
        .collect()[0]["r"]
    )
    assert r is None


@settings(**SETTINGS)
@given(
    num=st.integers(-(10 ** 9), 10 ** 9),
    n=st.integers(1, 10 ** 6),
    sc=st.sampled_from([2, 4, 6]),
)
def test_round_div_long_matches_decimal_half_up(spark, num, n, sc):
    """round_div_long (r16 hot-path variant) must agree with Decimal
    ROUND_HALF_UP and the DuckDB mirror on integer ratios, ties
    included — same contract as round_div, long arithmetic only."""
    got = (
        spark.createDataFrame([(num, n)], "m long, n long")
        .select(round_div_long(F.col("m"), F.col("n"), sc).alias("r"))
        .collect()[0]["r"]
    )
    duck = duckdb.execute(
        "select " + sql_round_div(f"cast({num} as bigint)", str(n), sc)
    ).fetchone()[0]
    expect = _expected(Decimal(num), n, sc)
    assert got == duck == expect, (num, n, sc, got, duck, expect)


@pytest.mark.parametrize(
    "num,n,sc",
    [
        (1, 8, 2),     # 0.125 -> 0.13 (tie at target scale)
        (-1, 8, 2),    # half away from zero
        (1, 128, 6),   # 0.0078125 -> 0.007813 (the RRF 1/(K+rn) class)
        (405198292, 4, 4),  # quotient tie at 4 dp, large numerator
    ],
)
def test_round_div_long_tie_points(spark, num, n, sc):
    got = (
        spark.createDataFrame([(num, n)], "m long, n long")
        .select(round_div_long(F.col("m"), F.col("n"), sc).alias("r"))
        .collect()[0]["r"]
    )
    duck = duckdb.execute(
        "select " + sql_round_div(f"cast({num} as bigint)", str(n), sc)
    ).fetchone()[0]
    expect = _expected(Decimal(num), n, sc)
    assert got == duck == expect, (num, n, sc, got, duck, expect)


def test_round_div_long_guard_raises_past_bound(spark):
    """Past the operand bound (2^61/10^num_scale since the r16
    IntegralDivide relaxation) the guard must raise loudly, never return
    a silently mis-rounded value."""
    from pyspark.errors import PySparkException

    df = spark.createDataFrame([(1 << 50, 3)], "m long, n long").select(
        round_div_long(F.col("m"), F.col("n"), 4).alias("r")
    )
    with pytest.raises(PySparkException):
        df.collect()


def test_round_div_long_result_guard_raises_past_double_bound(spark):
    """Operands inside the long bounds but a scaled quotient past 2^52
    (the double-cast exactness ceiling) must raise too — the r16
    relaxation guards the RESULT, not just the operands."""
    from pyspark.errors import PySparkException

    df = spark.createDataFrame(
        [((1 << 53) + 1, 1)], "m long, n long"
    ).select(round_div_long(F.col("m"), F.col("n"), 0).alias("r"))
    with pytest.raises(PySparkException):
        df.collect()


def test_round_div_long_wide_operands_stay_exact(spark):
    """The r16 relaxation's new domain — operands between the old 2^51
    dividend bound and the new 2^61 operand bound — must round exactly
    (this is the domain eval_regression_metrics' nano-residuals live in)."""
    rows = [
        ((1 << 55) + 7, 10 ** 5),
        (-((1 << 55) + 7), 10 ** 5),
        ((1 << 60) - 1, 10 ** 9),
    ]
    got = (
        spark.createDataFrame(rows, "m long, n long")
        .select(
            F.col("m"),
            F.col("n"),
            round_div_long(F.col("m"), F.col("n"), 0).alias("r"),
        )
        .collect()
    )
    for row in got:
        assert row["r"] == _expected(Decimal(row["m"]), row["n"], 0), row


def test_round_div_long_zero_denominator_is_null(spark):
    r = (
        spark.createDataFrame([(7, 0)], "m long, n long")
        .select(round_div_long(F.col("m"), F.col("n"), 2).alias("r"))
        .collect()[0]["r"]
    )
    assert r is None


@settings(**SETTINGS)
@given(
    num=st.integers(-(10 ** 9), 10 ** 9),
    n=st.integers(1, 10 ** 6),
    sc=st.sampled_from([2, 4, 6, 9]),
)
def test_round_div_long_or_dec_matches_decimal_half_up(spark, num, n, sc):
    """round_div_long_or_dec (r16 guarded fast path) must match Decimal
    ROUND_HALF_UP on the long-path domain — same contract as both
    underlying implementations."""
    got = (
        spark.createDataFrame([(num, n)], "m long, n long")
        .select(round_div_long_or_dec(F.col("m"), F.col("n"), sc).alias("r"))
        .collect()[0]["r"]
    )
    expect = _expected(Decimal(num), n, sc)
    assert got == expect, (num, n, sc, got, expect)


def test_round_div_long_or_dec_falls_back_past_long_bound(spark):
    """Past the guard, rows must take the decimal path and stay EXACT —
    never raise (unlike round_div_long), never mis-round. Mixed frame:
    one in-guard row, one past-guard row whose scaled numerator exceeds
    2^51 (round_div_long would raise on it)."""
    rows = [
        (1, 8),            # long path: 0.125 -> 0.13
        ((1 << 50) + 1, 3),  # decimal path: would raise on the long path
    ]
    got = (
        spark.createDataFrame(rows, "m long, n long")
        .select(
            F.col("m"),
            round_div_long_or_dec(F.col("m"), F.col("n"), 2).alias("r"),
        )
        .orderBy("m")
        .collect()
    )
    assert got[0]["r"] == _expected(Decimal(1), 8, 2)
    assert got[1]["r"] == _expected(Decimal((1 << 50) + 1), 3, 2)


def test_round_div_long_or_dec_guard_boundary(spark):
    """Rows at and around the guard limits (operand limit 2^60/10^ns and
    the double quotient bound) must round exactly on whichever path they
    take — the fallback must fire strictly before round_div_long's
    operand or result raise could."""
    num_lim = (1 << 60) // (10 ** 4)
    rows = [
        # at/below the operand limit (strict <: the first routes decimal)
        (num_lim, 10 ** 9),
        (num_lim - 1, 10 ** 9),
        (-num_lim, 10 ** 9),
        # past the double-quotient guard (num·10^4/den >= 2^50): decimal
        # path — round_div_long's result guard would raise on this row
        ((1 << 48) + 1, 1000),
    ]
    got = (
        spark.createDataFrame(rows, "m long, n long")
        .select(
            F.col("m"),
            F.col("n"),
            round_div_long_or_dec(F.col("m"), F.col("n"), 4).alias("r"),
        )
        .collect()
    )
    for row in got:
        assert row["r"] == _expected(Decimal(row["m"]), row["n"], 4), row
