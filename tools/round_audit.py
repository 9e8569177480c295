#!/usr/bin/env python
"""Audit every F.round call site for cross-engine tie safety (VERDICT r15 #3).

The r15 sf0.1 parity sweep proved that rounding a RATIONAL quotient of
fixed-scale quantities (sum-of-cents / count, 4-dp rate / 400) through a
double is not engine-portable: exact ties at the rounding scale are
REACHABLE, and Spark and DuckDB resolve the same double differently
(exactmath.py header). r15 converted 21 queries to the all-integer
round_div; this tool sweeps EVERY remaining F.round call site and buckets
it so the not-converted list is a checked artifact, not a hope:

- ``repr_int``: F.round(expr) with no scale, feeding a long/int cast —
  the repr-correction idiom (money*100 is an integer by construction;
  the round only collapses fp representation error, never a true tie).
- ``irrational``: the rounded expression passes through a transcendental
  or algebraic-irrational function (log/ln/exp/sqrt/pow(., frac)/
  trig/norm/cosine similarity) — an EXACT tie at the rounding scale is
  measure-zero for such values, so the double round is portable in
  every practically reachable case.
- ``rational``: everything else — a round whose input could be an exact
  fixed-scale rational. Each of these must either be converted to
  round_div or carry a line in the KNOWN_RATIONAL_SAFE allowlist below
  with a one-line justification (enforced by tests/test_round_audit.py:
  an unlisted rational site fails the suite).

Heuristics are conservative: "irrational" requires a marker FUNCTION in
the rounded expression's AST; mixed expressions (irrational subterm
inside, e.g. sum(ln x)/n) still count as irrational because the quotient
of an irrational is irrational except on a measure-zero set.

Usage: python tools/round_audit.py [--json]
"""

from __future__ import annotations

import ast
import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO_ROOT, "distributed_system_mapreduce_spark")

#: Function names (F.<name> / math.<name> / builtins) whose output is
#: irrational off a measure-zero input set. A round of any expression
#: containing one of these cannot land on an exact decimal tie except on
#: that measure-zero set — the justification for leaving it on the
#: double path.
IRRATIONAL_FUNCS = {
    "log", "log2", "log10", "log1p", "ln", "exp", "expm1", "sqrt", "cbrt",
    "pow", "power", "sin", "cos", "tan", "asin", "acos", "atan", "atan2",
    "sinh", "cosh", "tanh", "hypot",
    # engine helpers whose value is a cosine / norm / entropy /
    # dot-of-free-doubles — irrational (or measure-zero-tie free
    # doubles: embeddings are arbitrary doubles, so an exact decimal
    # tie in a dot product is a measure-zero event)
    "cosine", "cosine_sim", "l2_norm", "vector_norm", "entropy", "dot",
    # statistical aggregates that are irrational off measure-zero inputs
    # (stddev/variance involve sqrt or mean-of-squares minus square-of-mean
    # over doubles; corr involves a sqrt denominator)
    "stddev", "stddev_pop", "stddev_samp", "var_pop", "var_samp",
    "variance", "corr",
}

#: (relpath, unparsed-expr) -> "class: one-line justification". Every
#: ``rational`` site must appear here; tests/test_round_audit.py fails on
#: any unlisted one. Keys use the rounded expression's exact ast.unparse
#: text (line-number-independent — entries survive unrelated edits, and a
#: CHANGED expression correctly invalidates its entry). Classes:
#: native-scale / exact-decimal / bounded-interp / free-double /
#: square-parity / dyadic-growth / hetero-mean — definitions inline.
KNOWN_RATIONAL_SAFE: dict[tuple[str, str], str] = {
    ('distributed_system_mapreduce_spark/functions/retrieval.py',
     "'mmr'"):
        'free-double: the rounded value passes through non-fixed-scale doubles (embedding components, sqrt/log/pow-derived scores) reached via a named column the AST cannot see — an exact decimal tie is a measure-zero event; pinned at sf0.01+sf0.1',
    ('distributed_system_mapreduce_spark/functions/text.py',
     "F.regr_intercept('lf', 'lr')"):
        'free-double: the rounded value passes through non-fixed-scale doubles (embedding components, sqrt/log/pow-derived scores) reached via a named column the AST cannot see — an exact decimal tie is a measure-zero event; pinned at sf0.01+sf0.1',
    ('distributed_system_mapreduce_spark/functions/text.py',
     "F.regr_slope('lf', 'lr')"):
        'free-double: the rounded value passes through non-fixed-scale doubles (embedding components, sqrt/log/pow-derived scores) reached via a named column the AST cannot see — an exact decimal tie is a measure-zero event; pinned at sf0.01+sf0.1',
    ('distributed_system_mapreduce_spark/functions/text.py',
     "F.sum(idf * F.col('tf') * F.lit(BM25_K1 + 1) / norm)"):
        'free-double: the rounded value passes through non-fixed-scale doubles (embedding components, sqrt/log/pow-derived scores) reached via a named column the AST cannot see — an exact decimal tie is a measure-zero event; pinned at sf0.01+sf0.1',
    ('distributed_system_mapreduce_spark/functions/vectors.py',
     "F.sum('dist')"):
        'free-double: the rounded value passes through non-fixed-scale doubles (embedding components, sqrt/log/pow-derived scores) reached via a named column the AST cannot see — an exact decimal tie is a measure-zero event; pinned at sf0.01+sf0.1',
    ('distributed_system_mapreduce_spark/functions/vectors.py',
     "F.sum('part')"):
        'free-double: the rounded value passes through non-fixed-scale doubles (embedding components, sqrt/log/pow-derived scores) reached via a named column the AST cannot see — an exact decimal tie is a measure-zero event; pinned at sf0.01+sf0.1',
    ('distributed_system_mapreduce_spark/functions/vectors.py',
     's'):
        'free-double: the rounded value passes through non-fixed-scale doubles (embedding components, sqrt/log/pow-derived scores) reached via a named column the AST cannot see — an exact decimal tie is a measure-zero event; pinned at sf0.01+sf0.1',
    ('distributed_system_mapreduce_spark/functions/vectors.py',
     'score'):
        'free-double: the rounded value passes through non-fixed-scale doubles (embedding components, sqrt/log/pow-derived scores) reached via a named column the AST cannot see — an exact decimal tie is a measure-zero event; pinned at sf0.01+sf0.1',
    ('distributed_system_mapreduce_spark/operators/aggregations.py',
     "F.abs(F.col('p50_exact') - F.col('p50_approx'))"):
        'bounded-interp: percentile interpolation a + f*(b-a) with a 1-2-dp fraction over fixed-scale data; the result terminates at native+2 dp <= the round scale — pass-through, tie-free (percentile_approx returns an actual element)',
    ('distributed_system_mapreduce_spark/operators/aggregations.py',
     "F.abs(F.col('p99_exact') - F.col('p99_approx'))"):
        'bounded-interp: percentile interpolation a + f*(b-a) with a 1-2-dp fraction over fixed-scale data; the result terminates at native+2 dp <= the round scale — pass-through, tie-free (percentile_approx returns an actual element)',
    ('distributed_system_mapreduce_spark/operators/aggregations.py',
     "F.max('value')"):
        "native-scale: additive aggregate/passthrough of fixed-scale values rounded at >= their native scale — the true value's decimal expansion terminates at or before the round scale, so a tie (digit 5 one place deeper) is unreachable",
    ('distributed_system_mapreduce_spark/operators/aggregations.py',
     "F.min('value')"):
        "native-scale: additive aggregate/passthrough of fixed-scale values rounded at >= their native scale — the true value's decimal expansion terminates at or before the round scale, so a tie (digit 5 one place deeper) is unreachable",
    ('distributed_system_mapreduce_spark/operators/aggregations.py',
     "F.percentile('value', F.lit(0.5))"):
        'bounded-interp: percentile interpolation a + f*(b-a) with a 1-2-dp fraction over fixed-scale data; the result terminates at native+2 dp <= the round scale — pass-through, tie-free (percentile_approx returns an actual element)',
    ('distributed_system_mapreduce_spark/operators/aggregations.py',
     "F.percentile('value', F.lit(0.99))"):
        'bounded-interp: percentile interpolation a + f*(b-a) with a 1-2-dp fraction over fixed-scale data; the result terminates at native+2 dp <= the round scale — pass-through, tie-free (percentile_approx returns an actual element)',
    ('distributed_system_mapreduce_spark/operators/aggregations.py',
     "F.percentile_approx('value', F.lit(0.5), F.lit(1000))"):
        'bounded-interp: percentile interpolation a + f*(b-a) with a 1-2-dp fraction over fixed-scale data; the result terminates at native+2 dp <= the round scale — pass-through, tie-free (percentile_approx returns an actual element)',
    ('distributed_system_mapreduce_spark/operators/aggregations.py',
     "F.percentile_approx('value', F.lit(0.99), F.lit(1000))"):
        'bounded-interp: percentile interpolation a + f*(b-a) with a 1-2-dp fraction over fixed-scale data; the result terminates at native+2 dp <= the round scale — pass-through, tie-free (percentile_approx returns an actual element)',
    ('distributed_system_mapreduce_spark/operators/aggregations.py',
     "F.sum('o_totalprice')"):
        "native-scale: additive aggregate/passthrough of fixed-scale values rounded at >= their native scale — the true value's decimal expansion terminates at or before the round scale, so a tie (digit 5 one place deeper) is unreachable",
    ('distributed_system_mapreduce_spark/operators/aggregations.py',
     "F.sum('value')"):
        "native-scale: additive aggregate/passthrough of fixed-scale values rounded at >= their native scale — the true value's decimal expansion terminates at or before the round scale, so a tie (digit 5 one place deeper) is unreachable",
    ('distributed_system_mapreduce_spark/operators/analytics.py',
     "'p_retailprice'"):
        "native-scale: additive aggregate/passthrough of fixed-scale values rounded at >= their native scale — the true value's decimal expansion terminates at or before the round scale, so a tie (digit 5 one place deeper) is unreachable",
    ('distributed_system_mapreduce_spark/operators/analytics.py',
     "F.avg(F.col('l_extendedprice') / F.col('l_quantity'))"):
        'hetero-mean: mean of per-row quotients with heterogeneous denominators (price/quantity) — a 2-dp tie requires the lcm-denominator rational to terminate one digit deeper, a measure-zero coincidence over the quantity mix; pinned at two SFs',
    ('distributed_system_mapreduce_spark/operators/analytics.py',
     "F.percentile('days', F.lit(0.5), F.col('cnt'))"):
        'bounded-interp: percentile interpolation a + f*(b-a) with a 1-2-dp fraction over fixed-scale data; the result terminates at native+2 dp <= the round scale — pass-through, tie-free (percentile_approx returns an actual element)',
    ('distributed_system_mapreduce_spark/operators/analytics.py',
     "F.percentile('days', F.lit(0.9), F.col('cnt'))"):
        'bounded-interp: percentile interpolation a + f*(b-a) with a 1-2-dp fraction over fixed-scale data; the result terminates at native+2 dp <= the round scale — pass-through, tie-free (percentile_approx returns an actual element)',
    ('distributed_system_mapreduce_spark/operators/analytics.py',
     "F.sum('revenue')"):
        "native-scale: additive aggregate/passthrough of fixed-scale values rounded at >= their native scale — the true value's decimal expansion terminates at or before the round scale, so a tie (digit 5 one place deeper) is unreachable",
    ('distributed_system_mapreduce_spark/operators/analytics.py',
     "F.sum(F.col('c_acctbal').cast('decimal(18,2)'))"):
        'exact-decimal: round applied to an exact DECIMAL-typed sum — both engines round decimals HALF_UP away from zero (pinned by tests/test_round_audit.py), so even exact ties agree',
    ('distributed_system_mapreduce_spark/operators/analytics.py',
     "F.sum(F.col('o_totalprice').cast('decimal(18,4)'))"):
        'exact-decimal: round applied to an exact DECIMAL-typed sum — both engines round decimals HALF_UP away from zero (pinned by tests/test_round_audit.py), so even exact ties agree',
    ('distributed_system_mapreduce_spark/operators/cdc.py',
     "F.coalesce('c.last_value', 'b.last_value')"):
        "native-scale: additive aggregate/passthrough of fixed-scale values rounded at >= their native scale — the true value's decimal expansion terminates at or before the round scale, so a tie (digit 5 one place deeper) is unreachable",
    ('distributed_system_mapreduce_spark/operators/cdc.py',
     "F.col('s_total')"):
        "native-scale: additive aggregate/passthrough of fixed-scale values rounded at >= their native scale — the true value's decimal expansion terminates at or before the round scale, so a tie (digit 5 one place deeper) is unreachable",
    ('distributed_system_mapreduce_spark/operators/cohorts.py',
     "F.sum('monetary')"):
        "native-scale: additive aggregate/passthrough of fixed-scale values rounded at >= their native scale — the true value's decimal expansion terminates at or before the round scale, so a tie (digit 5 one place deeper) is unreachable",
    ('distributed_system_mapreduce_spark/operators/cohorts.py',
     "F.sum('rev')"):
        "native-scale: additive aggregate/passthrough of fixed-scale values rounded at >= their native scale — the true value's decimal expansion terminates at or before the round scale, so a tie (digit 5 one place deeper) is unreachable",
    ('distributed_system_mapreduce_spark/operators/cohorts.py',
     "F.sum(F.col('o_totalprice').cast('decimal(18,4)'))"):
        'exact-decimal: round applied to an exact DECIMAL-typed sum — both engines round decimals HALF_UP away from zero (pinned by tests/test_round_audit.py), so even exact ties agree',
    ('distributed_system_mapreduce_spark/operators/cohorts.py',
     "F.sum(F.col('o_totalprice').cast('decimal(18,4)')).over(wsum).cast('double')"):
        'exact-decimal: round applied to an exact DECIMAL-typed sum — both engines round decimals HALF_UP away from zero (pinned by tests/test_round_audit.py), so even exact ties agree',
    ('distributed_system_mapreduce_spark/operators/cohorts.py',
     "F.sum(F.when(F.col('event_type') == 'purchase', F.col('value')).otherwise(0.0))"):
        "native-scale: additive aggregate/passthrough of fixed-scale values rounded at >= their native scale — the true value's decimal expansion terminates at or before the round scale, so a tie (digit 5 one place deeper) is unreachable",
    ('distributed_system_mapreduce_spark/operators/curation.py',
     "F.col('w') / F.col('z')"):
        'free-double: the rounded value passes through non-fixed-scale doubles (embedding components, sqrt/log/pow-derived scores) reached via a named column the AST cannot see — an exact decimal tie is a measure-zero event; pinned at sf0.01+sf0.1',
    ('distributed_system_mapreduce_spark/operators/curation.py',
     "F.col('w') / F.col('z') / F.col('p')"):
        'free-double: the rounded value passes through non-fixed-scale doubles (embedding components, sqrt/log/pow-derived scores) reached via a named column the AST cannot see — an exact decimal tie is a measure-zero event; pinned at sf0.01+sf0.1',
    ('distributed_system_mapreduce_spark/operators/curation.py',
     'resid * xj'):
        'free-double: the rounded value passes through non-fixed-scale doubles (embedding components, sqrt/log/pow-derived scores) reached via a named column the AST cannot see — an exact decimal tie is a measure-zero event; pinned at sf0.01+sf0.1',
    ('distributed_system_mapreduce_spark/operators/extended.py',
     "F.percentile('value', F.lit(0.5))"):
        'bounded-interp: percentile interpolation a + f*(b-a) with a 1-2-dp fraction over fixed-scale data; the result terminates at native+2 dp <= the round scale — pass-through, tie-free (percentile_approx returns an actual element)',
    ('distributed_system_mapreduce_spark/operators/extended.py',
     "F.percentile('value', F.lit(0.9))"):
        'bounded-interp: percentile interpolation a + f*(b-a) with a 1-2-dp fraction over fixed-scale data; the result terminates at native+2 dp <= the round scale — pass-through, tie-free (percentile_approx returns an actual element)',
    ('distributed_system_mapreduce_spark/operators/extended.py',
     "F.percentile('value', F.lit(0.99))"):
        'bounded-interp: percentile interpolation a + f*(b-a) with a 1-2-dp fraction over fixed-scale data; the result terminates at native+2 dp <= the round scale — pass-through, tie-free (percentile_approx returns an actual element)',
    ('distributed_system_mapreduce_spark/operators/extended.py',
     "F.sum('o_totalprice')"):
        "native-scale: additive aggregate/passthrough of fixed-scale values rounded at >= their native scale — the true value's decimal expansion terminates at or before the round scale, so a tie (digit 5 one place deeper) is unreachable",
    ('distributed_system_mapreduce_spark/operators/extended.py',
     'F.sum(high)'):
        "native-scale: additive aggregate/passthrough of fixed-scale values rounded at >= their native scale — the true value's decimal expansion terminates at or before the round scale, so a tie (digit 5 one place deeper) is unreachable",
    ('distributed_system_mapreduce_spark/operators/graph.py',
     "F.col('rank') * F.lit(n_nodes)"):
        'free-double: the rounded value passes through non-fixed-scale doubles (embedding components, sqrt/log/pow-derived scores) reached via a named column the AST cannot see — an exact decimal tie is a measure-zero event; pinned at sf0.01+sf0.1',
    ('distributed_system_mapreduce_spark/operators/joins.py',
     "F.sum(F.col('o_totalprice').cast('decimal(18,4)'))"):
        'exact-decimal: round applied to an exact DECIMAL-typed sum — both engines round decimals HALF_UP away from zero (pinned by tests/test_round_audit.py), so even exact ties agree',
    ('distributed_system_mapreduce_spark/operators/mleval.py',
     "(F.col('p') - F.col('is_pos')) * (F.col('p') - F.col('is_pos'))"):
        'free-double: the rounded value passes through non-fixed-scale doubles (embedding components, sqrt/log/pow-derived scores) reached via a named column the AST cannot see — an exact decimal tie is a measure-zero event; pinned at sf0.01+sf0.1',
    ('distributed_system_mapreduce_spark/operators/mleval.py',
     "F.col('d') * F.col('d')"):
        'square-parity: decimal round at 9 of the square of an exact 9-dp decimal — a tie forces odd 2-adic valuation on the scaled square, but squares have even valuation: ties are impossible (and decimal rounds are engine-portable regardless)',
    ('distributed_system_mapreduce_spark/operators/mleval.py',
     "F.col('dcg') / idcg"):
        'free-double: the rounded value passes through non-fixed-scale doubles (embedding components, sqrt/log/pow-derived scores) reached via a named column the AST cannot see — an exact decimal tie is a measure-zero event; pinned at sf0.01+sf0.1',
    ('distributed_system_mapreduce_spark/operators/mleval.py',
     "F.col('r') * F.col('r')"):
        'square-parity: decimal round at 9 of the square of an exact 9-dp decimal — a tie forces odd 2-adic valuation on the scaled square, but squares have even valuation: ties are impossible (and decimal rounds are engine-portable regardless)',
    ('distributed_system_mapreduce_spark/operators/mleval.py',
     "F.col('value')"):
        "native-scale: additive aggregate/passthrough of fixed-scale values rounded at >= their native scale — the true value's decimal expansion terminates at or before the round scale, so a tie (digit 5 one place deeper) is unreachable",
    ('distributed_system_mapreduce_spark/operators/mleval.py',
     "F.expr('aggregate(zip_with(e, c, (a, b) -> (a - b) * (a - b)), 0D, (s, v) -> s + v)')"):
        'free-double: the rounded value passes through non-fixed-scale doubles (embedding components, sqrt/log/pow-derived scores) reached via a named column the AST cannot see — an exact decimal tie is a measure-zero event; pinned at sf0.01+sf0.1',
    ('distributed_system_mapreduce_spark/operators/timewin.py',
     "'mu_s'"):
        'free-double: the rounded value passes through non-fixed-scale doubles (embedding components, sqrt/log/pow-derived scores) reached via a named column the AST cannot see — an exact decimal tie is a measure-zero event; pinned at sf0.01+sf0.1',
    ('distributed_system_mapreduce_spark/operators/timewin.py',
     "'sigma_s'"):
        'free-double: the rounded value passes through non-fixed-scale doubles (embedding components, sqrt/log/pow-derived scores) reached via a named column the AST cannot see — an exact decimal tie is a measure-zero event; pinned at sf0.01+sf0.1',
    ('distributed_system_mapreduce_spark/operators/timewin.py',
     "(F.col('cnt') - F.col('mu')) / F.col('sd')"):
        'free-double: the rounded value passes through non-fixed-scale doubles (embedding components, sqrt/log/pow-derived scores) reached via a named column the AST cannot see — an exact decimal tie is a measure-zero event; pinned at sf0.01+sf0.1',
    ('distributed_system_mapreduce_spark/operators/timewin.py',
     "F.col('st.b')"):
        "dyadic-growth: exponentially-smoothed recursion (alpha/beta constants) — the true value's decimal scale grows past round scale+1 within <=3 steps; a tie is reachable only in the first steps at exactly ...5 one digit deep. Residual risk documented; conversion would need exact-decimal recursion through the window. Pinned at sf0.01+sf0.1",
    ('distributed_system_mapreduce_spark/operators/timewin.py',
     "F.col('st.l')"):
        "dyadic-growth: exponentially-smoothed recursion (alpha/beta constants) — the true value's decimal scale grows past round scale+1 within <=3 steps; a tie is reachable only in the first steps at exactly ...5 one digit deep. Residual risk documented; conversion would need exact-decimal recursion through the window. Pinned at sf0.01+sf0.1",
    ('distributed_system_mapreduce_spark/operators/timewin.py',
     "F.col('st.l') + F.col('st.b')"):
        "dyadic-growth: exponentially-smoothed recursion (alpha/beta constants) — the true value's decimal scale grows past round scale+1 within <=3 steps; a tie is reachable only in the first steps at exactly ...5 one digit deep. Residual risk documented; conversion would need exact-decimal recursion through the window. Pinned at sf0.01+sf0.1",
    ('distributed_system_mapreduce_spark/operators/timewin.py',
     "F.col('z.ewma')"):
        "dyadic-growth: exponentially-smoothed recursion (alpha/beta constants) — the true value's decimal scale grows past round scale+1 within <=3 steps; a tie is reachable only in the first steps at exactly ...5 one digit deep. Residual risk documented; conversion would need exact-decimal recursion through the window. Pinned at sf0.01+sf0.1",
    ('distributed_system_mapreduce_spark/operators/timewin.py',
     "F.last('sum_value', ignorenulls=True).over(w)"):
        "native-scale: additive aggregate/passthrough of fixed-scale values rounded at >= their native scale — the true value's decimal expansion terminates at or before the round scale, so a tie (digit 5 one place deeper) is unreachable",
    ('distributed_system_mapreduce_spark/operators/timewin.py',
     "F.max('value')"):
        "native-scale: additive aggregate/passthrough of fixed-scale values rounded at >= their native scale — the true value's decimal expansion terminates at or before the round scale, so a tie (digit 5 one place deeper) is unreachable",
    ('distributed_system_mapreduce_spark/operators/timewin.py',
     "F.max(F.when(F.col('rn_close') == 1, F.col('value')))"):
        "native-scale: additive aggregate/passthrough of fixed-scale values rounded at >= their native scale — the true value's decimal expansion terminates at or before the round scale, so a tie (digit 5 one place deeper) is unreachable",
    ('distributed_system_mapreduce_spark/operators/timewin.py',
     "F.max(F.when(F.col('rn_open') == 1, F.col('value')))"):
        "native-scale: additive aggregate/passthrough of fixed-scale values rounded at >= their native scale — the true value's decimal expansion terminates at or before the round scale, so a tie (digit 5 one place deeper) is unreachable",
    ('distributed_system_mapreduce_spark/operators/timewin.py',
     "F.min('value')"):
        "native-scale: additive aggregate/passthrough of fixed-scale values rounded at >= their native scale — the true value's decimal expansion terminates at or before the round scale, so a tie (digit 5 one place deeper) is unreachable",
    ('distributed_system_mapreduce_spark/operators/timewin.py',
     "F.sum('value')"):
        "native-scale: additive aggregate/passthrough of fixed-scale values rounded at >= their native scale — the true value's decimal expansion terminates at or before the round scale, so a tie (digit 5 one place deeper) is unreachable",
    ('distributed_system_mapreduce_spark/operators/timewin.py',
     "F.when(F.col('sigma_s') + F.col('mu_s') == 0, F.lit(0.0)).otherwise((F.col('sigma_s') - F.col('mu_s')) / (F.col('sigma_s"):
        'free-double: the rounded value passes through non-fixed-scale doubles (embedding components, sqrt/log/pow-derived scores) reached via a named column the AST cannot see — an exact decimal tie is a measure-zero event; pinned at sf0.01+sf0.1',
    ('distributed_system_mapreduce_spark/operators/timewin.py',
     'corr'):
        'free-double: the rounded value passes through non-fixed-scale doubles (embedding components, sqrt/log/pow-derived scores) reached via a named column the AST cannot see — an exact decimal tie is a measure-zero event; pinned at sf0.01+sf0.1',
    ('distributed_system_mapreduce_spark/operators/windows.py',
     "F.sum('o_totalprice').over(w)"):
        "native-scale: additive aggregate/passthrough of fixed-scale values rounded at >= their native scale — the true value's decimal expansion terminates at or before the round scale, so a tie (digit 5 one place deeper) is unreachable",
    ('distributed_system_mapreduce_spark/streaming/windows.py',
     "F.sum('value')"):
        "native-scale: additive aggregate/passthrough of fixed-scale values rounded at >= their native scale — the true value's decimal expansion terminates at or before the round scale, so a tie (digit 5 one place deeper) is unreachable",
}


def _contains_irrational(node: ast.AST) -> bool:
    for sub in ast.walk(node):
        if isinstance(sub, ast.Call):
            fn = sub.func
            name = None
            if isinstance(fn, ast.Attribute):
                name = fn.attr
            elif isinstance(fn, ast.Name):
                name = fn.id
            if name in IRRATIONAL_FUNCS:
                return True
    return False


def _is_round_call(node: ast.Call) -> bool:
    fn = node.func
    return (
        isinstance(fn, ast.Attribute)
        and fn.attr == "round"
        and isinstance(fn.value, ast.Name)
        and fn.value.id == "F"
    )


def audit() -> list[dict]:
    sites: list[dict] = []
    for dirpath, _dirs, files in sorted(os.walk(PKG)):
        for fname in sorted(files):
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            rel = os.path.relpath(path, REPO_ROOT)
            with open(path) as fh:
                src = fh.read()
            tree = ast.parse(src, filename=rel)
            for node in ast.walk(tree):
                if not (isinstance(node, ast.Call) and _is_round_call(node)):
                    continue
                arg = node.args[0] if node.args else None
                scale = None
                if len(node.args) > 1 and isinstance(
                    node.args[1], ast.Constant
                ):
                    scale = node.args[1].value
                no_scale = len(node.args) < 2
                if no_scale and arg is not None:
                    kind = "repr_int"
                elif arg is not None and _contains_irrational(arg):
                    kind = "irrational"
                else:
                    kind = "rational"
                sites.append({
                    "file": rel,
                    "line": node.lineno,
                    "scale": scale if not no_scale else 0,
                    "kind": kind,
                    "expr": ast.unparse(arg)[:120] if arg is not None else "",
                })
    return sites


def main() -> None:
    sites = audit()
    counts: dict[str, int] = {}
    for s in sites:
        counts[s["kind"]] = counts.get(s["kind"], 0) + 1
    unlisted = [
        s for s in sites
        if s["kind"] == "rational"
        and (s["file"], s["expr"]) not in KNOWN_RATIONAL_SAFE
    ]
    if "--json" in sys.argv:
        print(json.dumps({"counts": counts, "sites": sites}, indent=1))
        return
    for s in sites:
        if s["kind"] == "rational":
            j = KNOWN_RATIONAL_SAFE.get((s["file"], s["expr"]))
            mark = j.split(":")[0] if j else "UNLISTED"
            print(f"{s['file']}:{s['line']} [{mark}] round(..., {s['scale']})"
                  f"  {s['expr'][:90]}")
    print(json.dumps({"counts": counts, "unlisted_rational": len(unlisted)}))


if __name__ == "__main__":
    main()
