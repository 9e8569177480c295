"""Chunked distributed prefix sum — the running-total sibling of
``plans.topk``.

A running sum over ``Window.partitionBy(group).orderBy(...)`` sorts each
group's FULL slice in one task — fine when groups are plentiful (per-user
running totals), a straggler factory when the group is a handful of strata
or the whole table (budget-fill samplers, Pareto/ABC cumulative shares).
The classic fix is the two-level scan: split the order into chunks that are
MONOTONE along it, compute per-chunk totals (a tiny rollup), turn those
into per-chunk starting offsets with a window over chunk-cardinality rows,
and add each row's within-chunk running sum — every window partition is now
either chunk-sized data or chunk-count metadata.

The caller owes one invariant: ``chunk_col`` must be non-decreasing along
``order_cols`` within each group (an md5-prefix chunk under an md5 order, a
negated log2 revenue band under a revenue-desc order). The result is then
row-identical to the naive single-window running sum — chunking is pure
physical parallelism, invisible in oracles.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_CHUNK = "__scan_chunk"
_IN = "__scan_in"
_OFF = "__scan_off"


def chunked_running_sum(
    df: DataFrame,
    sum_col: str,
    order_cols: Sequence[Column],
    chunk_col: Column,
    *,
    group_cols: Iterable[str] = (),
    out_col: str = "cum",
) -> DataFrame:
    """``df`` plus ``out_col`` = running sum of ``sum_col`` under the total
    order ``order_cols`` within each ``group_cols`` group — row-identical
    to ``sum(sum_col).over(Window.partitionBy(*group_cols)
    .orderBy(*order_cols).rowsBetween(unboundedPreceding, currentRow))``
    but with no group-sized window partition.

    ``chunk_col`` must be monotone non-decreasing along ``order_cols``
    within each group; its cardinality bounds the offsets window (keep it
    at tens-to-thousands). The offsets table is chunk-cardinality rows and
    broadcasts back onto the data.
    """
    groups = list(group_cols)
    tagged = df.withColumn(_CHUNK, chunk_col)
    totals = tagged.groupBy(*groups, _CHUNK).agg(
        F.sum(sum_col).alias("__chunk_total")
    )
    w_off = (
        Window.partitionBy(*groups).orderBy(_CHUNK)
        if groups
        else Window.orderBy(_CHUNK)
    ).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        *groups,
        _CHUNK,
        F.coalesce(F.sum("__chunk_total").over(w_off), F.lit(0)).alias(_OFF),
    )
    w_in = Window.partitionBy(*groups, _CHUNK).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        tagged.withColumn(_IN, F.sum(sum_col).over(w_in))
        .join(F.broadcast(offsets), groups + [_CHUNK])
        .withColumn(out_col, F.col(_IN) + F.col(_OFF))
        .drop(_CHUNK, _IN, _OFF)
    )


_RN = "__scan_rn"
_TOT = "__scan_tot"


def chunked_global_rank(
    df: DataFrame,
    order_cols: Sequence[Column],
    chunk_col: Column,
    *,
    out_col: str = "rank",
    total_col: str | None = None,
) -> DataFrame:
    """``df`` plus ``out_col`` = 1-based global ``row_number`` under the
    total order ``order_cols`` — row-identical to
    ``row_number().over(Window.orderBy(*order_cols))`` but with no
    corpus-sized single-task sort.

    Same two-level scan as :func:`chunked_running_sum`, counting rows
    instead of summing a measure: per-chunk counts (a partial-agg rollup),
    a prior-chunks offset window over chunk-cardinality METADATA rows, and
    a within-chunk ``row_number`` whose partitions are chunk-sized.
    ``chunk_col`` must be non-decreasing along ``order_cols`` (a value
    band under a value order, a negated band under a desc order; pack a
    composite key in ``F.struct`` when the leading key is tie-heavy).
    Chunk granularity is the scale knob: keep chunk cardinality at
    hundreds-to-thousands so the offsets window and its broadcast stay
    metadata-sized, while each within-chunk sort holds corpus/chunks rows.

    ``total_col`` additionally attaches the group total row count — it
    rides the same chunk-cardinality offsets frame (a full-frame window
    over the rollup), NOT a one-row crossJoin, so no BNLJ enters the plan.

    ``out_col`` is a LONG (ADVICE r10): the global rank exceeds 2**31 as
    soon as the frame does, so the int cast the first version carried
    would silently overflow exactly at the scale this helper exists for.
    Callers that expose the rank in an int-typed result cast at the edge.
    """
    tagged = df.withColumn(_CHUNK, chunk_col)
    counts = tagged.groupBy(_CHUNK).agg(F.count(F.lit(1)).alias("__chunk_n"))
    w_off = Window.orderBy(_CHUNK).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        _CHUNK,
        F.coalesce(F.sum("__chunk_n").over(w_off), F.lit(0)).alias(_OFF),
    )
    if total_col is not None:
        w_tot = Window.orderBy(_CHUNK).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        offsets = counts.select(
            _CHUNK,
            F.coalesce(F.sum("__chunk_n").over(w_off), F.lit(0)).alias(_OFF),
            F.sum("__chunk_n").over(w_tot).alias(total_col),
        )
    w_in = Window.partitionBy(_CHUNK).orderBy(*order_cols)
    out = (
        tagged.withColumn(_RN, F.row_number().over(w_in))
        .join(F.broadcast(offsets), [_CHUNK])
        .withColumn(out_col, F.col(_RN).cast("long") + F.col(_OFF))
        .drop(_CHUNK, _RN, _OFF)
    )
    return out


def _exact_div(a: Column, b: Column) -> Column:
    """``a div b`` on longs with NO floating-point rounding and NO config
    dependence.

    ``a / b`` in Spark is double division; near 2**53 the FP quotient can
    land on the wrong side of the cast-truncation boundary (ADVICE r9).
    The first fix routed through decimal(38,0) division, but that is only
    exact under ``spark.sql.decimal.operations.allowPrecisionLoss=true``
    (ADVICE r10) — with it false the quotient type is scale-capped and
    nulls for any result >= 1. ``div`` (IntegralDivide, registered as a
    SQL function) is long-native integer division: exact at any long
    magnitude under either setting.
    """
    return F.call_function("div", a.cast("long"), b.cast("long"))


def chunked_ntile(
    df: DataFrame,
    n: int,
    order_cols: Sequence[Column],
    chunk_col: Column,
    *,
    out_col: str = "bucket",
) -> DataFrame:
    """``df`` plus ``out_col`` = ``ntile(n)`` under the total order
    ``order_cols`` — row-identical to
    ``F.ntile(n).over(Window.orderBy(*order_cols))`` (same ceil-first
    bucket-size rule) but built from :func:`chunked_global_rank`, so no
    single task ever sorts the full frame.

    SQL ntile over total rows ``c``: the first ``c % n`` buckets take
    ``c div n + 1`` rows, the rest ``c div n``. Derived per row from the
    chunked global rank ``r`` and the metadata-frame total via
    :func:`_exact_div` — true integer division, exact at any long
    magnitude (the ``greatest(q, 1)`` guards the unreachable second
    branch when ``c < n`` from ANSI div-by-zero).
    """
    _gr = "__scan_grank"
    ranked = chunked_global_rank(
        df, order_cols, chunk_col, out_col=_gr, total_col=_TOT
    )
    tot = F.col(_TOT).cast("long")
    nl = F.lit(n).cast("long")
    q = _exact_div(tot, nl)
    rem = tot % nl
    cut = rem * (q + F.lit(1))
    r = F.col(_gr).cast("long")
    bucket = F.when(
        r <= cut, _exact_div(r - F.lit(1), q + F.lit(1)) + F.lit(1)
    ).otherwise(
        rem
        + _exact_div(r - cut - F.lit(1), F.greatest(q, F.lit(1)))
        + F.lit(1)
    )
    return ranked.withColumn(out_col, bucket.cast("int")).drop(_gr, _TOT)
