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
