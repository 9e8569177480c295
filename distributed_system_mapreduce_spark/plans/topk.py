"""Salted two-stage top-k — the shared ranked-retrieval plan shape.

A plain ``row_number() over (partition by group order by ...) <= k`` is the
straggler factory of retrieval-shaped queries: when the group column is
low-cardinality (a handful of query ids, sources, or languages) every
partition holds a full corpus-side slice, so at 100x scale each group is a
single-task sort of ~N rows.  The engine already engineered this smell out of
``pipeline_epoch_shuffle`` ("per-shard windows, no global row_number") and
``pq_assign`` ("min_by, NOT a rank window"); this module makes the remaining
pattern — *exact* per-group top-k with a total order — scale the same way.

Plan: salt the rows by hashing a unique tiebreak column into ``buckets``
sub-partitions, take per-(group, salt) top-k with the ordinary rank window
(bounded partitions of ~N/(G*buckets) rows, parallel across the cluster),
then rank the surviving ``G * buckets * k`` rows with the same total order to
assign final ranks.  Because the order is total (rounded score + unique-id
tiebreak, SURVEY.md §7.3.1), every true top-k row survives its bucket's
local top-k, so the two-stage result is row-identical to the naive window —
oracles never change.  Stage 2's partitions hold at most ``buckets * k`` rows
by construction, so even the global (no-group) variant never sorts more than
a driver-small frame in one task.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Stage-1 fan-out. 32 matches local[32]; on a large cluster the survivor
#: set is buckets*k per group either way — raising it only adds parallelism.
TOPK_BUCKETS = 32

_SALT = "__topk_salt"
_R1 = "__topk_r1"


def salted_topk(
    df: DataFrame,
    order_cols: Sequence[Column],
    k: int,
    *,
    salt_col: str,
    group_cols: Iterable[str] = (),
    rank_col: str = "rnk",
    buckets: int = TOPK_BUCKETS,
) -> DataFrame:
    """Exact per-``group_cols`` top-``k`` under the total order ``order_cols``,
    with final ranks in ``rank_col`` — row-identical to
    ``row_number().over(Window.partitionBy(*group_cols).orderBy(*order_cols))
    <= k`` but with no corpus-sized window partition.

    ``order_cols`` MUST be a total order (end with a unique tiebreak such as
    the id column) and ``salt_col`` MUST name a column that is unique within
    each group — both are already required for engine-stable ranking, so
    callers pay nothing extra.  ``salt_col`` is hashed (xxhash64 -> pmod)
    into ``buckets`` stage-1 sub-partitions.
    """
    tagged = df.withColumn(
        _SALT, F.pmod(F.xxhash64(F.col(salt_col)), F.lit(buckets))
    )
    groups = list(group_cols)
    w1 = Window.partitionBy(*groups, _SALT).orderBy(*order_cols)
    survivors = (
        tagged.withColumn(_R1, F.row_number().over(w1))
        .filter(F.col(_R1) <= k)
        .drop(_SALT, _R1)
    )
    w2 = (
        Window.partitionBy(*groups).orderBy(*order_cols)
        if groups
        else Window.orderBy(*order_cols)
    )
    return survivors.withColumn(rank_col, F.row_number().over(w2)).filter(
        F.col(rank_col) <= k
    )
