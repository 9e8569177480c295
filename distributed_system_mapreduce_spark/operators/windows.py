"""Analytic window functions (SURVEY.md §2.7).

MapReduce parity: secondary sort (values sorted within a key group) plus an
in-reducer accumulator — the published pattern for rank / previous-record /
running-total jobs. Spark expresses all three as window functions over a
single shuffle on the partition key.

Scale notes (100 TB):
- One shuffle per distinct (partitionBy, orderBy) pair; all three queries
  here reuse the per-key partitioning Spark picks, no extra exchanges.
- Every window orderBy ends in a unique column (event_id / o_orderkey) so
  lag/row-ordering is deterministic under any physical partitioning
  (SURVEY.md §7.3.3).
- ``rowsBetween`` (not rangeBetween) for the running sum: row frames stream
  in O(1) memory per key; range frames must buffer peers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.io import load


@register(
    "window_rank",
    oracle="""
    select o_orderkey, o_orderpriority, o_totalprice,
           rank() over (partition by o_orderpriority
                        order by o_totalprice desc) as rnk
    from orders
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank orders by totalprice within each priority class.

    rank() is tie-stable: equal totalprice ⇒ equal rank, so no unique
    tiebreak is needed for value determinism.
    """
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"))
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.rank().over(w).alias("rnk"),
    )


@register(
    "window_lag_lead",
    oracle="""
    select event_id, user_id,
           epoch_us(ts) - epoch_us(lag(ts) over (partition by user_id
                                                 order by ts, event_id)) as gap_us,
           epoch_us(lead(ts) over (partition by user_id
                                   order by ts, event_id)) - epoch_us(ts) as next_gap_us
    from events
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user gap to previous/next event in microseconds.

    Gaps are integer µs differences — tz-independent and float-free, so both
    engines agree bit-for-bit. First/last events have NULL gaps.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    return ev.select(
        "event_id",
        "user_id",
        (us - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
        (F.unix_micros(F.lead("ts").over(w)) - us).alias("next_gap_us"),
    )


@register(
    "window_running_sum",
    oracle="""
    select o_custkey, o_orderkey,
           round(sum(o_totalprice) over (partition by o_custkey
                                         order by o_orderdate, o_orderkey
                                         rows between unbounded preceding
                                                  and current row), 2) as running_total
    from orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer in order-date order (in-reducer accumulator).

    The frame order is fully determined by the unique o_orderkey tiebreak, so
    both engines add the same doubles in the same order; rounding guards the
    final ulp anyway.
    """
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )
