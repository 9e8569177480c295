"""Aggregations (SURVEY.md §2.4): grouped, distinct, approximate, rollup.

MapReduce parity: grouped aggregation is the combiner+reduce pattern
(OSDI'04 §4.3); Spark's HashAggregate(partial) → shuffle → HashAggregate(final)
is the same physical shape, chosen automatically.

Scale notes (100 TB):
- ``countDistinct`` expands to Spark's two-phase distinct aggregation —
  shuffle carries (group, value) pairs once, never raw rows twice.
- ``approx_count_distinct`` (HyperLogLog++) is the 100 TB path for distinct
  cardinality: constant-size sketches merge associatively, so the shuffle is
  O(groups), not O(distinct values). Exact distinct is kept for parity.
- Rollup computes all grouping sets in one pass (Expand + single shuffle),
  not one job per level as chained MapReduce would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.io import load


@register(
    "agg_pricing_summary",
    oracle="""
    select l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                            as sum_qty,
           round(sum(l_extendedprice), 2)                                       as sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                    as sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)      as sum_charge,
           round(avg(l_quantity), 2)                                            as avg_qty,
           round(avg(l_extendedprice), 2)                                       as avg_price,
           round(avg(l_discount), 4)                                            as avg_disc,
           count(*)                                                             as count_order
    from lineitem
    where l_shipdate <= timestamp '1998-09-02'
    group by l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP: TPC-H Q1 pricing summary — filter, group, 8 aggregates."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = disc_price * (F.lit(1) + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_distinct_count",
    oracle="""
    select l_returnflag, count(distinct l_partkey) as distinct_parts
    from lineitem
    group by l_returnflag
    """,
)
def agg_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count per group (two-round MapReduce distinct)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts")
    )


@register("agg_approx_distinct")  # rows-only: HLL sketch differs from DuckDB's
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event_type (HyperLogLog++).

    The 100 TB path for cardinality: mergeable constant-size sketches.
    Declared without oracle_sql — DuckDB's approx_count_distinct uses a
    different sketch, so values cannot hash-match (SURVEY.md §2.4).
    """
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users")
    )


@register(
    "agg_grouping_sets",
    oracle="""
    select n_name,
           cast(year(o_orderdate) as int) as o_year,
           round(sum(o_totalprice), 2) as revenue,
           count(*) as n_orders
    from orders
    join customer on o_custkey = c_custkey
    join nation on c_nationkey = n_nationkey
    group by rollup(n_name, cast(year(o_orderdate) as int))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup revenue by (nation, year) → (nation) → (): one Expand pass,
    where chained MapReduce would need one job per grouping level."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    j = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .withColumn("o_year", F.year("o_orderdate"))
    )
    return j.rollup("n_name", "o_year").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "agg_histogram",
    oracle="""
    select cast(floor(value / 10) as bigint) as bucket,
           count(*) as cnt,
           round(sum(value), 2) as sum_value
    from events
    group by bucket
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of events.value (width-10 buckets)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.floor(F.col("value") / 10).cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
