"""Sorts, limits, top-k (SURVEY.md §2.6).

MapReduce parity: distributed sort (the TeraSort example, OSDI'04 §2.3) uses
a total-order partitioner + per-partition sort; top-k is the heap-in-combiner
pattern; per-group top-k is the secondary-sort pattern.

Scale notes (100 TB):
- ``sort_global`` → Spark range-partitioned exchange (sampled split points)
  + per-partition sort: exactly the TeraSort physical plan, for free.
- ``topk_orders`` compiles to ``TakeOrderedAndProject``: each partition keeps
  a k-row heap and only k·partitions rows ever reach the driver — never a
  global sort.
- ``topk_per_group`` uses a rank window; Spark 3.5+ inserts a
  WindowGroupLimit (per-partition top-k pushdown) before the shuffle, so the
  exchange carries ≤k rows per group, not the whole table.
- Every ordering ends in a unique key (SURVEY.md §7.3.3) so results are
  deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.io import load


@register(
    "sort_global",
    oracle="""
    select o_orderkey, o_totalprice, o_orderpriority
    from orders
    order by o_totalprice desc, o_orderkey
    """,
)
def sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed total-order sort of orders (TeraSort shape)."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )


@register(
    "topk_orders",
    oracle="""
    select o_orderkey, o_totalprice, o_orderpriority
    from orders
    order by o_totalprice desc, o_orderkey
    limit 20
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 orders by totalprice, unique-key tiebreak for determinism."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .limit(20)
    )


@register(
    "topk_per_group",
    oracle="""
    select p_brand, p_partkey, p_retailprice, rn from (
      select p_brand, p_partkey, p_retailprice,
             row_number() over (partition by p_brand
                                order by p_retailprice desc, p_partkey) as rn
      from part)
    where rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts per brand by retail price (secondary-sort pattern).

    Per-brand selection is the salted two-stage top-k
    (``plans.salted_topk``): brands are a bounded dimension, so a plain
    brand-partitioned rank window would sort a corpus-sized slice in one
    task per brand — the canonical straggler this engine re-plans
    everywhere (row-identical result; the oracle keeps the naive window).
    """
    from ..plans.topk import salted_topk

    part = load(spark, sf_dir, "part")
    return salted_topk(
        part.select("p_brand", "p_partkey", "p_retailprice"),
        [F.desc("p_retailprice"), F.asc("p_partkey")],
        3,
        salt_col="p_partkey",
        group_cols=("p_brand",),
        rank_col="rn",
    )
