"""Composite analytical flagships (TPC-H-derived shapes).

Deep multiway-join analytics a warehouse user runs daily, each one exercising
a different optimizer-critical shape: conditional-share aggregation over a
5-table snowflake (Q8), a double-dimension join where the SAME tiny dim table
serves two roles (Q7), and a decorrelated per-group argmin (Q2). The point at
100 TB is the join strategy: ``region``/``nation`` are fixed-cardinality and
always broadcast (sources/io.py ALWAYS_BROADCAST); ``supplier``/``customer``
grow with scale, so their joins are left to AQE, which picks broadcast at
small SF and shuffled-hash/sort-merge on a cluster — the declarative plan is
the same either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..cache import track
from ..plans.scan import chunked_running_sum
from ..exactmath import (
    recombine_units,
    round_div,
    round_div_long,
    split_units,
    sql_round_div,
)
from ..registry import register
from ..sources.io import load

MKT_REGION = "ASIA"
MKT_NATION = "NATION_5"



#: revenue in exact 1e-4-dollar units: pc*(100-dc) with pc/dc the
#: repr-corrected integer cents of the 2-dp price/discount — the exact
#: integer both engines agree on row-for-row (r16 tie rework)
_REV4_SQL = (
    "cast(round(l_extendedprice * 100) as bigint)"
    " * (100 - cast(round(l_discount * 100) as bigint))"
)
def _rev4() -> Column:
    """Column mirror of _REV4_SQL (built lazily — Columns need a live
    session)."""
    return F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )

@register(
    "sql_market_share",
    oracle=f"""
    select cast(year(o_orderdate) as int) as o_year,
           {sql_round_div(
               "sum(case when n_s.n_name = '" + MKT_NATION + "' then "
               + _REV4_SQL + " else 0 end)",
               "sum(" + _REV4_SQL + ")", 4)}
             as mkt_share,
           cast(count(*) as bigint) as n_lines
    from lineitem
    join orders   on o_orderkey  = l_orderkey
    join customer on c_custkey   = o_custkey
    join nation n_c on n_c.n_nationkey = c_nationkey
    join region   on r_regionkey = n_c.n_regionkey
    join supplier on s_suppkey   = l_suppkey
    join nation n_s on n_s.n_nationkey = s_nationkey
    where r_name = '{MKT_REGION}'
    group by o_year
    order by o_year
    """,
)
def sql_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: {MKT_NATION}'s share of supply revenue into the
    {MKT_REGION} customer market, by order year.

    The share is a single conditional aggregation (sum-if over the supplier
    nation) — one pass, no self-join of the revenue stream against itself.
    Region/nation dims broadcast unconditionally; the customer and supplier
    joins stay AQE-sized. The region filter reaches the scan side of the
    snowflake before the fact join (Catalyst pushes it through the
    broadcast joins), so non-{MKT_REGION} customers never shuffle.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")

    n_c = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n_s = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_c), cust.c_nationkey == F.col("c_nkey"))
        .join(
            F.broadcast(
                region.filter(F.col("r_name") == MKT_REGION).select("r_regionkey")
            ),
            F.col("c_rkey") == F.col("r_regionkey"),
        )
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_s), supp.s_nationkey == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            # revenue as exact 1e-4-unit integers (pc*(100-dc)): the
            # share is then ONE integer ratio, half-up-exact at ties.
            # r16 optimization round: the two decimal(38,0) sums left the
            # long codegen fast path (the flagship's measured 2-4x agg
            # penalty); split_units keeps all four aggregates LONG while
            # the recombined decimals stay exact to ~9e18 dollars —
            # identical output, same headroom.
            *(
                F.sum(c).alias(n)
                for n, c in zip(
                    ("m_q", "m_r", "t_q", "t_r"),
                    split_units(
                        F.when(
                            F.col("supp_nation") == MKT_NATION, _rev4()
                        ).otherwise(F.lit(0)),
                        10000,
                    )
                    + split_units(_rev4(), 10000),
                )
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select(
            "o_year",
            round_div(
                recombine_units(F.col("m_q"), F.col("m_r"), 10000),
                recombine_units(F.col("t_q"), F.col("t_r"), 10000),
                4,
            ).alias("mkt_share"),
            "n_lines",
        )
        .orderBy("o_year")
    )


@register(
    "sql_nation_volume",
    oracle="""
    select n_s.n_name as supp_nation,
           n_c.n_name as cust_nation,
           cast(year(o_orderdate) as int) as o_year,
           cast(round(sum(cast(l_extendedprice * (1 - l_discount)
                               as decimal(18, 6))), 2) as double) as volume,
           cast(count(*) as bigint) as n_lines
    from lineitem
    join orders   on o_orderkey = l_orderkey
    join customer on c_custkey  = o_custkey
    join nation n_c on n_c.n_nationkey = c_nationkey
    join supplier on s_suppkey  = l_suppkey
    join nation n_s on n_s.n_nationkey = s_nationkey
    group by supp_nation, cust_nation, o_year
    """,
)
def sql_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between every (supplier
    nation, customer nation) pair per order year.

    The nation dim joins TWICE under different roles — the classic
    self-role join that trips engines which key broadcast reuse on table
    identity; Spark broadcasts each aliased projection independently. One
    fact-table shuffle (orders keys), everything else broadcast or
    AQE-sized; output cardinality is nations^2 x years — driver-tiny.

    Revenue accumulates as exact 1e-4-unit integers (r16 optimization
    round): with thousands of small groups, double summation-order noise
    lands on round-half boundaries somewhere, so the sums must be exact
    and order-independent — previously decimal(18,6), now the flagship's
    split_units LONG decomposition, which keeps the aggregate on the
    whole-stage-codegen fast path (interleaved A/B at sf0.1: 1.53 s ->
    1.26 s, outputs bit-equal across all 4375 groups) with the identical
    exactness story.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")

    n_c = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    n_s = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_c), cust.c_nationkey == F.col("c_nkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_s), supp.s_nationkey == F.col("s_nkey"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            # r16 optimization round: revenue as exact 1e-4-unit integers
            # through the flagship's split_units long fast path — the
            # decimal(18,6) sum left whole-stage codegen (interleaved A/B
            # at sf0.1: 1.53 s -> 1.26 s, outputs bit-equal across all
            # 4375 groups); recombined totals stay exact to ~9e18 dollars
            *(
                F.sum(c).alias(n)
                for n, c in zip(
                    ("v_q", "v_r"), split_units(_rev4(), 10000)
                )
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select(
            "supp_nation",
            "cust_nation",
            "o_year",
            round_div(
                recombine_units(F.col("v_q"), F.col("v_r"), 10000),
                F.lit(10000),
                2,
            ).alias("volume"),
            "n_lines",
        )
    )


@register(
    "sql_min_cost_supplier",
    oracle=f"""
    with offers as (
      select l_partkey, l_suppkey,
             round(avg(l_extendedprice / l_quantity), 2) as unit_price
      from lineitem
      group by l_partkey, l_suppkey),
    ranked as (
      select l_partkey, l_suppkey, unit_price,
             row_number() over (partition by l_partkey
                                order by unit_price, l_suppkey) as rn
      from offers)
    select p_partkey, p_name, s_name,
           unit_price,
           round(p_retailprice, 2) as p_retailprice,
           {sql_round_div('cast(round(unit_price * 100) as bigint)',
                          'cast(round(p_retailprice * 100) as bigint)',
                          4)} as price_ratio
    from ranked
    join part     on p_partkey = l_partkey
    join supplier on s_suppkey = l_suppkey
    where rn = 1
    order by price_ratio, p_partkey
    limit 20
    """,
)
def sql_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: the fixture set has no partsupp, so observed
    lineitem unit prices stand in for supply cost): for every part, the
    supplier offering the lowest average unit price, reporting the 20 best
    bargains vs list price.

    The correlated "= (select min(..) ...)" subquery is expressed directly
    as its decorrelated form — one (part, supplier) rollup then a per-part
    argmin — which is exactly what Catalyst rewrites the correlated form
    into; no per-part subquery execution ever happens. Unit prices are
    rounded BEFORE ranking with a suppkey tiebreak, so the argmin is
    total-ordered and engine-stable. r17 optimization round (guide §2.3
    "aggregate before you shuffle"): the per-part argmin is
    ``min(struct(unit_price, suppkey))`` — lexicographic struct order ==
    the oracle's (unit_price, l_suppkey) row_number ordering, row-for-row.
    Struct min plans as a SortAggregate (so per-partition sorts remain),
    but it PARTIAL-aggregates map-side: the per-part exchange carries one
    partial minimum per (part, upstream partition) instead of every
    (part, supplier) offer row the rank window shuffled — neutral at
    sf0.1 (interleaved A/B 1.18 vs 1.15 s), strictly fewer shuffled rows
    as suppliers-per-part grows (plan diff:
    plans/r17/sql_min_cost_supplier_{before,after}.txt). Two shuffles
    total (rollup, per-part min); the part/supplier lookups on the
    result are broadcast.
    """
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    supp = load(spark, sf_dir, "supplier")

    offers = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(
            F.round(
                F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 2
            ).alias("unit_price")
        )
    )
    best = (
        offers.groupBy("l_partkey")
        .agg(F.min(F.struct("unit_price", "l_suppkey")).alias("b"))
        .select(
            "l_partkey",
            F.col("b.unit_price").alias("unit_price"),
            F.col("b.l_suppkey").alias("l_suppkey"),
        )
    )
    return (
        best.join(part, best.l_partkey == part.p_partkey)
        .join(supp, best.l_suppkey == supp.s_suppkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "unit_price",
            F.round("p_retailprice", 2).alias("p_retailprice"),
            # 2-dp/2-dp integer-cents ratio, half-up-exact at ties
            round_div_long(
                F.round(F.col("unit_price") * 100).cast("long"),
                F.round(F.col("p_retailprice") * 100).cast("long"),
                4,
            ).alias("price_ratio"),
        )
        .orderBy("price_ratio", "p_partkey")
        .limit(20)
    )


@register(
    "orders_mom_growth",
    oracle=f"""
    with monthly as (
      select strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') as month,
             cast(round(sum(cast(o_totalprice as decimal(18, 4))), 2)
                  as double) as revenue,
             count(*) as n_orders
      from orders
      group by all)
    select month, revenue, n_orders,
           {sql_round_div(
               'cast(round(revenue * 100) as hugeint)'
               ' - lag(cast(round(revenue * 100) as hugeint))'
               '     over (order by month)',
               'lag(cast(round(revenue * 100) as hugeint))'
               ' over (order by month)', 4)}
             as mom_growth
    from monthly
    """,
)
def orders_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: monthly rollup plus lag-ratio.

    One partial-agg shuffle to months (the only full-data pass); the lag
    window runs over the months-cardinality rollup — single-partition by
    construction and bounded by the calendar, not the corpus. Revenue in
    decimal so the growth ratio's inputs are summation-order-stable.
    """
    orders = load(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month"
        )
    ).agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("month")
    return monthly.select(
        "month",
        "revenue",
        "n_orders",
        # (rev - lag)/lag on exact integer cents (revenue is 2-dp by
        # construction); decimal path — monthly cents outgrow the long
        # bound at large SF, and the month spine is tiny
        round_div(
            F.round(F.col("revenue") * 100).cast("long")
            - F.round(F.lag("revenue").over(w) * 100).cast("long"),
            F.round(F.lag("revenue").over(w) * 100).cast("long"),
            4,
        ).alias("mom_growth"),
    )


@register(
    "orders_abc_pareto",
    oracle="""
    with per_cust as (
      select o_custkey,
             round(sum(cast(o_totalprice as decimal(18, 4))), 2) as revenue
      from orders
      group by o_custkey),
    ranked as (
      select o_custkey, revenue,
             cast(sum(revenue) over (order by revenue desc, o_custkey
                   rows between unbounded preceding and current row)
                  / sum(revenue) over () as double) as cum_share
      from per_cust),
    classed as (
      select case when cum_share <= 0.8 then 'A'
                  when cum_share <= 0.95 then 'B'
                  else 'C' end as abc_class,
             cast(revenue as double) as revenue
      from ranked)
    select abc_class,
           count(*) as n_customers,
           round(sum(revenue), 2) as class_revenue
    from classed
    group by abc_class
    order by abc_class
    """,
)
def orders_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification: customers bucketed by cumulative
    revenue share (A = first 80%, B = to 95%, C = tail).

    The cumulative share runs over the per-customer ROLLUP (the only
    full-data shuffle is that partial-agg), in DECIMAL — cumulative sums
    are maximally boundary-sensitive, and decimal arithmetic makes every
    prefix sum exact and order-independent, so class edges cannot drift
    between engines. Ordering is total (revenue desc, custkey).

    The prefix sum itself is the chunked distributed scan
    (``plans.chunked_running_sum``): a single global running-sum window
    (and the companion ``over ()`` grand total) would sort EVERY customer
    in one task — at warehouse scale, millions of rows. Chunking on the
    negated log2 revenue band (monotone along the revenue-desc order)
    bounds each window partition to one band; the grand total becomes a
    broadcast 1-row aggregate. Decimal sums are exact under any grouping,
    so the chunked cum equals the naive window's to the last digit and the
    oracle keeps its single-window form.
    """
    orders = load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2
        ).alias("revenue")
    )
    total = per_cust.agg(F.sum("revenue").alias("__total"))
    cum = chunked_running_sum(
        per_cust,
        "revenue",
        [F.desc("revenue"), F.asc("o_custkey")],
        -F.floor(F.log2(F.col("revenue").cast("double"))).cast("int"),
        out_col="__cum",
    )
    ranked = cum.crossJoin(F.broadcast(total)).select(
        "o_custkey",
        "revenue",
        (F.col("__cum").cast("double") / F.col("__total").cast("double"))
        .alias("cum_share"),
    )
    classed = ranked.select(
        F.when(F.col("cum_share") <= 0.8, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
        F.col("revenue").cast("double").alias("revenue"),
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("revenue"), 2).alias("class_revenue"),
        )
        .orderBy("abc_class")
    )


@register(
    "data_quality_checks",
    oracle="""
    select 'lineitem_orphan_orderkey' as check_name,
           (select count(*) from lineitem
            where l_orderkey not in (select o_orderkey from orders))
             as n_violations
    union all
    select 'orders_orphan_custkey',
           (select count(*) from orders
            where o_custkey not in (select c_custkey from customer))
    union all
    select 'orderkey_not_unique',
           (select count(*) from (
              select o_orderkey from orders
              group by o_orderkey having count(*) > 1))
    union all
    select 'discount_out_of_range',
           (select count(*) from lineitem
            where l_discount < 0 or l_discount > 1)
    union all
    select 'quantity_nonpositive',
           (select count(*) from lineitem where l_quantity <= 0)
    union all
    select 'totalprice_null',
           (select count(*) - count(o_totalprice) from orders)
    order by check_name
    """,
)
def data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality suite (the dbt-test shape): referential
    integrity, uniqueness, range, and null checks as ONE report frame —
    violations counted, never sampled.

    Each check is the scale-correct plan for its class: orphan checks are
    LEFT ANTI joins (ship only the probe key, AQE-sized — never an IN
    subquery materialized on the driver); uniqueness is a partial-agg
    groupBy + HAVING; range/null checks are map-side conditional counts
    fused into one scan per table. The report is a union of 1-row
    aggregates — driver-tiny regardless of corpus size.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")

    def one(name, df):
        return df.select(
            F.lit(name).alias("check_name"),
            F.col("n").cast("bigint").alias("n_violations"),
        )

    checks = [
        one(
            "lineitem_orphan_orderkey",
            li.select("l_orderkey")
            .join(
                orders.select("o_orderkey"),
                li.l_orderkey == F.col("o_orderkey"),
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("n")),
        ),
        one(
            "orders_orphan_custkey",
            orders.select("o_custkey")
            .join(
                cust.select("c_custkey"),
                orders.o_custkey == F.col("c_custkey"),
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("n")),
        ),
        one(
            "orderkey_not_unique",
            orders.groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") > 1)
            .agg(F.count(F.lit(1)).alias("n")),
        ),
        # both lineitem range checks ride ONE scan/aggregate, unpivoted to
        # their two report rows afterward
        li.agg(
            F.sum(
                (
                    (F.col("l_discount") < 0) | (F.col("l_discount") > 1)
                ).cast("bigint")
            ).alias("disc"),
            F.sum((F.col("l_quantity") <= 0).cast("bigint")).alias("qty"),
        ).select(
            F.expr(
                "stack(2, 'discount_out_of_range', disc,"
                " 'quantity_nonpositive', qty)"
                " as (check_name, n_violations)"
            )
        ).select(
            "check_name", F.col("n_violations").cast("bigint")
        ),
        one(
            "totalprice_null",
            orders.agg(
                F.sum(F.col("o_totalprice").isNull().cast("bigint")).alias(
                    "n"
                )
            ),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionAll(c)
    return out.orderBy("check_name")


@register(
    "part_skyline_brand",
    oracle="""
    select p_brand, p_partkey,
           p_retailprice, cast(p_size as int) as p_size
    from part a
    where not exists (
      select 1 from part b
      where b.p_brand = a.p_brand
        and b.p_retailprice <= a.p_retailprice
        and b.p_size <= a.p_size
        and (b.p_retailprice < a.p_retailprice or b.p_size < a.p_size))
    order by p_brand, p_retailprice, p_size, p_partkey
    """,
)
def part_skyline_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand skyline (Pareto frontier) over (retailprice, size): the
    parts no same-brand part beats on BOTH price and size — the classic
    skyline operator (Borzsonyi et al., ICDE 2001) for "cheapest AND
    smallest" product search.

    The oracle states the O(n^2) NOT-EXISTS definition; the engine plan is
    the sort-filter-skyline decomposition, which is linear after one
    aggregation: (1) groupBy (brand, price) -> min(size) collapses the
    input to distinct price points per brand with map-side partial combine
    (only dominated-within-price survivors shuffle); (2) a window over
    price order per brand takes the strictly-preceding running min of
    size — a price point is on the frontier iff its min size undercuts
    every cheaper point (rows preceding = strictly cheaper, since step 1
    left one row per price); (3) the tiny frontier broadcast-joins back to
    the scan to recover the winning part rows, ties included. At 100 TB
    the window runs per brand over |distinct prices| rows, not raw rows —
    no global single-partition order anywhere; for continuous prices an
    optional pre-bucketing or per-partition local-skyline pass (a
    correctness-preserving prune: skyline(S) is a subset of the union of
    partition skylines) caps step 2's input further.
    """
    part = load(spark, sf_dir, "part").select(
        "p_brand", "p_partkey", "p_retailprice", "p_size"
    )
    price_pts = part.groupBy("p_brand", "p_retailprice").agg(
        F.min("p_size").alias("min_size")
    )
    w_prev = (
        Window.partitionBy("p_brand")
        .orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = price_pts.withColumn(
        "prev_min", F.min("min_size").over(w_prev)
    ).filter(
        F.col("prev_min").isNull() | (F.col("min_size") < F.col("prev_min"))
    )
    fr = frontier.select(
        F.col("p_brand").alias("f_brand"),
        F.col("p_retailprice").alias("f_price"),
        F.col("min_size").alias("f_size"),
    )
    return (
        part.join(
            F.broadcast(fr),
            on=[
                part.p_brand == fr.f_brand,
                part.p_retailprice == fr.f_price,
                part.p_size == fr.f_size,
            ],
        )
        .select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.col("p_size").cast("int").alias("p_size"),
        )
        .orderBy("p_brand", "p_retailprice", "p_size", "p_partkey")
    )


#: compaction planner: simulated file inventory granularity and target
#: compacted size (chars stand in for bytes at fixture scale; a real
#: planner reads the table's file manifest).
COMPACT_FILE_MOD = 6
COMPACT_TARGET = 3000


@register(
    "compact_file_bins",
    oracle=f"""
    with files as (
      select source, cast(doc_id % {COMPACT_FILE_MOD} as bigint) as file_id,
             cast(sum(n_chars) as bigint) as bytes
      from documents group by 1, 2),
    planned as (
      select source, file_id, bytes,
             cast(coalesce(sum(bytes) over (
               partition by source order by file_id
               rows between unbounded preceding and 1 preceding), 0)
                  as bigint) as start_off
      from files)
    select source, file_id, bytes,
           cast(start_off // {COMPACT_TARGET} as bigint) as bin_id
    from planned
    order by source, file_id
    """,
)
def compact_file_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner: assign each data file to a
    target-size output bin by running start offset — the maintenance
    operation (Delta OPTIMIZE / Iceberg rewrite_data_files bin-packing)
    that keeps a 100 TB table readable after streaming or per-partition
    ingest leaves thousands of under-sized files.

    The planner's input is METADATA — one row per file (here simulated by
    rolling documents up to ``doc_id % {COMPACT_FILE_MOD}`` "files" with
    summed char sizes; a real run reads the table manifest), so even a
    100 TB table yields only millions of planner rows. Bin assignment is
    first-fit by start offset: a prefix-sum window per table partition
    (source) — no global sort, no single-partition funnel — and
    ``bin_id = start_offset div target`` groups consecutive files into
    ~target-sized rewrite tasks, each of which becomes one independent
    compaction job reading only its own files.
    """
    files = (
        load(spark, sf_dir, "documents")
        .groupBy(
            "source",
            F.pmod(F.col("doc_id"), F.lit(COMPACT_FILE_MOD))
            .cast("bigint")
            .alias("file_id"),
        )
        .agg(F.sum("n_chars").cast("bigint").alias("bytes"))
    )
    w = (
        Window.partitionBy("source")
        .orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        files.withColumn(
            "start_off", F.coalesce(F.sum("bytes").over(w), F.lit(0)).cast("bigint")
        )
        .select(
            "source",
            "file_id",
            "bytes",
            F.floor(F.col("start_off") / COMPACT_TARGET).cast("bigint").alias("bin_id"),
        )
        .orderBy("source", "file_id")
    )


#: z-order geometry: 8 bits per dimension -> 16-bit Morton key, binned in
#: runs of 64 consecutive codes (= 1024 layout bins max).
ZORDER_BITS = 8
ZORDER_BIN = 64


def _morton_terms(x: str, y: str, div_op: str) -> str:
    """Bit-interleave (x, y) into a Morton code with pure integer
    arithmetic — ``div_op`` is the engine's integer-division operator
    (Spark SQL ``div``, DuckDB ``//``) so the SAME formula runs on both."""
    terms = []
    for i in range(ZORDER_BITS):
        terms.append(f"((({x} {div_op} {1 << i}) % 2) * {1 << (2 * i + 1)})")
        terms.append(f"((({y} {div_op} {1 << i}) % 2) * {1 << (2 * i)})")
    return " + ".join(terms)


@register(
    "layout_zorder_cluster",
    oracle=f"""
    with stats as (
      select min(o_custkey) as min_ck, max(o_custkey) as max_ck,
             min(cast(o_orderdate as date)) as min_d,
             max(cast(o_orderdate as date)) as max_d
      from orders),
    scaled as (
      select cast(floor((o_custkey - min_ck) * {1 << ZORDER_BITS}.0
                        / (max_ck - min_ck + 1)) as bigint) as x,
             cast(floor(datediff('day', min_d, cast(o_orderdate as date))
                        * {1 << ZORDER_BITS}.0
                        / (datediff('day', min_d, max_d) + 1)) as bigint) as y,
             o_custkey, cast(o_orderdate as date) as od
      from orders cross join stats),
    coded as (
      select ({_morton_terms("x", "y", "//")}) as z, o_custkey, od
      from scaled)
    select cast(z // {ZORDER_BIN} as bigint) as zbin,
           cast(count(*) as bigint) as n_orders,
           cast(max(o_custkey) - min(o_custkey) as bigint) as ck_span,
           cast(datediff('day', min(od), max(od)) as bigint) as date_span_days
    from coded
    group by 1 order by 1
    """,
)
def layout_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout clustering of orders on
    (o_custkey, o_orderdate): the multi-dimensional data-layout key behind
    Delta ``OPTIMIZE ZORDER BY`` / Iceberg sort orders, which lets min-max
    file skipping prune on BOTH dimensions at once.

    Each dimension is scaled to {1 << ZORDER_BITS} buckets from its
    min/max (a 1-row aggregate crossJoined back — broadcast, no second
    scan shuffle), the bucket indices are bit-interleaved into a Morton
    code with pure integer arithmetic (identical formula on both engines
    via ``_morton_terms``), and rows are grouped into runs of
    {ZORDER_BIN} consecutive codes — the stand-ins for output files. The
    output reports each bin's row count and its custkey/date spans: the
    locality evidence — every bin covers a NARROW rectangle of the
    (customer, date) space, which is exactly what makes min-max skipping
    effective on either predicate. At 100 TB the same key feeds
    ``repartitionByRange(zkey).sortWithinPartitions(zkey)`` and the bins
    become the written files; the planner here is one fact-table shuffle
    on the bin key.
    """
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    stats = orders.agg(
        F.min("o_custkey").alias("min_ck"),
        F.max("o_custkey").alias("max_ck"),
        F.min(F.col("o_orderdate").cast("date")).alias("min_d"),
        F.max(F.col("o_orderdate").cast("date")).alias("max_d"),
    )
    n = 1 << ZORDER_BITS
    scaled = (
        orders.crossJoin(F.broadcast(stats))
        .withColumn("od", F.col("o_orderdate").cast("date"))
        .select(
            F.floor(
                (F.col("o_custkey") - F.col("min_ck"))
                * F.lit(float(n))
                / (F.col("max_ck") - F.col("min_ck") + 1)
            )
            .cast("bigint")
            .alias("x"),
            F.floor(
                F.datediff("od", "min_d")
                * F.lit(float(n))
                / (F.datediff("max_d", "min_d") + 1)
            )
            .cast("bigint")
            .alias("y"),
            "o_custkey",
            "od",
        )
    )
    coded = scaled.select(
        F.expr(_morton_terms("x", "y", "div")).alias("z"), "o_custkey", "od"
    )
    return (
        coded.groupBy(
            F.floor(F.col("z") / ZORDER_BIN).cast("bigint").alias("zbin")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.max("o_custkey") - F.min("o_custkey"))
            .cast("bigint")
            .alias("ck_span"),
            F.datediff(F.max("od"), F.min("od"))
            .cast("bigint")
            .alias("date_span_days"),
        )
        .orderBy("zbin")
    )


@register(
    "orders_ship_latency",
    oracle="""
    select o_orderpriority,
           count(*) as n_lines,
           round(quantile_cont(datediff('day', o_orderdate, l_shipdate), 0.5), 4)
             as p50_days,
           round(quantile_cont(datediff('day', o_orderdate, l_shipdate), 0.9), 4)
             as p90_days,
           cast(max(datediff('day', o_orderdate, l_shipdate)) as bigint)
             as max_days
    from lineitem
    join orders on l_orderkey = o_orderkey
    group by o_orderpriority
    """,
)
def orders_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency percentiles per order priority — the
    fulfillment-SLA rollup (date arithmetic through a fact-dim join into
    exact interpolated percentiles, the agg_percentiles parity pattern).

    Plan: one shuffle join of lineitem to orders on the order key (both
    corpus-sized — no broadcast; AQE picks the strategy), a partial-agg
    (priority, days) histogram rollup, then a 5-group
    ``percentile(days, q, cnt)`` rollup over the histogram. Latencies are
    integer day counts, so Spark ``percentile`` and DuckDB
    ``quantile_cont`` interpolate the identical rationals (rounded 4 dp
    for fp noise); frequency-weighted interpolation over per-value counts
    is the same statistic as interpolation over the raw rows. At 100 TB
    the per-group percentile state is histogram-sized (priorities x
    distinct day values), never a corpus-sized value array; the sketch
    twin (orders_ship_latency_sketch) additionally witnesses the
    approx_percentile swap.
    """
    # r17 optimization round (guide §2.3 shuffle fewer bytes; §5 bounded
    # buffers; VERDICT r16 #4): the rollup rides the (priority, days)
    # HISTOGRAM its sketch twin already proved bit-identical —
    # percentile(col, q, frequency) over per-value counts interpolates
    # the same rank statistic as percentile over raw rows, sum(cnt) is
    # count(*), and max(days) over the histogram is max over the rows.
    # The exact-percentile value buffers leave the corpus pass: per-group
    # state is bounded by distinct day-latencies, not corpus size.
    hist = _ship_latency_hist(spark, sf_dir)
    return hist.groupBy("o_orderpriority").agg(
        F.sum("cnt").alias("n_lines"),
        F.round(
            F.percentile("days", F.lit(0.5), F.col("cnt")), 4
        ).alias("p50_days"),
        F.round(
            F.percentile("days", F.lit(0.9), F.col("cnt")), 4
        ).alias("p90_days"),
        F.max("days").cast("bigint").alias("max_days"),
    )


def _ship_latency_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_orderpriority, days) for every lineitem: order-to-ship latency
    in whole days through the fact-fact order-key join — shared by the
    exact percentile rollup and its sketch twin.

    r17 optimization round (guide §2.4 shared subtree; the
    triangle_instances pattern): TRACKED-persisted — the fact-fact join
    measured ~0.8 s of each twin's per-run cost and both queries (and all
    their rollup branches) read the identical two-narrow-column frame, so
    one session materialization serves the pair. The cached footprint is
    one (byte-class priority, int) pair per lineitem — MEMORY_AND_DISK,
    the same O(corpus)-narrow class as pq_codes/corpus_shingle_hashes —
    and replaces the sketch twin's per-run checkpoint_generation slot
    (strictly fewer materializations of the same frame)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    return track(
        li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            "o_orderpriority",
            F.datediff("l_shipdate", "o_orderdate").alias("days"),
        )
    )


def _ship_latency_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_orderpriority, days, cnt): the latency day histogram — the frame
    the exact percentile rollup, the sketch twin's exact columns, and the
    rank audit all read. Tracked (r17): ~24k rows at sf0.1, bounded by
    priorities x distinct day-latencies at any corpus scale, so the
    per-run cost of every histogram consumer drops to a metadata-sized
    cache scan (CacheManager dedupes the identical plan across the two
    registered queries)."""
    return track(
        _ship_latency_days(spark, sf_dir)
        .groupBy("o_orderpriority", "days")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


#: GK sketch accuracy for the ship-latency twin: eps = 1/accuracy rank
#: error. The rank-space audit margin is 2*eps — the guarantee itself plus
#: the same again for the interpolation slack at duplicate-heavy integer
#: values (measured worst: well inside eps at sf0.01 and sf0.1).
SHIP_SKETCH_ACCURACY = 1000
SHIP_SKETCH_RANK_MARGIN = 2.0 / SHIP_SKETCH_ACCURACY


@register(
    "orders_ship_latency_sketch",
    oracle="""
    select o_orderpriority,
           round(quantile_cont(datediff('day', o_orderdate, l_shipdate), 0.5), 4)
             as p50_exact,
           round(quantile_cont(datediff('day', o_orderdate, l_shipdate), 0.9), 4)
             as p90_exact,
           true as within_bound
    from lineitem
    join orders on l_orderkey = o_orderkey
    group by o_orderpriority
    """,
)
def orders_ship_latency_sketch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """orders_ship_latency's 100 TB percentile path, measured: the exact
    per-group ``percentile`` materializes each group's full value array on
    a single aggregation buffer (with only 5 priority groups, N/5 values
    per task — unbounded in corpus size), so at scale the rollup must ride
    the mergeable constant-memory GK sketch (``approx_percentile``,
    accuracy 1000). This query WITNESSES that swap the way
    agg_percentile_sketch_error does for the events table (VERDICT r14
    #3): exact interpolated p50/p90 are the hash-checked parity columns,
    and ``within_bound`` pins the sketch's OWN guarantee, which is in
    RANK space, not value space (a value-relative bound is meaningless
    here: latencies are dense integers, so the ±εn rank slack GK promises
    is worth several whole days around the median): the returned element's
    empirical rank interval must overlap [q − m, q + m] with m =
    SHIP_SKETCH_RANK_MARGIN = 2ε. The rank audit is one extra pass over
    the latency frame against the broadcast 5-row sketch output.

    r16 optimization round: the latency frame is referenced twice (the
    percentile/sketch rollup AND the rank audit), and with no
    materialization point Spark re-ran the fact-fact order-key join for
    the audit pass — the join alone measured 1.7 s of the query's 2.1 s
    at sf0.1. r16 used a per-run checkpoint_generation slot; r17 moved
    the shared ``_ship_latency_days`` frame onto a TRACKED persist (see
    its docstring), which covers both branches here AND the exact twin
    with one session materialization — the checkpoint slot is gone.
    """
    lat = _ship_latency_days(spark, sf_dir)
    # r16 optimization round, second pass: only the GK sketch still reads
    # the corpus-sized frame (it is the stream sketch this query
    # witnesses); the exact percentiles and the rank audit now run over
    # the (priority, days) HISTOGRAM — ~24k rows at sf0.1, bounded by
    # priorities x distinct day-latencies at any corpus scale.
    # Bit-identical by construction: percentile(col, q, frequency) over
    # per-value counts is the same interpolated rank statistic as
    # percentile over the raw rows, and sum(cnt where days<v)/sum(cnt)
    # equals avg(days<v) exactly (0/1 double sums are exact integers
    # below 2^53, and both forms divide the same numerator by the same
    # denominator). Interleaved A/B at sf0.1: 1.57 -> 1.36 s, and the
    # exact-percentile value buffers leave the corpus pass entirely.
    sk = lat.groupBy("o_orderpriority").agg(
        F.percentile_approx(
            "days", F.lit(0.5), F.lit(SHIP_SKETCH_ACCURACY)
        ).alias("p50_approx"),
        F.percentile_approx(
            "days", F.lit(0.9), F.lit(SHIP_SKETCH_ACCURACY)
        ).alias("p90_approx"),
    )
    hist = _ship_latency_hist(spark, sf_dir)
    ranked = hist.join(F.broadcast(sk), "o_orderpriority").groupBy(
        "o_orderpriority"
    ).agg(
        F.round(
            F.percentile("days", F.lit(0.5), F.col("cnt")), 4
        ).alias("p50_exact"),
        F.round(
            F.percentile("days", F.lit(0.9), F.col("cnt")), 4
        ).alias("p90_exact"),
        (
            F.sum(
                F.when(
                    F.col("days") < F.col("p50_approx"), F.col("cnt")
                ).otherwise(F.lit(0))
            )
            / F.sum("cnt")
        ).alias("lt50"),
        (
            F.sum(
                F.when(
                    F.col("days") <= F.col("p50_approx"), F.col("cnt")
                ).otherwise(F.lit(0))
            )
            / F.sum("cnt")
        ).alias("le50"),
        (
            F.sum(
                F.when(
                    F.col("days") < F.col("p90_approx"), F.col("cnt")
                ).otherwise(F.lit(0))
            )
            / F.sum("cnt")
        ).alias("lt90"),
        (
            F.sum(
                F.when(
                    F.col("days") <= F.col("p90_approx"), F.col("cnt")
                ).otherwise(F.lit(0))
            )
            / F.sum("cnt")
        ).alias("le90"),
    )

    def ok(lt: str, le: str, q: float):
        # duplicates give the returned value a rank INTERVAL
        # [count(<v), count(<=v)]; GK promises it overlaps [q-eps, q+eps]
        m = SHIP_SKETCH_RANK_MARGIN
        return (F.col(le) >= F.lit(q - m)) & (F.col(lt) <= F.lit(q + m))

    return ranked.select(
        "o_orderpriority",
        "p50_exact",
        "p90_exact",
        (ok("lt50", "le50", 0.5) & ok("lt90", "le90", 0.9)).alias(
            "within_bound"
        ),
    )


#: sql_order_priority: a lineitem is "late" when it ships more than this
#: many days after its order date (the fixture has no commit/receipt dates,
#: so the Q4 late-predicate is adapted to shipdate vs orderdate).
LATE_SHIP_DAYS = 60


@register(
    "sql_order_priority",
    oracle=f"""
    select o_orderpriority,
           cast(count(*) as bigint) as n_orders
    from orders
    where exists (
      select 1 from lineitem
      where l_orderkey = o_orderkey
        and l_shipdate > o_orderdate + interval {LATE_SHIP_DAYS} day)
    group by o_orderpriority
    order by o_orderpriority
    """,
)
def sql_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with at least one late-shipping lineitem,
    counted by order priority — the EXISTS-semi-join witness.

    The existence test is a LEFT SEMI join (never materializes matching
    lineitems, never duplicates an order with several late lines — no
    DISTINCT needed), with the date predicate inside the join condition so
    it evaluates during the join, not after a wide materialization. Both
    sides shuffle on the order key once; the priority rollup is a 5-row
    partial agg.
    """
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (
            F.col("l_shipdate")
            > F.date_add(F.col("o_orderdate"), LATE_SHIP_DAYS)
        ),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


#: sql_returned_items: how many top lossy customers Q10 reports.
RETURNED_TOP_N = 20


@register(
    "sql_returned_items",
    oracle=f"""
    with rev as (
      select c_custkey, c_name, n_name,
             {sql_round_div("sum(" + _REV4_SQL + ")", '10000', 2)}
               as revenue,
             cast(count(*) as bigint) as n_items
      from lineitem
      join orders   on o_orderkey  = l_orderkey
      join customer on c_custkey   = o_custkey
      join nation   on n_nationkey = c_nationkey
      where l_returnflag = 'R'
      group by c_custkey, c_name, n_name)
    select c_custkey, c_name, n_name, revenue, n_items, rnk from (
      select *, row_number() over (order by revenue desc, c_custkey) as rnk
      from rev)
    where rnk <= {RETURNED_TOP_N}
    """,
)
def sql_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the {RETURNED_TOP_N} customers who returned the
    most revenue — the returned-merchandise loss report.

    The returnflag filter is pushed to the lineitem scan (only 'R' rows
    shuffle); nation broadcasts; the per-customer rollup partial-aggs
    map-side. Revenue rounds to 2 dp BEFORE ranking (engine-stable
    membership) and the global top-{RETURNED_TOP_N} runs through the
    salted two-stage builder — the per-customer rollup is
    customer-cardinality, never sorted in one task.
    """
    from ..plans.topk import salted_topk

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    rev = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            # per-customer revenue summed as exact 1e-4-unit integers
            # (the 4-dp sum's 2-dp round has reachable .xx5 ties).
            # r16 optimization round: split_units long sums replace the
            # decimal(38,0) path — same codegen win as the flagship,
            # identical output, and the recombined decimal keeps the
            # whale-customer headroom (~9e18 dollars per group)
            *(
                F.sum(c).alias(n)
                for n, c in zip(
                    ("r_q", "r_r"), split_units(_rev4(), 10000)
                )
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            round_div(
                recombine_units(F.col("r_q"), F.col("r_r"), 10000),
                F.lit(10000),
                2,
            ).alias("revenue"),
            "n_items",
        )
    )
    return salted_topk(
        rev,
        [F.desc("revenue"), F.asc("c_custkey")],
        RETURNED_TOP_N,
        salt_col="c_custkey",
        rank_col="rnk",
    )


@register(
    "orders_order_size_hist",
    oracle=f"""
    with per_order as (
      select l_orderkey, count(*) as n_lines from lineitem group by l_orderkey),
    hist as (
      select n_lines, count(*) as n_orders from per_order group by n_lines)
    select cast(n_lines as int) as n_lines,
           cast(n_orders as bigint) as n_orders,
           {sql_round_div('n_orders', 'sum(n_orders) over ()', 6)}
             as share
    from hist
    """,
)
def orders_order_size_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-size distribution: how many orders have k lineitems, with
    shares — the basket-size profile that sizes the per-order working set
    (and calibrates the co-purchase graph's expected pair fan-out, which
    grows as k²).

    Two partial-agg rollups (corpus → per-order counts → k-histogram);
    the share normalization is a window over the k-cardinality histogram
    only (k ≤ max lines per order — a data-model constant, the same
    bounded-rollup class as orders_repeat_purchase_curve's whitelist
    entry).
    """
    li = load(spark, sf_dir, "lineitem")
    from pyspark.sql import Window

    hist = (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .groupBy("n_lines")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return hist.select(
        F.col("n_lines").cast("int").alias("n_lines"),
        F.col("n_orders").cast("bigint").alias("n_orders"),
        round_div_long(
            F.col("n_orders"), F.sum("n_orders").over(w), 6
        ).alias("share"),
    )


#: sql_idle_customers: dormancy cutoff — a customer with no order on/after
#: this date is dormant (the fixture's orders span to 2001-08, so the last
#: seven months define the recency window).
IDLE_CUTOFF = "2001-01-01"


@register(
    "sql_idle_customers",
    oracle=f"""
    with threshold as (
      select avg(c_acctbal) as avg_bal from customer where c_acctbal > 0),
    idle as (
      select c_mktsegment, c_acctbal
      from customer
      where c_acctbal > (select avg_bal from threshold)
        and not exists (select 1 from orders
                        where o_custkey = c_custkey
                          and o_orderdate >= timestamp '{IDLE_CUTOFF}'))
    select c_mktsegment,
           cast(count(*) as bigint) as n_customers,
           cast(round(sum(cast(c_acctbal as decimal(18,2))), 2) as double)
             as total_acctbal
    from idle
    group by c_mktsegment
    order by c_mktsegment
    """,
)
def sql_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers gone dormant (no order since
    {IDLE_CUTOFF}), by market segment — the win-back-campaign report
    (above-average account balance, nothing in the recency window).

    The average-balance threshold is a one-row broadcast scalar combine
    (whitelisted BNLJ class); the dormancy test is a LEFT ANTI join
    against the recency-filtered orders key projection — the date filter
    is pushed to the orders scan, and no NOT IN ever materializes.
    Balances sum in decimal.
    """
    cust = load(spark, sf_dir, "customer")
    thr = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= IDLE_CUTOFF)
        .select("o_custkey")
    )
    idle = (
        cust.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return (
        idle.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2
            ).cast("double").alias("total_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "orders_backlog_timeline",
    oracle="""
    with spans as (
      select o.o_orderkey,
             cast(year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1
                  as bigint) as open_mk,
             cast(year(max(l.l_shipdate)) * 12 + month(max(l.l_shipdate))
                  - 1 as bigint) as close_mk
      from orders o join lineitem l on l.l_orderkey = o.o_orderkey
      group by o.o_orderkey, o.o_orderdate),
    bounds as (
      select min(open_mk) as mn, max(close_mk) as mx from spans),
    grid as (
      select unnest(generate_series(mn, mx)) as mk from bounds),
    opened as (
      select open_mk as mk, count(*) as n from spans group by open_mk),
    closed as (
      select close_mk as mk, count(*) as n from spans group by close_mk),
    merged as (
      select g.mk,
             coalesce(o.n, 0) as n_opened,
             coalesce(c.n, 0) as n_closed
      from grid g
      left join opened o on o.mk = g.mk
      left join closed c on c.mk = g.mk)
    select printf('%04d-%02d', cast(mk // 12 as int),
                  cast(mk % 12 + 1 as int)) as month,
           cast(n_opened as bigint) as n_opened,
           cast(n_closed as bigint) as n_closed,
           cast(sum(n_opened - n_closed) over (order by mk
                  rows between unbounded preceding and current row)
                as bigint) as open_at_end
    from merged
    order by month
    """,
)
def orders_backlog_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order-backlog sweep line: per calendar month, how many
    orders OPENED (order date), how many CLOSED (last line shipped), and
    how many remained open at month end — the fulfillment-capacity
    timeline every operations dashboard leads with, and the interval →
    boundary-events → prefix-sum operator class (sweep line) the engine
    had not yet witnessed.

    Scale plan: each order's open interval collapses in ONE
    map-side-combining groupBy over the lineitem join (max ship date per
    order — O(orders) rollup, never a window over raw lineitems); the
    +1/-1 boundary events roll up by MONTH (two tiny month-cardinality
    tables), and the running backlog integrates over the zero-filled
    calendar month grid — bounded by the date span (a century is 1200
    rows) regardless of corpus size. Month keys are pure-integer
    (year*12 + month - 1), so grid arithmetic and the final label are
    engine-exact.
    """
    mk = lambda c: (  # noqa: E731
        F.year(c) * 12 + F.month(c) - 1
    ).cast("bigint")
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    spans = (
        li.groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            mk(F.col("o_orderdate")).alias("open_mk"),
            mk(F.col("last_ship")).alias("close_mk"),
        )
    )
    bounds = spans.agg(
        F.min("open_mk").alias("mn"), F.max("close_mk").alias("mx")
    )
    grid = bounds.select(
        F.explode(F.sequence("mn", "mx")).alias("mk")
    )
    opened = spans.groupBy(F.col("open_mk").alias("mk")).agg(
        F.count(F.lit(1)).alias("n_o")
    )
    closed = spans.groupBy(F.col("close_mk").alias("mk")).agg(
        F.count(F.lit(1)).alias("n_c")
    )
    merged = (
        grid.join(opened, "mk", "left")
        .join(closed, "mk", "left")
        .select(
            "mk",
            F.coalesce("n_o", F.lit(0)).alias("n_opened"),
            F.coalesce("n_c", F.lit(0)).alias("n_closed"),
        )
    )
    w = Window.orderBy("mk").rowsBetween(Window.unboundedPreceding, 0)
    return merged.select(
        F.format_string(
            "%04d-%02d",
            F.floor(F.col("mk") / 12).cast("int"),
            (F.col("mk") % 12 + 1).cast("int"),
        ).alias("month"),
        F.col("n_opened").cast("bigint").alias("n_opened"),
        F.col("n_closed").cast("bigint").alias("n_closed"),
        F.sum(F.col("n_opened") - F.col("n_closed"))
        .over(w)
        .cast("bigint")
        .alias("open_at_end"),
    ).orderBy("month")
