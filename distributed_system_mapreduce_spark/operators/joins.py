"""Joins (SURVEY.md §2.5).

MapReduce parity: the model implements joins by hand — reduce-side join
(tag-by-source + co-group on key) and map-side join (replicate the small
table to every mapper) are the standard Hadoop patterns; the reference
snapshot is empty (SURVEY.md §0) so these published patterns are the target.
Spark expresses all of them through one ``join`` API and picks the physical
strategy (sort-merge / shuffled-hash / broadcast-hash) via Catalyst + AQE.

Scale notes (100 TB):
- ``join_map_side`` pins ``broadcast()`` explicitly: part-like dimensions
  bounded in size get a broadcast-hash join with ZERO shuffle of the fact
  table. At 100 TB that is the difference between moving megabytes and
  moving the whole fact table.
- ``join_reduce_side`` / ``join_multiway`` leave strategy to AQE: at sf0.01
  everything broadcasts, at 100 TB the orders⋈customer pair becomes a
  sort-merge join on the shuffled key with AQE skew-splitting — same logical
  plan, right physical plan at each scale.
- ``join_theta_range`` keeps the equi-key (user_id) in the join condition so
  Spark co-partitions on it and evaluates only the range predicate within
  each key group — never a cartesian product.
- Semi/anti joins ship only the join key of the probe side (no payload
  duplication), the Spark-native form of the co-group emit-once/emit-if-empty
  MapReduce patterns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..exactmath import round_div, sql_round_div
from ..registry import register
from .analytics import _REV4_SQL
from ..sources.io import load


@register(
    "join_reduce_side",
    oracle="""
    select o_orderkey, o_totalprice, c_custkey, c_name
    from orders join customer on o_custkey = c_custkey
    """,
)
def join_reduce_side(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join orders ⋈ customer (reduce-side join shape)."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    return orders.join(customer, orders.o_custkey == customer.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name"
    )


@register(
    "join_map_side",
    oracle="""
    select l_orderkey, l_linenumber, p_brand, l_extendedprice
    from lineitem join part on l_partkey = p_partkey
    """,
)
def join_map_side(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-side (broadcast) join: fact table never shuffles."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_orderkey", "l_linenumber", "p_brand", "l_extendedprice"
    )


@register(
    "join_multiway",
    oracle=f"""
    select n_name,
           {sql_round_div('sum(' + _REV4_SQL + ')', '10000', 2)} as revenue,
           count(*) as n_lines
    from region
    join nation   on n_regionkey = r_regionkey
    join customer on c_nationkey = n_nationkey
    join orders   on o_custkey   = c_custkey
    join lineitem on l_orderkey  = o_orderkey
    where r_name = 'ASIA'
      and o_orderdate >= timestamp '1996-01-01'
      and o_orderdate <  timestamp '1997-01-01'
    group by n_name
    """,
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way star join (TPC-H Q5 shape): revenue by nation for one region/year.

    region/nation are fixed-size → explicit broadcast; the rest is left to
    Catalyst join reordering + AQE so the same code picks sort-merge at scale.
    """
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    # revenue summed as exact 1e-4-dollar integers (see
    # analytics._REV4_SQL) — the 4-dp sum's 2-dp round has reachable ties
    from .analytics import _rev4

    return j.groupBy("n_name").agg(
        round_div(F.sum(_rev4()), F.lit(10000), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "join_left_outer",
    oracle="""
    select c_custkey, count(o_orderkey) as n_orders
    from customer left join orders on o_custkey = c_custkey
    group by c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join: orders per customer including zero-order customers
    (count of a nullable column counts only matches)."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    j = customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
    return j.groupBy("c_custkey").agg(F.count("o_orderkey").alias("n_orders"))


@register(
    "join_semi",
    oracle="""
    select c_custkey, c_name from customer
    where exists (select 1 from orders where o_custkey = c_custkey)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join = EXISTS (co-group emit-once pattern).

    Scale note: Catalyst's runtime Bloom-filter join pruning
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``, default TRUE in
    Spark 4.1 on a vanilla session) injects a build-side Bloom pre-filter
    into the probe-side scan once the probe side exceeds the 10 GiB scan
    threshold — i.e. precisely in the 100 TB regime. Kept declarative here
    so the optimizer owns the decision; the mechanism itself is pinned in
    tests/test_runtime_pruning.py with thresholds lowered to fire at sf0.01.
    """
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    select c_custkey, c_name from customer
    where not exists (select 1 from orders where o_custkey = c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join = NOT EXISTS (co-group emit-if-empty pattern).

    Same runtime Bloom-pruning posture as ``join_semi`` (anti joins cannot
    drop probe rows via Bloom false-positive-free pruning of the OUTPUT —
    a Bloom filter only prunes rows that definitely DON'T match, which for
    anti-join semantics are exactly the rows we must keep — so Catalyst
    applies it to the shuffle input, not the result; semantics unchanged).
    """
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "join_full_outer",
    oracle="""
    select
      coalesce(a.user_id, b.user_id) as user_id,
      a.n_click as n_click,
      b.n_purchase as n_purchase
    from (select user_id, count(*) as n_click from events
          where event_type = 'click' and value > 300 group by user_id) a
    full outer join
         (select user_id, count(*) as n_purchase from events
          where event_type = 'purchase' and value > 300 group by user_id) b
      on a.user_id = b.user_id
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two sparse per-user aggregates (high-value clicks
    vs purchases); null counts mark users present on only one side."""
    ev = load(spark, sf_dir, "events").filter(F.col("value") > 300)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_click"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purchase"))
    )
    a = clicks.alias("a")
    b = purchases.alias("b")
    return a.join(b, F.col("a.user_id") == F.col("b.user_id"), "full").select(
        F.coalesce(F.col("a.user_id"), F.col("b.user_id")).alias("user_id"),
        "n_click",
        "n_purchase",
    )


@register(
    "join_theta_range",
    oracle="""
    select a.user_id as user_id, count(*) as n_pairs
    from events a join events b
      on a.user_id = b.user_id
     and b.ts > a.ts
     and b.ts <= a.ts + interval 1 hour
    group by a.user_id
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/as-of-shaped self-join: same-user event pairs within 1 hour.

    The equi-key (user_id) stays in the join condition so execution is a
    co-partitioned join with a residual range filter — not a cross product.
    """
    ev = load(spark, sf_dir, "events")
    a = ev.alias("a")
    b = ev.alias("b")
    cond = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("interval 1 hour"))
    )
    return (
        a.join(b, cond)
        .groupBy(F.col("a.user_id").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "join_asof",
    oracle="""
    with pc as (
      select event_id, user_id, ts, event_type
      from events where event_type in ('click', 'purchase')),
    p as (select event_id, user_id, ts from pc where event_type = 'purchase'),
    a as (
      select p.event_id as purchase_id, p.user_id, p.ts,
             (select max(c.ts) from pc c
               where c.user_id = p.user_id
                 and c.event_type = 'click'
                 and c.ts < p.ts) as ct
      from p)
    select purchase_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') as purchase_ts,
           strftime(ct, '%Y-%m-%d %H:%M:%S') as last_click_ts,
           cast(date_diff('second', ct, ts) as bigint) as gap_s
    from a
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest strictly-earlier
    click (ts + seconds-gap; null when the user never clicked before).

    Spark-first plan: NOT a join. Both sides union into one stream, ONE
    shuffle on user_id, and a running ``max(click ts)`` over a rows window
    ordered by (ts, side, event_id) — purchases sort before clicks at equal
    ts, so the running max sees exactly the strictly-earlier clicks. A
    join-based as-of is O(clicks x purchases) per user; this is O(n log n)
    per partition and survives any per-user event count. (The same
    union+running-last plan is how backfill/as-of lookups stay linear at
    100 TB; with an IGNORE NULLS ``last`` it generalizes to carrying whole
    payload structs, not just the timestamp.)
    """
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    tagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        # clicks sort AFTER purchases at identical ts => strict '<' as-of
        F.when(F.col("event_type") == "click", F.lit(1))
        .otherwise(F.lit(0))
        .alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    asof = tagged.withColumn(
        "last_click_ts",
        F.max(F.when(F.col("side") == 1, F.col("ts"))).over(w),
    )
    return asof.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("last_click_ts", "yyyy-MM-dd HH:mm:ss").alias(
            "last_click_ts"
        ),
        (F.unix_timestamp("ts") - F.unix_timestamp("last_click_ts")).alias(
            "gap_s"
        ),
    )


@register(
    "join_asof_forward",
    oracle="""
    with pc as (
      select event_id, user_id, ts, event_type
      from events where event_type in ('click', 'purchase')),
    p as (select event_id, user_id, ts from pc where event_type = 'purchase'),
    a as (
      select p.event_id as purchase_id, p.user_id, p.ts,
             (select min(c.ts) from pc c
               where c.user_id = p.user_id
                 and c.event_type = 'click'
                 and c.ts > p.ts) as ct
      from p)
    select purchase_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') as purchase_ts,
           strftime(ct, '%Y-%m-%d %H:%M:%S') as next_click_ts,
           cast(date_diff('second', ts, ct) as bigint) as gap_s
    from a
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each purchase matched to the user's earliest
    strictly-LATER click (the post-purchase re-engagement lookup) —
    completing the direction pair with join_asof (pandas merge_asof
    direction='forward' / kdb aj's mirror).

    Same one-shuffle union plan as join_asof with the window reversed: a
    running ``min(click ts)`` over a DESCENDING (ts, side, event_id)
    rows frame — clicks sort after purchases in the reversed order at
    equal ts, so the running min sees exactly the strictly-later clicks.
    Still O(n log n) per user partition, never clicks x purchases.
    """
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    tagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        # in DESC ts order, clicks must still trail purchases at equal ts
        # for the strict '>' as-of, so clicks get the larger side value
        F.when(F.col("event_type") == "click", F.lit(1))
        .otherwise(F.lit(0))
        .alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.asc("side"), F.desc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = tagged.withColumn(
        "next_click_ts",
        F.min(F.when(F.col("side") == 1, F.col("ts"))).over(w),
    )
    return fwd.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("next_click_ts", "yyyy-MM-dd HH:mm:ss").alias(
            "next_click_ts"
        ),
        (
            F.unix_timestamp("next_click_ts") - F.unix_timestamp("ts")
        ).alias("gap_s"),
    )


@register(
    "join_interval_overlap",
    oracle="""
    select o1.o_custkey as custkey, count(*) as n_overlap_pairs
    from orders o1
    join orders o2
      on o1.o_custkey = o2.o_custkey
     and o1.o_orderkey < o2.o_orderkey
     and abs(datediff('day', o1.o_orderdate, o2.o_orderdate)) < 30
    group by o1.o_custkey
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: pairs of orders by the SAME customer
    whose 30-day fulfilment windows [o_orderdate, o_orderdate + 30d)
    overlap (⇔ |Δdays| < 30), counted per customer.

    The classic range-join shape. The equi-key (custkey) bounds the
    candidate space to within-customer pairs, so the shuffle is an ordinary
    hash join with a range RESIDUAL — never a cartesian. At 100 TB with a
    skewed key the AQE skew-join split applies; for interval sets WITHOUT
    an equi-prefix the standard plan is epoch bucketing (join on
    floor(date/30d) ± 1 buckets, then the exact residual), which this
    operator documents as its scale fallback.
    """
    orders = load(spark, sf_dir, "orders")
    o1 = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("k1"),
        F.col("o_orderdate").alias("d1"),
    )
    o2 = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("k2"),
        F.col("o_orderdate").alias("d2"),
    )
    return (
        o1.join(o2, "custkey")
        .filter(
            (F.col("k1") < F.col("k2"))
            & (F.abs(F.datediff(F.col("d2"), F.col("d1"))) < 30)
        )
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("n_overlap_pairs"))
    )


#: maximum edit distance for a fuzzy name match.
FUZZY_MAX_DIST = 2


@register(
    "join_fuzzy_name",
    oracle=f"""
    with names as (
      select distinct p_name as name,
             string_split(p_name, ' ')[-1] as block
      from part)
    select a.name as name_a, b.name as name_b,
           cast(levenshtein(a.name, b.name) as int) as dist
    from names a
    join names b on a.block = b.block and a.name < b.name
    where levenshtein(a.name, b.name) <= {FUZZY_MAX_DIST}
    """,
)
def join_fuzzy_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy self-join: part names within edit distance
    {FUZZY_MAX_DIST}, candidate-paired by a BLOCKING key (the head noun)
    so the quadratic edit-distance work runs per block, never all-pairs.

    The record-linkage shape: exact-join on a cheap blocking key (here the
    product's last token — in production a phonetic code, sorted
    token-prefix, or LSH bucket), THEN the expensive similarity only on
    candidates. The name universe is deduplicated before pairing
    (value-collapse, same trick as dedup_simhash), so cost scales with
    distinct names per block, not row count — the difference between
    feasible and quadratic at 100 TB. Levenshtein is the identical
    Wagner-Fischer distance on both engines.
    """
    part = load(spark, sf_dir, "part")
    names = (
        part.select(F.col("p_name").alias("name"))
        .distinct()
        .withColumn("block", F.element_at(F.split("name", " "), -1))
    )
    a = names.alias("a")
    b = names.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.levenshtein("a.name", "b.name").alias("dist"),
        )
        .filter(F.col("dist") <= FUZZY_MAX_DIST)
    )


#: Bloom prefilter geometry: M bits in M/64 longs, k=2 seeded hashes. At
#: ~300 BUILDING customers and M=4096 the filter runs ~14% occupancy →
#: false-positive rate (1-e^(-kn/M))^k ≈ 2%; a production run sizes M from
#: the dim-side count (10 bits/key ≈ 1% FPP) — still kilobytes at millions
#: of keys, which is why the bitmap ships as a broadcast while the fact
#: table never moves.
BLOOM_BITS = 4096
BLOOM_SEEDS = (101, 202)


def _bloom_positions(key: Column) -> "list[Column]":
    """k seeded xxhash64 bit positions in [0, BLOOM_BITS) for a join key.

    Engine-internal only (the final exact join removes false positives), so
    the hash needs no oracle parity — xxhash64 stays JVM-side and codegen'd.
    """
    # the seed MUST be a long literal: xxhash64 hashes by input type, and
    # the probe side writes `{seed}L` in SQL — an int-typed seed here would
    # place the dim's bits at entirely different positions.
    return [
        F.pmod(F.xxhash64(F.lit(seed).cast("long"), key), F.lit(BLOOM_BITS))
        for seed in BLOOM_SEEDS
    ]


def bloom_candidates(
    spark: SparkSession, sf_dir: str
) -> "tuple[DataFrame, DataFrame]":
    """(pruned fact rows, filtered dim) for ``join_bloom_pruned``.

    Split out so tests can measure pruning effectiveness (candidate count
    vs raw fact count) independently of the final exact join.
    """
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_totalprice"
    )
    dim = (
        load(spark, sf_dir, "customer")
        .filter((F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 0))
        .select("c_custkey")
    )

    # (1) dim keys -> M-bit bitmap: explode k positions, fold into words.
    pos = dim.select(
        F.explode(F.array(*_bloom_positions(F.col("c_custkey")))).alias("pos")
    )
    words = (
        pos.groupBy((F.col("pos") / 64).cast("int").alias("word_idx"))
        .agg(F.bit_or(F.expr("shiftleft(1L, cast(pos % 64 as int))")).alias("word"))
        .collect()
    )
    filled = [0] * (BLOOM_BITS // 64)
    for r in words:
        filled[r["word_idx"]] = r["word"]
    bitmap = F.array(*[F.lit(w).cast("long") for w in filled])

    # (2) fact-side membership test: every seeded position's bit set.
    # SQL-expr form because shiftright's shift amount is a computed column
    # (the pyspark function wrapper only accepts a literal int there).
    m = BLOOM_BITS
    probe = orders.withColumn("_bloom", bitmap)
    tests = []
    for seed in BLOOM_SEEDS:
        h = f"pmod(xxhash64({seed}L, o_custkey), {m})"
        tests.append(
            f"((shiftright(element_at(_bloom, cast({h} / 64 as int) + 1), "
            f"cast({h} % 64 as int)) & 1L) = 1L)"
        )
    return probe.filter(F.expr(" and ".join(tests))).drop("_bloom"), dim


@register(
    "join_bloom_pruned",
    oracle="""
    select o_orderpriority,
           cast(count(*) as bigint) as n_orders,
           cast(round(sum(cast(o_totalprice as decimal(18,4))), 2) as double)
             as total_revenue
    from orders
    join customer on o_custkey = c_custkey
    where c_mktsegment = 'BUILDING' and c_acctbal > 0
    group by o_orderpriority
    order by o_orderpriority
    """,
)
def join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter-pruned dimension join: revenue by order priority for
    positive-balance BUILDING-segment customers, with the fact side pruned
    by an explicit Bloom bitmap BEFORE any join or shuffle.

    This makes the runtime-filter mechanics Spark applies internally
    (`spark.sql.optimizer.runtime.bloomFilter.enabled`, Delta/Iceberg DPP)
    explicit and testable: (1) the filtered dim's keys aggregate into an
    M-bit bitmap as M/64 longs via per-word `bit_or` — a map-side-combined
    aggregation whose output is BOUNDED BY M, not by dim cardinality;
    (2) the ≤64-long bitmap becomes an array literal (at cluster scale: a
    broadcast variable) and every fact row tests its k seeded bit
    positions with shift/AND expressions — whole-stage-codegen'd, no
    Python, no join; (3) only surviving rows (true matches + ~2% false
    positives) enter the exact broadcast join that removes false
    positives, so the result is exactly the plain join the oracle states.
    At 100 TB the fact scan discards ~all non-matching rows at the
    scan/filter stage instead of shuffling them toward a join — the
    difference between reading 100 TB and moving it.
    """
    candidates, dim = bloom_candidates(spark, sf_dir)
    # (3) exact join removes false positives; dim is broadcast.
    return (
        candidates.join(F.broadcast(dim), candidates.o_custkey == dim.c_custkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_revenue"),
        )
        .orderBy("o_orderpriority")
    )


#: attribution window for the tolerance as-of join (seconds).
ASOF_TOLERANCE_S = 1800


@register(
    "join_asof_tolerance",
    oracle=f"""
    with pc as (
      select event_id, user_id, ts, event_type
      from events where event_type in ('click', 'purchase')),
    p as (select event_id, user_id, ts from pc where event_type = 'purchase'),
    a as (
      select p.event_id, p.ts,
             (select max(c.ts) from pc c
               where c.user_id = p.user_id
                 and c.event_type = 'click'
                 and c.ts < p.ts) as ct
      from p),
    b as (
      select strftime(date_trunc('day', ts), '%Y-%m-%d') as day,
             case
               when ct is null then 'never_clicked'
               when date_diff('second', ct, ts) <= {ASOF_TOLERANCE_S}
                 then 'attributed'
               else 'stale'
             end as bucket
      from a)
    select day, bucket, count(*) as n_purchases
    from b
    group by day, bucket
    order by day, bucket
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a max-gap tolerance: each purchase attributed to the
    user's latest strictly-earlier click only if it happened within
    ASOF_TOLERANCE_S — the kdb ``wj`` / TimescaleDB tolerance-asof
    semantics — rolled up to daily (attributed / stale / never_clicked)
    counts, i.e. the attribution-coverage report a marketing pipeline runs.

    Same scale plan as ``join_asof`` (which this deliberately shares shape
    with, not code-paths — the window carries one extra bucket expression):
    both sides union into ONE user-keyed shuffle, running max(click ts)
    over a (ts, side, id)-ordered rows window, so the tolerance check is a
    map-side gap comparison — never a pairwise (clicks x purchases) join.
    Dates out as strings; gap arithmetic in integer seconds (§7.3.1).
    """
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    tagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "click", F.lit(1))
        .otherwise(F.lit(0))
        .alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    asof = tagged.withColumn(
        "last_click_ts",
        F.max(F.when(F.col("side") == 1, F.col("ts"))).over(w),
    )
    gap_s = F.unix_timestamp("ts") - F.unix_timestamp("last_click_ts")
    bucket = (
        F.when(F.col("last_click_ts").isNull(), F.lit("never_clicked"))
        .when(gap_s <= ASOF_TOLERANCE_S, F.lit("attributed"))
        .otherwise(F.lit("stale"))
    )
    return (
        asof.filter(F.col("event_type") == "purchase")
        .select(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
                "day"
            ),
            bucket.alias("bucket"),
        )
        .groupBy("day", "bucket")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
        .orderBy("day", "bucket")
    )
