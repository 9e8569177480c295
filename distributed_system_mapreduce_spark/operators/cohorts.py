"""Product-analytics operators: retention cohorts, RFM segmentation,
behavioral transitions.

The standing warehouse workloads every event-driven product runs daily,
each a distinct optimizer shape: a self-aligned double aggregation
(cohorts), rank-bucketing into quantiles (RFM), and an ordered self-window
(transitions). All stay single declarative plans, all-JVM.

Scale notes (100 TB):
- Cohort assignment is a per-user min() — one partial-agg shuffle on
  user_id; the cohort matrix itself is weeks x weeks, driver-tiny.
- RFM quantiles use ntile over per-customer rollups (rows = customers,
  not orders) with total tiebreak ordering so bucket edges are
  deterministic; the segment rollup is a second tiny shuffle.
- Transition counting is lag() over the (user, ts, event_id) sort — the
  one per-user shuffle the batch sessionizer already pays; output is
  event_types^2 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..exactmath import round_div_long, sql_round_div
from ..registry import register
from ..sources.io import load


@register(
    "events_retention_cohort",
    oracle="""
    with firsts as (
      select user_id,
             min(date_trunc('week', ts)) as cohort_week
      from events
      group by user_id),
    activity as (
      select distinct e.user_id,
             f.cohort_week,
             datediff('week', f.cohort_week, date_trunc('week', e.ts))
               as week_offset
      from events e
      join firsts f on f.user_id = e.user_id)
    select strftime(cohort_week, '%Y-%m-%d') as cohort_week,
           cast(week_offset as int) as week_offset,
           count(*) as n_active_users
    from activity
    group by all
    """,
)
def events_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-seen week, counted
    once per (cohort, week-offset) in which they were active.

    Two shuffles: the per-user first-week rollup (partial-agg, then
    broadcast back onto the stream — user cardinality is AQE's call at
    scale) and the distinct over (user, offset). The output matrix is
    weeks x weeks regardless of corpus size. Week arithmetic uses Monday
    truncation on both engines.
    """
    ev = load(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    firsts = ev.groupBy("user_id").agg(
        F.min(wk).alias("cohort_week")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.floor(
                    F.datediff(
                        F.date_trunc("week", F.col("ts")),
                        F.col("cohort_week"),
                    )
                    / 7
                )
            ).cast("int").alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
    ).agg(F.count(F.lit(1)).alias("n_active_users"))


#: quantile buckets per RFM dimension.
RFM_BUCKETS = 4


@register(
    "orders_rfm_segments",
    oracle=f"""
    with per_cust as (
      select o_custkey,
             max(o_orderdate) as last_order,
             count(*) as frequency,
             round(sum(cast(o_totalprice as decimal(18, 4))), 2) as monetary
      from orders
      group by o_custkey),
    scored as (
      select o_custkey, frequency, monetary,
             ntile({RFM_BUCKETS}) over (order by last_order desc, o_custkey)
               as r_score,
             ntile({RFM_BUCKETS}) over (order by frequency desc, o_custkey)
               as f_score,
             ntile({RFM_BUCKETS}) over (order by monetary desc, o_custkey)
               as m_score
      from per_cust)
    select r_score, f_score, m_score,
           count(*) as n_customers,
           cast(round(sum(cast(monetary as decimal(18, 4))), 2) as double)
             as segment_revenue
    from scored
    group by r_score, f_score, m_score
    """,
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: quartile scores for recency, frequency,
    and monetary value, rolled up to segment sizes and revenue.

    The quantile assignment runs over the per-customer rollup (customers,
    not orders — the only full-data shuffle is the first partial-agg), with
    o_custkey tiebreaks making every ntile edge deterministic. Monetary
    sums accumulate in decimal so bucket membership can never flip on
    summation-order float noise. The three global ntiles route through
    ``plans.scan.chunked_ntile`` (VERDICT r8 #2) — row-identical to the
    naive global-sort form, but each sort partition is a chunk, never the
    full customer frame. Chunk keys, each monotone along its order:
    recency = days-before-epoch-end (day granularity), monetary =
    negated 1/32-octave log2 band, frequency = (negated count, custkey
    block) — the custkey sub-chunk splits the tie-heavy low-frequency
    classes that would otherwise re-create a corpus-sized partition.
    """
    orders = load(spark, sf_dir, "orders")
    from ..plans.scan import chunked_ntile

    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2
        ).alias("monetary"),
    )
    scored = per_cust
    for out_col, order_cols, chunk in (
        (
            "r_score",
            [F.desc("last_order"), F.asc("o_custkey")],
            F.datediff(F.lit("2038-01-01").cast("date"), F.to_date("last_order")),
        ),
        (
            "f_score",
            [F.desc("frequency"), F.asc("o_custkey")],
            F.struct(
                (-F.col("frequency")).alias("nf"),
                F.floor(F.col("o_custkey") / 4096).alias("ck"),
            ),
        ),
        (
            "m_score",
            [F.desc("monetary"), F.asc("o_custkey")],
            -F.floor(F.log2(F.col("monetary").cast("double")) * 32),
        ),
    ):
        scored = chunked_ntile(
            scored, RFM_BUCKETS, order_cols, chunk, out_col=out_col
        )
    scored = scored.select(
        "o_custkey", "frequency", "monetary", "r_score", "f_score", "m_score"
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("monetary"), 2).cast("double").alias("segment_revenue"),
    )


@register(
    "events_transition_matrix",
    oracle=f"""
    with ordered as (
      select user_id, event_type,
             lag(event_type) over (partition by user_id
                                   order by ts, event_id) as prev_type
      from events)
    select prev_type, event_type as next_type,
           count(*) as n_transitions,
           {sql_round_div('count(*)',
                          'sum(count(*)) over (partition by prev_type)',
                          4)} as p_next
    from ordered
    where prev_type is not null
    group by prev_type, next_type
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral transition matrix: for each event type, the
    distribution of the immediately-following event type per user session
    stream (the Markov-chain fingerprint funnels and recommenders start
    from).

    One per-user shuffle for the lag window (ordered by (ts, event_id) —
    the unique id makes the sequence engine-deterministic), one tiny
    shuffle for the types^2 rollup; the row-probability normalization is a
    window over the already-aggregated matrix.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = ordered.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).alias("n_transitions"))
    wnorm = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n_transitions",
        round_div_long(
            F.col("n_transitions"),
            F.sum("n_transitions").over(wnorm),
            4,
        ).alias("p_next"),
    )


@register(
    "events_rolling_dau",
    oracle="""
    with user_days as (
      select distinct user_id, cast(date_trunc('day', ts) as date) as day
      from events),
    span as (select min(day) as mn, max(day) as mx from user_days),
    cover as (
      select user_id,
             unnest(generate_series(day, day + interval 6 day,
                                    interval 1 day)) as cover_day
      from user_days),
    wau as (
      select cast(cover_day as date) as day,
             count(distinct user_id) as wau7
      from cover
      where cast(cover_day as date) <= (select mx from span)
      group by all),
    dau as (
      select day, count(*) as dau from user_days group by day)
    select strftime(w.day, '%Y-%m-%d') as day,
           coalesce(d.dau, 0) as dau,
           w.wau7
    from wau w
    left join dau d on d.day = w.day
    """,
)
def events_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users plus EXACT rolling 7-day distinct users.

    Rolling distinct is not window-decomposable (distinct doesn't
    subtract), so each (user, day) row is EXPANDED onto the <= 7 days it
    covers — turning the rolling distinct into a plain per-day distinct
    count at a bounded x7 row cost, the standard exact-WAU shape. Both
    aggregations run off the same deduplicated user-day rollup (the only
    full-data shuffle); at 100 TB the sketch alternative is a per-day HLL
    with a 7-sketch merge (agg_hll_union shows the machinery), traded
    here for exactness because the oracle can mirror it.
    """
    ev = load(spark, sf_dir, "events")
    user_days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    mx = user_days.agg(F.max("day").alias("mx"))
    cover = user_days.select(
        "user_id",
        F.explode(
            F.sequence(
                "day", F.date_add("day", 6), F.expr("interval 1 day")
            )
        ).alias("cover_day"),
    )
    wau = (
        cover.join(F.broadcast(mx), cover.cover_day <= mx.mx)
        .groupBy(F.col("cover_day").alias("day"))
        .agg(F.count_distinct("user_id").alias("wau7"))
    )
    dau = user_days.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    return (
        wau.join(dau, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("dau", F.lit(0)).alias("dau"),
            "wau7",
        )
    )


@register(
    "dim_customer_scd2",
    oracle="""
    with versions as (
      select o_custkey,
             o_orderdate as valid_from,
             lead(o_orderdate) over (partition by o_custkey
                                     order by o_orderdate, o_orderkey)
               as valid_to,
             row_number() over (partition by o_custkey
                                order by o_orderdate, o_orderkey) as version,
             cast(sum(cast(o_totalprice as decimal(18, 4))) over (
               partition by o_custkey
               order by o_orderdate, o_orderkey
               rows between unbounded preceding and current row)
               as double) as lifetime_spend
      from orders)
    select o_custkey,
           strftime(valid_from, '%Y-%m-%d') as valid_from,
           strftime(valid_to, '%Y-%m-%d') as valid_to,
           cast(version as int) as version,
           round(lifetime_spend, 2) as lifetime_spend,
           valid_to is null as is_current
    from versions
    """,
)
def dim_customer_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a type-2 slowly-changing dimension from the order event log:
    one validity interval per customer version, closed by the next
    version's start (null = current row), carrying the running lifetime
    spend.

    The warehouse-standard SCD2 derivation: ONE per-customer shuffle
    serves the lead() interval close, the version row_number, and the
    running decimal-exact spend (all three windows share the
    (o_orderdate, o_orderkey) sort, so Catalyst plans a single Window
    node). Dates are emitted as strings for tz-proof parity.
    """
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    return orders.select(
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("valid_from"),
        F.date_format(F.lead("o_orderdate").over(w), "yyyy-MM-dd").alias(
            "valid_to"
        ),
        F.row_number().over(w).alias("version"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .over(wsum)
            .cast("double"),
            2,
        ).alias("lifetime_spend"),
        F.lead("o_orderdate").over(w).isNull().alias("is_current"),
    )


@register(
    "events_funnel_paths",
    oracle="""
    with ordered as (
      select user_id, event_type,
             lead(event_type, 1) over w as t2,
             lead(event_type, 2) over w as t3
      from events
      window w as (partition by user_id order by ts, event_id))
    select event_type || ' > ' || t2 || ' > ' || t3 as path,
           count(*) as n_paths
    from ordered
    where t3 is not null
    group by path
    order by n_paths desc, path
    limit 10
    """,
)
def events_funnel_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path mining: the 10 most common 3-step event sequences across user
    streams — the raw material behind funnel discovery (which journeys
    actually happen, before anyone defines a funnel).

    Both lead() windows share the transition matrix's (user; ts, event_id)
    sort — one per-user shuffle, one Window node; the path rollup keys on
    at most types^3 strings. Count ties in the top-10 are broken by path
    text, so membership is engine-stable.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    return (
        ordered.select(
            F.concat_ws(" > ", "event_type", "t2", "t3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.desc("n_paths"), F.asc("path"))
        .limit(10)
    )


@register(
    "events_attribution",
    oracle=f"""
    with tagged as (
      select user_id, event_type, ts, event_id,
             last_value(case when event_type <> 'purchase' then event_type end
                        ignore nulls) over w as touch_type,
             last_value(case when event_type <> 'purchase' then ts end
                        ignore nulls) over w as touch_ts
      from events
      window w as (partition by user_id order by ts, event_id
                   rows between unbounded preceding and 1 preceding)),
    conv as (
      select coalesce(
               case when touch_ts >= ts - interval 24 hour then touch_type end,
               'direct') as channel
      from tagged
      where event_type = 'purchase')
    select channel,
           count(*) as n_conversions,
           {sql_round_div('count(*)', 'sum(count(*)) over ()', 4)} as share
    from conv
    group by channel
    order by channel
    """,
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: each purchase credits the user's
    most recent non-purchase event within a 24h lookback ('direct' when
    none) — the marketing rollup every event warehouse serves.

    One per-user window shuffle carries BOTH the last touch type and its
    timestamp (last_value ignore-nulls over a rows-preceding frame, the
    same sort the sessionizer uses); the lookback check and channel
    fallback are map-side. No self-join of purchases against the event
    stream — the as-of lookup rides the window, which is what keeps this
    linear at 100 TB.
    """
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    non_purchase = F.when(
        F.col("event_type") != "purchase", F.col("event_type")
    )
    non_purchase_ts = F.when(F.col("event_type") != "purchase", F.col("ts"))
    tagged = ev.select(
        "event_type",
        "ts",
        F.last(non_purchase, ignorenulls=True).over(w).alias("touch_type"),
        F.last(non_purchase_ts, ignorenulls=True).over(w).alias("touch_ts"),
    ).filter(F.col("event_type") == "purchase")
    conv = tagged.select(
        F.coalesce(
            F.when(
                F.col("touch_ts")
                >= F.col("ts") - F.expr("interval 24 hours"),
                F.col("touch_type"),
            ),
            F.lit("direct"),
        ).alias("channel")
    )
    wall = Window.partitionBy()
    return (
        conv.groupBy("channel")
        .agg(F.count(F.lit(1)).alias("n_conversions"))
        .select(
            "channel",
            "n_conversions",
            round_div_long(
                F.col("n_conversions"),
                F.sum("n_conversions").over(wall),
                4,
            ).alias("share"),
        )
        .orderBy("channel")
    )


@register(
    "events_user_features",
    oracle="""
    select user_id,
           count(*) as n_events,
           count(distinct event_type) as n_types,
           round(sum(case when event_type = 'purchase' then value
                          else 0 end), 2) as purchase_value,
           cast(datediff('second', max(ts),
                         (select max(ts) from events)) as bigint)
             as recency_s,
           case when count(*) > 1
                then cast(floor(datediff('second', min(ts), max(ts))
                                / (count(*) - 1)) as bigint)
                else null end as mean_gap_s
    from events
    group by user_id
    """,
)
def events_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ML feature rollup — the feature-store extraction job:
    activity volume, breadth, purchase value, recency against the corpus
    frontier, and mean inter-event gap.

    ONE partial-agg shuffle produces every feature: the mean gap needs no
    lag window (for a fixed count it is span/(n-1), an algebraic identity
    over min/max), and recency subtracts a 1-row broadcast frontier
    scalar. This collapse-to-one-aggregation is what makes thousand-
    feature extraction jobs feasible — windows only where order genuinely
    matters.
    """
    ev = load(spark, sf_dir, "events")
    frontier = ev.agg(F.max("ts").alias("frontier"))
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("event_type").alias("n_types"),
        F.round(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value"))
                .otherwise(0.0)
            ),
            2,
        ).alias("purchase_value"),
        F.max("ts").alias("last_ts"),
        F.min("ts").alias("first_ts"),
    )
    gap = (
        F.unix_seconds("last_ts") - F.unix_seconds("first_ts")
    ) / (F.col("n_events") - 1)
    return per_user.crossJoin(F.broadcast(frontier)).select(
        "user_id",
        "n_events",
        "n_types",
        "purchase_value",
        (
            F.unix_seconds("frontier") - F.unix_seconds("last_ts")
        ).alias("recency_s"),
        F.when(F.col("n_events") > 1, F.floor(gap).cast("bigint")).alias(
            "mean_gap_s"
        ),
    )


@register(
    "orders_cohort_ltv",
    oracle="""
    with firsts as (
      select o_custkey,
             min(date_trunc('month', o_orderdate)) as cohort_month
      from orders
      group by o_custkey),
    rev as (
      select f.cohort_month,
             datediff('month', f.cohort_month,
                      date_trunc('month', o.o_orderdate)) as month_offset,
             cast(o.o_totalprice as decimal(18, 4)) as rev
      from orders o
      join firsts f on f.o_custkey = o.o_custkey)
    select strftime(cohort_month, '%Y-%m-%d') as cohort_month,
           cast(month_offset as int) as month_offset,
           count(*) as n_orders,
           cast(round(sum(rev), 2) as double) as cohort_revenue
    from rev
    group by all
    """,
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue cohorts: lifetime value accrual by acquisition month x
    month offset — the money-side complement of events_retention_cohort's
    user counts (finance reads this matrix cumulatively as LTV curves).

    Same two-shuffle shape as the retention cohort (per-customer first
    month, then the months² rollup), with revenue in decimal so cohort
    cells are summation-order-exact. Month offsets via month-truncated
    datediff — both engines count month-boundary crossings identically on
    truncated dates.
    """
    orders = load(spark, sf_dir, "orders")
    mo = F.date_trunc("month", F.col("o_orderdate"))
    firsts = orders.groupBy("o_custkey").agg(
        F.min(mo).alias("cohort_month")
    )
    rev = orders.join(firsts, "o_custkey").select(
        "cohort_month",
        (
            F.months_between(mo, F.col("cohort_month"))
        ).cast("int").alias("month_offset"),
        F.col("o_totalprice").cast("decimal(18,4)").alias("rev"),
    )
    return rev.groupBy(
        F.date_format("cohort_month", "yyyy-MM-dd").alias("cohort_month"),
        "month_offset",
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("rev"), 2).cast("double").alias("cohort_revenue"),
    )
