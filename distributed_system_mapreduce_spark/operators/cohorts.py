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
    summation-order float noise. The three global ntiles are single-
    partition windows over customer-cardinality rows — at true scale the
    same scores come from approx_percentile edges joined back broadcast;
    the exact form is kept because the oracle can mirror it.
    """
    orders = load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2
        ).alias("monetary"),
    )
    scored = per_cust.select(
        "o_custkey",
        "frequency",
        "monetary",
        F.ntile(RFM_BUCKETS)
        .over(Window.orderBy(F.desc("last_order"), F.asc("o_custkey")))
        .alias("r_score"),
        F.ntile(RFM_BUCKETS)
        .over(Window.orderBy(F.desc("frequency"), F.asc("o_custkey")))
        .alias("f_score"),
        F.ntile(RFM_BUCKETS)
        .over(Window.orderBy(F.desc("monetary"), F.asc("o_custkey")))
        .alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("monetary"), 2).cast("double").alias("segment_revenue"),
    )


@register(
    "events_transition_matrix",
    oracle="""
    with ordered as (
      select user_id, event_type,
             lag(event_type) over (partition by user_id
                                   order by ts, event_id) as prev_type
      from events)
    select prev_type, event_type as next_type,
           count(*) as n_transitions,
           round(count(*) * 1.0 / sum(count(*)) over (partition by prev_type),
                 4) as p_next
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
        F.round(
            F.col("n_transitions")
            / F.sum("n_transitions").over(wnorm),
            4,
        ).alias("p_next"),
    )
