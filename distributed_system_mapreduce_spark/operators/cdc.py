"""Change-data-capture merge: MERGE INTO semantics as a batch query.

The lakehouse maintenance loop every warehouse runs: a base snapshot plus
a later changelog batch, merged latest-wins into the next snapshot
(Delta/Iceberg ``MERGE INTO`` = upsert + delete). The engine expresses it
as pure DataFrame ops so Catalyst owns the physical strategy:

- The ``events`` stream doubles as the changelog: ``signup``/``click``/
  ``view``/``purchase`` are upserts of a per-user profile, ``error`` is a
  tombstone (delete). The time span splits at its midpoint into the base
  period and the change batch — both derived deterministically from the
  data, mirrored in the oracle.
- Latest-wins per user is ``max_by`` over a (ts, event_id) ordering
  struct: partial-aggregates map-side, so each side collapses to one row
  per user before its single shuffle. No window sort of raw events.
- The merge itself is one full-outer join on the natural key — exactly
  the shuffle MERGE INTO pays — with the action column (I/U/K) showing
  which branch each surviving row took; tombstoned users drop out.

Scale (100 TB): two per-user partial-agg shuffles + one key-partitioned
join; output is bounded by user cardinality, not event volume. At real
scale the base side is the standing table (already bucketed by the merge
key), so only the incremental batch shuffles — the plan here is that
shape with both sides derived from one table.

No reference-file citation possible (empty snapshot — SURVEY.md §0); CDC
merge is standard lakehouse practice (Armbrust et al., "Delta Lake",
VLDB 2020).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.io import load

_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_FMT_DUCK = "%Y-%m-%d %H:%M:%S"

#: Tombstone event type — a user whose latest op in a period is this is
#: deleted as of that period.
TOMBSTONE = "error"


def _latest_state(ev: DataFrame) -> DataFrame:
    """Latest-wins per-user state over one changelog period.

    One map-side-combining groupBy: ``max_by`` carries the winning
    (event_type, value, ts) by the unique (ts, event_id) order; ``n_ops``
    counts every op applied in the period.
    """
    return ev.groupBy("user_id").agg(
        F.max_by(
            F.struct("event_type", "value", "ts"),
            F.struct("ts", "event_id"),
        ).alias("last"),
        F.count(F.lit(1)).alias("n_ops"),
    ).select(
        "user_id",
        F.col("last.event_type").alias("last_type"),
        F.col("last.value").alias("last_value"),
        F.col("last.ts").alias("last_ts"),
        "n_ops",
    )


@register(
    "cdc_merge_upserts",
    oracle=f"""
    with bounds as (
      select (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 as split_us
      from events),
    ranked as (
      select user_id, event_type, value, ts,
             epoch_us(ts) >= (select split_us from bounds) as is_chg,
             row_number() over (
               partition by user_id,
                 epoch_us(ts) >= (select split_us from bounds)
               order by ts desc, event_id desc) as rn,
             count(*) over (
               partition by user_id,
                 epoch_us(ts) >= (select split_us from bounds)) as n_ops
      from events),
    state as (
      select user_id, is_chg, event_type as last_type, value as last_value,
             ts as last_ts, n_ops
      from ranked where rn = 1),
    base as (
      select * from state where not is_chg and last_type <> '{TOMBSTONE}'),
    chg as (
      select * from state where is_chg)
    select coalesce(c.user_id, b.user_id) as user_id,
           case when c.user_id is null then 'K'
                when b.user_id is null then 'I'
                else 'U' end as action,
           coalesce(c.last_type, b.last_type) as last_type,
           round(coalesce(c.last_value, b.last_value), 2) as last_value,
           strftime(coalesce(c.last_ts, b.last_ts), '{_FMT_DUCK}')
             as last_ts,
           cast(coalesce(b.n_ops, 0) + coalesce(c.n_ops, 0) as bigint)
             as n_events
    from base b
    full outer join chg c on b.user_id = c.user_id
    where coalesce(c.last_type, b.last_type) <> '{TOMBSTONE}'
    """,
)
def cdc_merge_upserts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE the change-batch half of the event stream into the base-half
    snapshot: upsert latest-wins profiles, drop tombstoned users, tag each
    surviving row I (insert), U (update) or K (kept unchanged).
    """
    ev = load(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    split = ev.agg(
        ((F.min("ts_us") + F.max("ts_us")) / 2)
        .cast("bigint")
        .alias("split_us")
    )
    ev = ev.crossJoin(F.broadcast(split))

    base = _latest_state(ev.filter(F.col("ts_us") < F.col("split_us")))
    base = base.filter(F.col("last_type") != TOMBSTONE)
    chg = _latest_state(ev.filter(F.col("ts_us") >= F.col("split_us")))

    b = base.alias("b")
    c = chg.alias("c")
    merged = b.join(c, on="user_id", how="full_outer").select(
        "user_id",
        F.when(F.col("c.last_type").isNull(), F.lit("K"))
        .when(F.col("b.last_type").isNull(), F.lit("I"))
        .otherwise(F.lit("U"))
        .alias("action"),
        F.coalesce("c.last_type", "b.last_type").alias("last_type"),
        F.round(F.coalesce("c.last_value", "b.last_value"), 2).alias(
            "last_value"
        ),
        F.date_format(
            F.coalesce("c.last_ts", "b.last_ts"), _FMT_SPARK
        ).alias("last_ts"),
        (
            F.coalesce("b.n_ops", F.lit(0))
            + F.coalesce("c.n_ops", F.lit(0))
        )
        .cast("bigint")
        .alias("n_events"),
    )
    return merged.filter(F.col("last_type") != TOMBSTONE)


@register(
    "mv_incremental_refresh",
    oracle=f"""
    with bounds as (
      select (min(epoch_us(o_orderdate)) + max(epoch_us(o_orderdate))) // 2
               as split_us
      from orders),
    tagged as (
      select o_orderpriority as priority,
             strftime(o_orderdate, '%Y-%m') as month,
             epoch_us(o_orderdate) >= (select split_us from bounds)
               as is_delta,
             cast(o_totalprice as decimal(18,4)) as price
      from orders)
    select priority, month,
           cast(count(*) as bigint) as n_orders,
           cast(sum(case when is_delta then 0 else 1 end) as bigint)
             as n_base,
           cast(sum(case when is_delta then 1 else 0 end) as bigint)
             as n_delta,
           cast(round(sum(price), 2) as double) as sum_total,
           -- exact integer half-up round of (sum/count) to 4 dp: both
           -- engines' decimal division degrades to double, and a quotient
           -- landing EXACTLY on a half (sum has 4 dp, so sum/400 can) then
           -- rounds by fp luck — 2 rows diverged at sf0.1 (r15 parity
           -- sweep). s_scaled = sum*10^4 is exact hugeint; floor((2s+n)/2n)
           -- is round-half-up; the /10000.0 is the same IEEE op both sides.
           cast((2 * cast(sum(price) * 10000 as hugeint) + count(*))
                // (2 * count(*)) as double) / 10000 as avg_total
    from tagged
    group by priority, month
    """,
)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view refresh: merge a standing per-group
    rollup with a change-batch rollup WITHOUT rescanning the base period —
    the algebraic partial-aggregate merge every incremental MV engine
    (Delta MV, Materialize, Druid rollup compaction) is built on.

    The orders span splits at its midpoint (derived from the data,
    mirrored in the oracle): the base half stands in for the materialized
    rollup, the delta half for the incoming batch. Count/sum merge by
    addition (sums exact in decimal(18,4), so merge order is irrelevant);
    avg re-derives from the merged sum/count — the reason MVs store
    (sum, count), never avg. The oracle computes the same groups in one
    pass; algebraic-merge == recompute is exactly the property being
    witnessed (and pinned in tests/test_invariants.py).

    Scale: each side is one partial-agg shuffle collapsing to groups; the
    merge is a full-outer join on the group key over rollup-sized frames.
    At 100 TB only the delta batch is scanned per refresh — the base
    rollup is the standing table.
    """
    od = load(spark, sf_dir, "orders").withColumn(
        # o_orderdate arrives TIMESTAMP_NTZ; the container runs UTC, so the
        # cast-to-instant epoch equals DuckDB's epoch_us over the naive value
        "ts_us",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")),
    )
    split = od.agg(
        ((F.min("ts_us") + F.max("ts_us")) / 2)
        .cast("bigint")
        .alias("split_us")
    )
    od = od.crossJoin(F.broadcast(split)).select(
        F.col("o_orderpriority").alias("priority"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        (F.col("ts_us") >= F.col("split_us")).alias("is_delta"),
        F.col("o_totalprice").cast("decimal(18,4)").alias("price"),
    )

    def rollup(df: DataFrame, n_col: str, s_col: str) -> DataFrame:
        return df.groupBy("priority", "month").agg(
            F.count(F.lit(1)).alias(n_col),
            F.sum("price").alias(s_col),
        )

    base = rollup(od.filter(~F.col("is_delta")), "n_base", "s_base")
    delta = rollup(od.filter(F.col("is_delta")), "n_delta", "s_delta")
    zero = F.lit(0).cast("decimal(28,4)")
    merged = base.join(delta, ["priority", "month"], "full_outer").select(
        "priority",
        "month",
        (
            F.coalesce("n_base", F.lit(0)) + F.coalesce("n_delta", F.lit(0))
        ).alias("n_orders"),
        F.coalesce("n_base", F.lit(0)).cast("bigint").alias("n_base"),
        F.coalesce("n_delta", F.lit(0)).cast("bigint").alias("n_delta"),
        (F.coalesce(F.col("s_base"), zero) + F.coalesce(F.col("s_delta"), zero))
        .alias("s_total"),
    )
    # avg re-derives from (sum, count) with the 4-dp round done in EXACT
    # integer arithmetic: s_scaled = sum*10^4 (exact, scale-4 decimal),
    # floor((2*s_scaled + n) / (2*n)) = round-half-up(s_scaled / n). A
    # double-path round diverged from DuckDB on quotients landing exactly
    # on a half (caught at sf0.1 by the r15 parity sweep); decimal `div`
    # keeps both engines on the same integers, and the final /10000.0 is
    # the identical IEEE op on both sides. sum_total rounds in DECIMAL
    # (exact half-up) before the double cast for the same reason.
    return (
        merged.withColumn(
            "s_scaled", (F.col("s_total") * 10000).cast("decimal(38,0)")
        )
        .withColumn(
            # `div` is EXACT integral division on decimals (never a
            # rounded decimal quotient, whose floor could land one off
            # for quotients within the division scale's half-ulp of an
            # integer), so both engines compute the identical integer.
            "avg_scaled",
            F.expr("(2 * s_scaled + n_orders) div (2 * n_orders)"),
        )
        .select(
            "priority",
            "month",
            F.col("n_orders").cast("bigint").alias("n_orders"),
            "n_base",
            "n_delta",
            F.round(F.col("s_total"), 2).cast("double").alias("sum_total"),
            (F.col("avg_scaled").cast("double") / F.lit(10000.0)).alias(
                "avg_total"
            ),
        )
    )


@register(
    "cdc_scd2_history",
    oracle=f"""
    with ordered as (
      select user_id, event_type, ts, event_id,
             lag(event_type) over (partition by user_id
                                   order by ts, event_id) as prev_type
      from events),
    changes as (
      select user_id, event_type, ts
      from ordered
      where prev_type is null or event_type <> prev_type),
    versioned as (
      select user_id, event_type,
             row_number() over (partition by user_id order by ts) as version,
             ts as valid_from,
             lead(ts) over (partition by user_id order by ts) as valid_to
      from changes)
    select user_id,
           cast(version as int) as version,
           event_type as attr_value,
           strftime(valid_from, '{_FMT_DUCK}') as valid_from,
           coalesce(strftime(valid_to, '{_FMT_DUCK}'), '') as valid_to,
           valid_to is null as is_current
    from versioned
    """,
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 build from a changelog: each
    user's event_type attribute becomes a versioned history of validity
    intervals [valid_from, valid_to), opened only when the attribute
    actually CHANGES — the change-compression step that distinguishes
    SCD2-from-a-CDC-feed from dim_customer_scd2 (cohorts.py), which
    versions every order row: a noisy changelog repeats the same
    attribute value for most records, and versioning those would bloat
    the dimension by the duplication factor (Kimball SCD2).

    Two windows, both partitioned by the natural key (per-user slices,
    never corpus-sized): a lag to detect changes, then lead/row_number
    over the CHANGE rows only — the second window's input is already
    change-compressed, so its cost tracks distinct transitions, not raw
    events. The unique event_id tiebreak makes change detection
    engine-deterministic even under same-timestamp events; validity
    bounds format as strings (tz-proof parity), open intervals as ''.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select(
            "user_id",
            "event_type",
            "ts",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select("user_id", "event_type", "ts")
    )
    wv = Window.partitionBy("user_id").orderBy("ts")
    return changes.select(
        "user_id",
        F.row_number().over(wv).cast("int").alias("version"),
        F.col("event_type").alias("attr_value"),
        F.date_format("ts", _FMT_SPARK).alias("valid_from"),
        F.coalesce(
            F.date_format(F.lead("ts").over(wv), _FMT_SPARK), F.lit("")
        ).alias("valid_to"),
        F.lead("ts").over(wv).isNull().alias("is_current"),
    )


@register(
    "cdc_snapshot_diff",
    oracle=f"""
    with bounds as (
      select (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 as split_us
      from events),
    s1 as (
      select user_id, event_type as lt, ts
      from (select user_id, event_type, ts,
                   row_number() over (partition by user_id
                     order by ts desc, event_id desc) as rn
            from events
            where epoch_us(ts) < (select split_us from bounds))
      where rn = 1),
    s2 as (
      select user_id, event_type as lt, ts
      from (select user_id, event_type, ts,
                   row_number() over (partition by user_id
                     order by ts desc, event_id desc) as rn
            from events)
      where rn = 1),
    classed as (
      select coalesce(a.user_id, b.user_id) as user_id,
             (a.user_id is not null and a.lt <> '{TOMBSTONE}') as alive1,
             (b.user_id is not null and b.lt <> '{TOMBSTONE}') as alive2,
             a.ts as ts1, b.ts as ts2
      from s1 a full outer join s2 b on a.user_id = b.user_id)
    select case when not alive1 and alive2 then 'A'
                when alive1 and not alive2 then 'D'
                when alive1 and alive2 and ts1 <> ts2 then 'C'
                else 'S' end as diff,
           cast(count(*) as bigint) as n_users,
           cast(sum(user_id) as bigint) as user_checksum
    from classed
    where alive1 or alive2
    group by 1
    order by 1
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-diff audit between two snapshots of the latest-wins user
    store: the state as of the span midpoint (S1) vs the state at the end
    of the changelog (S2), classified per user as A (added: absent or
    tombstoned at S1, alive at S2), D (deleted: alive at S1, tombstoned
    by S2), C (changed: alive in both with a different last-applied op)
    or S (same: no op landed between the snapshots) — the
    reconciliation report a lakehouse runs to validate an incremental
    MERGE against a full recompute (the table-diff counterpart of
    cdc_merge_upserts' row-level action tags).

    Scale (100 TB): both snapshots are the same map-side-combining
    ``max_by`` per-user rollup as cdc_merge_upserts (`_latest_state`),
    so each side collapses to user cardinality before its single
    shuffle; the diff itself is one key-partitioned full-outer join and
    a 4-group rollup. Never-alive users (tombstoned in both snapshots)
    are excluded, mirroring the oracle's ``where alive1 or alive2``.
    """
    ev = load(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    split = ev.agg(
        ((F.min("ts_us") + F.max("ts_us")) / 2)
        .cast("bigint")
        .alias("split_us")
    )
    ev = ev.crossJoin(F.broadcast(split))
    s1 = _latest_state(ev.filter(F.col("ts_us") < F.col("split_us")))
    s2 = _latest_state(ev)
    a = s1.alias("a")
    b = s2.alias("b")
    alive1 = F.col("a.last_type").isNotNull() & (
        F.col("a.last_type") != TOMBSTONE
    )
    alive2 = F.col("b.last_type").isNotNull() & (
        F.col("b.last_type") != TOMBSTONE
    )
    classed = (
        a.join(b, on="user_id", how="full_outer")
        .filter(alive1 | alive2)
        .select(
            "user_id",
            F.when(~alive1 & alive2, F.lit("A"))
            .when(alive1 & ~alive2, F.lit("D"))
            .when(
                alive1
                & alive2
                & (F.col("a.last_ts") != F.col("b.last_ts")),
                F.lit("C"),
            )
            .otherwise(F.lit("S"))
            .alias("diff"),
        )
    )
    return (
        classed.groupBy("diff")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("user_id").cast("bigint").alias("user_checksum"),
        )
        .orderBy("diff")
    )
