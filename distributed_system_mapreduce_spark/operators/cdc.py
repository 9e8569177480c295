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

from pyspark.sql import DataFrame, SparkSession
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
