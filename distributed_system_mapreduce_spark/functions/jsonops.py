"""Semi-structured (JSON) extraction (SURVEY.md §2.8 json_extract_props).

MapReduce parity: in the reference model nested payloads are opaque strings
the user's map() parses; Spark-native form is ``get_json_object`` /
``from_json`` evaluated inside codegen, with the parse running map-side so
only extracted keys shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.io import load


@register(
    "json_extract_props",
    oracle="""
    select cast(props->>'$.k' as bigint) % 10 as k_mod,
           count(*) as cnt,
           count(distinct cast(props->>'$.k' as bigint)) as n_distinct_k
    from events
    group by k_mod
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse events.props JSON, aggregate by k % 10."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select(k.alias("k"))
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct("k").alias("n_distinct_k"),
        )
    )


@register(
    "json_modal_prop",
    oracle="""
    with k as (
      select event_type, cast(props->>'$.k' as int) as kv from events),
    cnt as (select event_type, kv, count(*) as n from k
            where kv is not null group by all)
    select event_type, modal_k, n_occurrences,
           cast(n_distinct as bigint) as n_distinct_k from (
      select event_type, kv as modal_k, n as n_occurrences,
             row_number() over (partition by event_type
                                order by n desc, kv) as rn,
             count(*) over (partition by event_type) as n_distinct
      from cnt)
    where rn = 1
    """,
)
def json_modal_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group mode of a JSON property: the most frequent props.k
    per event type (plus its count and the distinct-value count) — the
    payload-profiling rollup a semi-structured pipeline runs to decide
    whether a JSON field is an enum in disguise.

    Mode is the classic argmax-per-group: two partial-agg rollups then
    ``min_by`` over a (count desc, value) ordering struct — map-side
    combinable, no rank window over the value frame (DuckDB has no
    min_by-with-struct-ordering tiebreak, so the oracle keeps the naive
    window; results are row-identical). Rows with a missing/non-numeric
    ``$.k`` are excluded BEFORE the rollup on both engines — Spark's
    ordering struct sorts a NULL field first while the oracle's
    ``order by n desc, kv`` sorts NULLs last, so a NULL group tying the
    max count would otherwise pick a different modal_k per engine
    (ADVICE r9). JSON parsing is JVM-side get_json_object — no Python.
    """
    ev = load(spark, sf_dir, "events")
    cnt = (
        ev.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("int").alias("kv"),
        )
        .filter(F.col("kv").isNotNull())
        .groupBy("event_type", "kv")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return cnt.groupBy("event_type").agg(
        F.min_by(
            F.struct(
                F.col("kv").alias("modal_k"),
                F.col("n").alias("n_occurrences"),
            ),
            F.struct((-F.col("n")).alias("nn"), F.col("kv").alias("kv")),
        ).alias("m"),
        F.count(F.lit(1)).alias("n_distinct_k"),
    ).select(
        "event_type",
        F.col("m.modal_k").alias("modal_k"),
        F.col("m.n_occurrences").alias("n_occurrences"),
        "n_distinct_k",
    )
