"""Set operations (SURVEY.md §2.7).

MapReduce parity: union = concatenated inputs; intersect/except = co-group
with both-present / left-only emission (published Hadoop patterns; reference
snapshot empty, SURVEY.md §0).

Scale notes: ``union`` is a zero-shuffle metadata concat in Spark; the
distinct set ops shuffle only the (already projected) key columns.
Spark ``union`` keeps duplicates, so the oracle SQL says UNION ALL
explicitly (SURVEY.md §7.3.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.io import load


@register(
    "set_union_all",
    oracle="""
    select event_id, user_id, 'click' as src from events where event_type = 'click'
    union all
    select event_id, user_id, 'view' as src from events where event_type = 'view'
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two labelled event slices (input concatenation)."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.lit("click").alias("src")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", F.lit("view").alias("src")
    )
    return clicks.unionByName(views)


@register(
    "set_intersect",
    oracle="""
    select user_id from events where event_type = 'click' and value > 150
    intersect
    select user_id from events where event_type = 'purchase' and value > 150
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users with both a high-value click AND a high-value purchase
    (distinct INTERSECT; the value filter keeps both sets non-degenerate —
    every user has every event type in the synthetic data)."""
    ev = load(spark, sf_dir, "events").filter(F.col("value") > 150)
    clicked = ev.filter(F.col("event_type") == "click").select("user_id")
    purchased = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clicked.intersect(purchased)


@register(
    "set_except",
    oracle="""
    select user_id from events where event_type = 'view' and value > 150
    except
    select user_id from events where event_type = 'purchase' and value > 150
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users with a high-value view but no high-value purchase (distinct
    EXCEPT = DataFrame.subtract; exceptAll would be multiset semantics)."""
    ev = load(spark, sf_dir, "events").filter(F.col("value") > 150)
    viewed = ev.filter(F.col("event_type") == "view").select("user_id")
    purchased = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return viewed.subtract(purchased)
