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
