"""§2.10 UDF/UDAF/UDTF surface demonstrations.

In MapReduce the user's map/reduce functions ARE the UDF surface; here we
show each Spark escape hatch once — RDD mapPartitions (the literal map-task
analogue), applyInPandas (reduce(k, iterator) analogue), pandas_udf — and
assert each matches the built-in (JVM) implementation, which remains the
production path for every t2 query.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from distributed_system_mapreduce_spark.registry import QUERIES
from distributed_system_mapreduce_spark.sources.io import load

from conftest import SF_SMOKE


def test_rdd_word_count_matches_dataframe(spark):
    """The OSDI'04 §1.1 word count as raw RDD map/reduce == DataFrame result."""
    docs = load(spark, SF_SMOKE, "documents")
    rdd_counts = (
        docs.rdd.flatMap(lambda row: row["text"].split(" "))
        .filter(lambda w: w != "")
        .map(lambda w: (w, 1))
        .reduceByKey(lambda a, b: a + b)
        .collect()
    )
    df_counts = {
        (r["word"], r["cnt"]) for r in QUERIES["word_count"](spark, SF_SMOKE).collect()
    }
    assert set(rdd_counts) == df_counts


def test_apply_in_pandas_group_reduce(spark):
    """reduce(k, iterator) analogue: per-event_type stats via applyInPandas
    match the built-in aggregation."""
    ev = load(spark, SF_SMOKE, "events")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "cnt": [len(pdf)],
                "sum_value": [round(float(pdf["value"].sum()), 2)],
            }
        )

    got = {
        (r["event_type"], r["cnt"], r["sum_value"])
        for r in ev.groupBy("event_type")
        .applyInPandas(stats, "event_type string, cnt long, sum_value double")
        .collect()
    }
    want = {
        (r["event_type"], r["cnt"], r["sum_value"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .collect()
    }
    assert got == want


def test_pandas_udf_matches_builtin(spark):
    """Vectorized Arrow UDF == JVM expression (revenue computation)."""

    @F.pandas_udf(DoubleType())
    def revenue(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1 - disc)

    li = load(spark, SF_SMOKE, "lineitem").limit(1000)
    got = li.select(revenue("l_extendedprice", "l_discount").alias("r")).collect()
    want = li.select(
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("r")
    ).collect()
    assert [r["r"] for r in got] == [r["r"] for r in want]
