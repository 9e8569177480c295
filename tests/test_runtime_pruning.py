"""Runtime pruning demonstrations: dynamic partition pruning (DPP) and
Bloom-filter runtime join filters.

Both are Catalyst features the engine RELIES on at 100 TB rather than
reimplements (SURVEY.md §4.1): a date/partition-keyed fact table joined to
a filtered dimension must not scan every partition, and a shuffle join with
a selective build side should pre-filter the probe side with a Bloom filter
before the exchange. These tests pin the physical-plan evidence so a config
or upgrade regression is caught.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.plans import explain_str
from distributed_system_mapreduce_spark.sources.io import load

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def orders_partitioned(spark, tmp_path_factory):
    """Orders written partitioned by order year — the layout a 100 TB fact
    table would use (partition column = the dominant filter/join key)."""
    base = tmp_path_factory.mktemp("dpp")
    fact_path = str(base / "orders_part")
    dim_path = str(base / "year_dim")
    orders = load(spark, SF_SMOKE, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    orders.write.partitionBy("o_year").mode("overwrite").parquet(fact_path)
    # a tiny dimension keyed by the partition column, with a non-key
    # attribute to filter on (a filter on the key itself would be folded
    # statically and never exercise DPP)
    orders.select("o_year").distinct().withColumn(
        "era", F.when(F.col("o_year") >= 1997, "modern").otherwise("classic")
    ).write.mode("overwrite").parquet(dim_path)
    return fact_path, dim_path


def test_dynamic_partition_pruning(spark, orders_partitioned):
    fact_path, dim_path = orders_partitioned
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).filter(F.col("era") == "modern")
    joined = fact.join(dim, "o_year")

    plan = explain_str(joined)
    assert "dynamicpruning" in plan, plan  # fact scan is pruned at runtime

    # and the pruned result is exactly the statically-filtered answer
    expected = (
        load(spark, SF_SMOKE, "orders")
        .filter(F.year("o_orderdate") >= 1997)
        .count()
    )
    assert joined.count() == expected


def test_bloom_filter_runtime_join_filter(spark):
    """A selective dim filter on the build side of a shuffle join must inject
    a might_contain() pre-filter on the fact scan side."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # thresholds are sized for clusters; open them up for local[·] data
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = load(spark, SF_SMOKE, "lineitem")
        pa = load(spark, SF_SMOKE, "part").filter(F.col("p_brand") == "Brand#13")
        joined = li.join(pa, li.l_partkey == pa.p_partkey)

        plan = explain_str(joined)
        assert "might_contain" in plan, plan
        assert "bloom_filter_agg" in plan, plan

        # semantics unchanged by the runtime filter
        expected = (
            li.join(pa.hint("broadcast"), li.l_partkey == pa.p_partkey).count()
        )
        assert joined.count() == expected
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
