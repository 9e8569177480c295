"""Scale-technique demonstrations: salting, bucketed joins, stateful
streaming — result-identical to their naive forms, with the physical
property that matters asserted."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.functions.skew import salted_count, salted_join
from distributed_system_mapreduce_spark.plans import explain_str
from distributed_system_mapreduce_spark.sources.io import load

from conftest import SF_SMOKE


def test_salted_join_matches_plain_join(spark):
    orders = load(spark, SF_SMOKE, "orders")
    customer = load(spark, SF_SMOKE, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = {
        (r["o_orderkey"], r["c_name"])
        for r in orders.join(customer, "o_custkey").select("o_orderkey", "c_name").collect()
    }
    salted = {
        (r["o_orderkey"], r["c_name"])
        for r in salted_join(orders, customer, "o_custkey", n_salts=4)
        .select("o_orderkey", "c_name")
        .collect()
    }
    assert salted == plain


def test_salted_count_matches_plain_count(spark):
    ev = load(spark, SF_SMOKE, "events")
    plain = {
        (r["user_id"], r["cnt"])
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    salted = {
        (r["user_id"], r["cnt"]) for r in salted_count(ev, "user_id", 4).collect()
    }
    assert salted == plain


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key pre-materializes the shuffle:
    the join plan must contain no Exchange on the bucketed keys.
    (Uses the default ./spark-warehouse, which is gitignored.)"""
    orders = load(spark, SF_SMOKE, "orders")
    customer = load(spark, SF_SMOKE, "customer")
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey").mode(
        "overwrite"
    ).saveAsTable("orders_b")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey").mode(
        "overwrite"
    ).saveAsTable("customer_b")
    # disable auto-broadcast so the test exercises the shuffle-free SMJ path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ob = spark.table("orders_b")
        cb = spark.table("customer_b")
        j = ob.join(cb, ob.o_custkey == cb.c_custkey).select("o_orderkey", "c_name")
        plan = explain_str(j)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert j.count() == load(spark, SF_SMOKE, "orders").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("drop table if exists orders_b")
        spark.sql("drop table if exists customer_b")
