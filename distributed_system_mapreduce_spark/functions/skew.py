"""Skew mitigation utilities (SURVEY.md §7.3.8: "salting for skew").

At 100 TB a handful of hot keys (celebrity users, default-valued FKs) can
put one shuffle partition hours behind the rest. Two mitigations ship here:

1. AQE skew-join splitting — on by default in session.get_spark(); handles
   skew detected at runtime with no code change. Prefer it.
2. Explicit salting (this module) — for the cases AQE can't fix: skewed
   aggregations, and joins where the skewed side must stay un-broadcast.

``salted_join`` replicates the small side R times and scatters the large
side's hot keys across R salt buckets, so a key's rows land on R partitions
instead of one. Result-identical to a plain join (asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"

#: join types for which salting is result-identical to a plain join. Right/
#: full outer are excluded: unmatched SMALL-side rows would surface once per
#: salt replica (small side is exploded ×R), duplicating them R times.
SALTED_JOIN_TYPES = frozenset({"inner", "left", "left_outer", "left_semi", "left_anti"})


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``large ⋈ small`` on ``key`` with the large side salted R ways.

    The small side is exploded ×R (acceptable: it is small by contract);
    the large side gets a random-but-deterministic salt from its own row
    (hash of all columns mod R — no rand(), so the plan stays deterministic
    and re-executable under task retry).

    Only large-side-preserving join types are accepted (SALTED_JOIN_TYPES):
    for right/full outer joins the exploded small side would emit each
    unmatched small row once per salt replica.
    """
    if how not in SALTED_JOIN_TYPES:
        raise ValueError(
            f"salted_join does not preserve {how!r} join semantics "
            f"(unmatched small-side rows duplicate x{n_salts}); "
            f"allowed: {sorted(SALTED_JOIN_TYPES)}"
        )
    salt_values = F.array(*[F.lit(i) for i in range(n_salts)])
    small_rep = small.withColumn(SALT_COL, F.explode(salt_values))
    large_salted = large.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*large.columns), F.lit(n_salts)).cast("int")
    )
    joined = large_salted.join(small_rep, [key, SALT_COL], how)
    return joined.drop(SALT_COL)


def salted_count(df: DataFrame, key: str, n_salts: int = 8) -> DataFrame:
    """Two-phase skew-proof count per key: pre-aggregate on (key, salt),
    then final-aggregate on key — the manual form of what partial
    aggregation already does for algebraic aggregates, useful as the
    template for non-algebraic ones (e.g. exact distinct lists)."""
    salted = df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).cast("int")
    )
    partial = salted.groupBy(key, SALT_COL).agg(F.count(F.lit(1)).alias("c"))
    return partial.groupBy(key).agg(F.sum("c").alias("cnt"))


def _register_skew_queries() -> None:
    """First-class t2 queries for the skew paths (same answers, same oracles
    as their unsalted twins — count_by_key / join_reduce_side — so the
    driver hash-verifies that salting is result-identical, not just our
    unit tests)."""
    from pyspark.sql import SparkSession

    from ..registry import register
    from ..sources.io import load

    @register(
        "count_by_key_salted",
        oracle=(
            "select event_type, cast(count(*) as bigint) as cnt "
            "from events group by event_type"
        ),
    )
    def count_by_key_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
        """count_by_key through the two-phase salted aggregation — the
        skew-proof template for NON-algebraic aggregates (exact distinct
        lists, top-k per key), where built-in partial aggregation cannot
        help because the merge is not a simple sum. Hash-verified against
        the same oracle as count_by_key: salting must be invisible in the
        result."""
        events = load(spark, sf_dir, "events").select("event_id", "event_type")
        return salted_count(events, "event_type")

    @register(
        "join_reduce_side_salted",
        oracle="""
        select o_orderkey, o_totalprice, c_custkey, c_name
        from orders join customer on o_custkey = c_custkey
        """,
    )
    def join_reduce_side_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
        """join_reduce_side through the explicit salt-scatter join — the
        mitigation for a hot key when the small side must stay
        un-broadcast and AQE's runtime split is unavailable (e.g. the
        skew only appears under a downstream repartitioning). The salt is
        derived from the large side's own columns (no rand()), so the
        plan is deterministic under task retry. Hash-verified against the
        plain-join oracle."""
        orders = load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice", F.col("o_custkey").alias("c_custkey")
        )
        customer = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
        return salted_join(orders, customer, "c_custkey").select(
            "o_orderkey", "o_totalprice", "c_custkey", "c_name"
        )


_register_skew_queries()
