"""Pin eval_regression_metrics' r16 residual-round decomposition.

The query rounds the per-row residual (vn*cn - s9)/(cn*10^9) half away
from zero at 9 dp. Since the divisor is a GROUP constant, the round
decomposes into per-group constants (floor quotient + two tie flags) and
a per-row long subtract + branch (operators/mleval.py:_residual_round).
These tests drive the exact module helpers the query uses against
exactmath.round_div's decimal pipeline — the formulation the DuckDB
oracle mirrors — on groups engineered to land residuals ON half-nano tie
points of both signs, where any decomposition error would show first.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.exactmath import round_div
from distributed_system_mapreduce_spark.operators.mleval import (
    _residual_round,
    _residual_round_consts,
)


def _both_paths(spark, groups):
    """groups: {gid: [vn nanos...]} -> rows of (decomposed, reference)."""
    rows = [(g, vn) for g, vals in groups.items() for vn in vals]
    base = spark.createDataFrame(rows, "g long, vn long")
    consts = _residual_round_consts(
        base.groupBy("g").agg(
            F.sum("vn").cast("decimal(38,0)").alias("s9"),
            F.count(F.lit(1)).alias("cn"),
        ),
        "s9", "cn", "m_",
    )
    return (
        base.join(consts, "g")
        .select(
            "g",
            "vn",
            _residual_round(
                F.col("vn"), F.col("m_q"), F.col("m_adj_pos"),
                F.col("m_adj_np"),
            ).alias("got"),
            (
                round_div(
                    (
                        F.col("vn").cast("decimal(38,0)") * F.col("cn")
                        - F.sum("vn").over(
                            Window.partitionBy("g")
                        ).cast("decimal(38,0)")
                    ),
                    F.col("cn") * F.lit(10 ** 9),
                    9,
                ).cast("decimal(18,9)")
            ).alias("want"),
        )
        .collect()
    )


def test_residual_decomposition_matches_round_div_at_ties(spark):
    groups = {
        # mean = x.5 nanos exactly (cn=2, odd sum): every residual is a
        # half-nano tie; one positive, one negative per group
        1: [7, 8],
        2: [-7, -8],
        3: [0, 1],
        4: [-1, 0],
        # mean with rem just above / below half (cn=4)
        5: [1, 1, 1, 4],      # rem 3 of 4  -> 2*rem > cn
        6: [1, 1, 1, 2],      # rem 1 of 4  -> 2*rem < cn
        7: [1, 1, 3, 3],      # rem 0       -> integer mean
        # negative sums with nonzero remainder (floor-fix path)
        8: [-5, -5, -5, -2],
        9: [-1, -1, -1, 2],
        # residual exactly zero at a tie-free group
        10: [42, 42, 42],
        # wide nano magnitudes (the long-I envelope; still < 2^52 so the
        # double fast path is in play)
        11: [10 ** 15 + 1, 10 ** 15 + 2],
        12: [-(10 ** 15) - 1, -(10 ** 15) - 2],
    }
    for row in _both_paths(spark, groups):
        assert row["got"] == row["want"], row


def test_residual_decomposition_exact_past_double_window(spark):
    """Residual nanos beyond 2^52 must take the exact decimal-multiply
    branch of _residual_round and still equal the reference round."""
    groups = {
        # cn=2, one huge positive + huge negative: residuals ~ +/-9e17,
        # far past 2^52, sum odd -> half-nano tie on top
        1: [9 * 10 ** 17, -(9 * 10 ** 17) + 1],
    }
    for row in _both_paths(spark, groups):
        assert row["got"] == row["want"], row
