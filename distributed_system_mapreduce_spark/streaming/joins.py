"""Structured Streaming stream-STREAM joins (the last streaming shape the
batch surface has no excuse to lack a twin for).

Stream-static joins (streaming/curation.py) broadcast a bounded table into
an unbounded stream; a stream-stream join buffers BOTH sides in the state
store and needs two things to stay bounded, which Spark enforces at
analysis time: a watermark on each input and a time-range constraint in
the join condition. Together they let the engine evict buffered rows the
moment no future match can exist — state is O(events per watermark
horizon), stream length notwithstanding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .windows import read_events_stream


def theta_range_pairs_stream(
    spark: SparkSession, sf_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of ``join_theta_range``'s pair generation: same-user
    event pairs within one hour, as a stream-stream self-join.

    The source is read twice (each side buffers independently); the join
    keeps the user_id equi-key so state lookup is hash-partitioned, and
    the ``(a_ts, a_ts + 1h]`` range plus both watermarks bound each side's
    buffer to the 1h-join-window + watermark horizon. Emitted in append
    mode once the watermark passes a pair's close; bounded single-batch
    replay yields exactly the batch join's pair set
    (tests/test_streaming.py rolls the pairs up per user and compares
    against join_theta_range).
    """
    a = (
        read_events_stream(spark, sf_dir)
        .withWatermark("ts", watermark)
        .select(
            "user_id",
            F.col("ts").alias("a_ts"),
            F.col("event_id").alias("a_id"),
        )
    )
    b = (
        read_events_stream(spark, sf_dir)
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("b_user"),
            F.col("ts").alias("b_ts"),
            F.col("event_id").alias("b_id"),
        )
    )
    return a.join(
        b,
        (a.user_id == b.b_user)
        & (F.col("b_ts") > F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr("interval 1 hour")),
    ).select("user_id", "a_id", "b_id")
