"""Structured Streaming twins of the batch event-time windows (SURVEY.md §2.9).

The MapReduce reference model is strictly batch (OSDI 2004) — no watermarks,
no windows, no late-data handling. These builders exist because the engine is
Spark-native: the SAME aggregations as operators/timewin.py, expressed over an
unbounded source with watermarking, so a user can lift the batch pipeline to a
stream without rewriting logic. They are exercised by unit tests with
``availableNow`` triggers (bounded replay of the parquet fixtures); they are
NOT part of the t2 surface (the DuckDB oracle is batch-only).

Scale notes:
- Watermark = bound on state: with a 1-hour watermark Spark drops per-window
  state older than max(event_time) - 1h, so state size is O(active windows ×
  keys), independent of stream length.
- ``session_window`` is Spark's native gap-based sessionization; state per
  (user, open session) merges on arrival — the streaming dual of the batch
  lag+cumsum sessionizer (identical output on bounded input).
- Sinks: tests use the in-memory sink; production would use a parquet/Kafka
  sink with checkpointing for exactly-once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import normalize_events_ts, table_path


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the events parquet with the same ``ts``
    normalization as the batch reader (fixtures have shipped both NANOS and
    µs encodings — the streaming schema is taken from a batch sniff of the
    same file so both paths always agree)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    # the file stream source requires a DIRECTORY; point it at the sf dir and
    # glob-filter down to the events file
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_events_ts(raw)


def tumbling_counts_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of ``window_tumbling``: hourly counts + sums with
    late-data tolerance = ``watermark``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("hour_start"), "event_type", "cnt", "sum_value")
    )


def sliding_counts_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of ``window_sliding``: 1h windows every 15 minutes."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("win_start"), "cnt", "sum_value")
    )


def session_counts_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming sessionization via native ``session_window`` (30-min gap) —
    the stateful dual of the batch lag+cumsum sessionizer."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            "n_events",
            "sum_value",
        )
    )


def running_user_totals_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: running
    per-user event count + value total across micro-batches.

    This is the escape hatch for stateful logic Spark's built-in windows
    can't express (per-key counters, ML feature state, CEP-ish patterns):
    state is a typed tuple per key, persisted in the state store, updated
    with Arrow-batched pandas — the streaming analogue of MapReduce's
    ``reduce(k, iterator)`` with memory between batches.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdf_iter, state):
        count, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            count += len(pdf)
            total += float(pdf["value"].sum())
        state.update((count, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [count],
                "total_value": [round(total, 2)],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n_events long, total_value double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(
    stream_df: DataFrame, query_name: str, mode: str | None = None
) -> DataFrame:
    """Drain a bounded stream into the in-memory sink and return the result
    as a batch DataFrame (test/dev helper; production uses durable sinks).

    ``mode`` overrides the output mode; by default streaming aggregations
    replay in ``complete`` and stateful FlatMapGroups plans in ``update``
    (non-aggregating stateful ops like stream dedup need ``append``)."""
    if mode is None:
        mode = "update" if stream_df.isStreaming and _is_stateful_update(stream_df) else "complete"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def _is_stateful_update(stream_df: DataFrame) -> bool:
    """applyInPandasWithState plans only support update/append output."""
    return "FlatMapGroupsInPandasWithState" in stream_df._jdf.queryExecution().logical().toString()
