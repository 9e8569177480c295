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


#: trailing hourly buckets retained per event_type by rate_anomaly_stream:
#: current hour + the 24h baseline window + 1h slack for bucket boundaries.
_ANOMALY_KEEP_HOURS = 26


def rate_anomaly_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of ``events_rate_anomaly``: per event_type, hourly
    event counts z-scored against the type's trailing-24h baseline, as ONE
    custom stateful operator (``applyInPandasWithState``) — completing the
    streaming-parity story for the anomaly monitor (VERDICT r3 #8).

    Why not window-agg → window-function? Analytic window functions don't
    exist on unbounded streams, and chaining a second stateful op after a
    windowed aggregation is the restricted multi-stateful case — so the
    hourly bucketing AND the trailing z-score both live in per-key state:

    - state per event_type = (hourly bucket epochs, counts, horizon) —
      evicted to the trailing ``_ANOMALY_KEEP_HOURS`` buckets after each
      batch, so state is O(event_types × 26) forever, stream length
      notwithstanding. The horizon is the explicit watermark analogue:
      arriving events older than it are DROPPED (a real deployment would
      put ``withWatermark`` upstream to the same effect).
    - each batch re-emits (update semantics) the z-score of every retained
      hour whose full 24h baseline span lies inside the retained region —
      never a truncated-baseline z — using the batch query's exact
      definition: mean/sample-stddev over existing prior buckets in
      [h-24h, h-1h], ≥ 12 buckets, sd > 0, z rounded to 4 dp.

    Output: (event_type, hour_epoch, cnt, z); bounded single-batch replay
    equals :func:`operators.timewin.rate_anomaly_stats` exactly.
    """
    import math

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    keep_s = _ANOMALY_KEEP_HOURS * 3600
    never = -(2**62)

    def fn(key, pdf_iter, state):
        hours, counts, horizon = (
            state.get if state.exists else ([], [], never)
        )
        buckets = dict(zip(hours, counts))
        for pdf in pdf_iter:
            fresh = pdf[pdf["hour_epoch"] >= horizon]
            for h, c in fresh["hour_epoch"].value_counts().items():
                buckets[int(h)] = buckets.get(int(h), 0) + int(c)
        out = {"event_type": [], "hour_epoch": [], "cnt": [], "z": []}
        for h in sorted(buckets):
            if horizon != never and h - 86400 < horizon:
                continue  # baseline span partially evicted: never emit
            prior = [
                c for p, c in buckets.items() if h - 86400 <= p <= h - 3600
            ]
            if len(prior) < 12:
                continue
            mu = sum(prior) / len(prior)
            sd = math.sqrt(
                sum((x - mu) ** 2 for x in prior) / (len(prior) - 1)
            )
            if sd <= 0:
                continue
            out["event_type"].append(key[0])
            out["hour_epoch"].append(h)
            out["cnt"].append(buckets[h])
            out["z"].append(round((buckets[h] - mu) / sd, 4))
        if buckets:
            new_horizon = max(max(buckets) - keep_s, horizon)
            buckets = {h: c for h, c in buckets.items() if h >= new_horizon}
            horizon = new_horizon
        state.update(
            (list(buckets.keys()), list(buckets.values()), horizon)
        )
        yield pd.DataFrame(out)

    hourly_events = events.select(
        "event_type",
        F.unix_seconds(F.date_trunc("hour", "ts")).alias("hour_epoch"),
    )
    return hourly_events.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=(
            "event_type string, hour_epoch long, cnt long, z double"
        ),
        stateStructType=(
            "hours array<long>, counts array<long>, horizon long"
        ),
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


def ewma_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of ``events_ewma``: the per-type hourly-rate EWMA as
    one custom stateful operator.

    EWMA is the ideal streaming statistic — the entire history folds into
    ONE number — but hourly buckets must close before they can be folded
    (late events within the horizon may still bump a bucket's count). So
    state per event_type is (ewma of all CLOSED buckets, trailing open
    buckets, horizon): each batch merges fresh events into the retained
    buckets, re-emits the EWMA series over closed-seed + retained buckets
    (update semantics — a late bump re-emits corrected downstream values),
    then folds buckets falling behind the horizon into the closed seed, in
    hour order — exactly the batch fold's order, so bounded single-batch
    replay equals the batch query bit-for-bit before rounding. State is
    O(event_types x 26 buckets) forever; the fold constant alpha matches
    ``operators.timewin.EWMA_ALPHA``.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..operators.timewin import EWMA_ALPHA

    a = float(EWMA_ALPHA)
    keep_s = _ANOMALY_KEEP_HOURS * 3600
    never = -(2**62)

    def fn(key, pdf_iter, state):
        ewma_closed, have_closed, hours, counts, horizon = (
            state.get if state.exists else (0.0, False, [], [], never)
        )
        buckets = dict(zip(hours, counts))
        for pdf in pdf_iter:
            fresh = pdf[pdf["hour_epoch"] >= horizon]
            for h, c in fresh["hour_epoch"].value_counts().items():
                buckets[int(h)] = buckets.get(int(h), 0) + int(c)
        out = {"event_type": [], "hour_epoch": [], "cnt": [], "ewma": []}
        seed, seeded = ewma_closed, have_closed
        for h in sorted(buckets):
            x = float(buckets[h])
            seed = (a * x + (1 - a) * seed) if seeded else x
            seeded = True
            out["event_type"].append(key[0])
            out["hour_epoch"].append(h)
            out["cnt"].append(buckets[h])
            out["ewma"].append(round(seed, 4))
        if buckets:
            new_horizon = max(max(buckets) - keep_s, horizon)
            for h in sorted(buckets):
                if h < new_horizon:
                    x = float(buckets.pop(h))
                    ewma_closed = (
                        (a * x + (1 - a) * ewma_closed)
                        if have_closed
                        else x
                    )
                    have_closed = True
            horizon = new_horizon
        state.update(
            (
                ewma_closed,
                have_closed,
                list(buckets.keys()),
                list(buckets.values()),
                horizon,
            )
        )
        yield pd.DataFrame(out)

    hourly_events = events.select(
        "event_type",
        F.unix_seconds(F.date_trunc("hour", "ts")).alias("hour_epoch"),
    )
    return hourly_events.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=(
            "event_type string, hour_epoch long, cnt long, ewma double"
        ),
        stateStructType=(
            "ewma_closed double, have_closed boolean, "
            "hours array<long>, counts array<long>, horizon long"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
