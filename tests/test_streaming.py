"""Structured Streaming twins produce the same answers as the batch windows
on bounded input (availableNow replay of the sf0.001 events parquet)."""

from __future__ import annotations

from distributed_system_mapreduce_spark.registry import QUERIES
from distributed_system_mapreduce_spark.streaming import (
    read_events_stream,
    run_available_now,
    session_counts_stream,
    tumbling_counts_stream,
)

from conftest import SF_SMOKE


def test_streaming_tumbling_matches_batch(spark):
    stream = tumbling_counts_stream(read_events_stream(spark, SF_SMOKE))
    got = run_available_now(stream, "t_tumbling")
    stream_rows = {
        (r["hour_start"].strftime("%Y-%m-%d %H:%M:%S"), r["event_type"]): (
            r["cnt"],
            r["sum_value"],
        )
        for r in got.collect()
    }
    batch_rows = {
        (r["hour_start"], r["event_type"]): (r["cnt"], r["sum_value"])
        for r in QUERIES["window_tumbling"](spark, SF_SMOKE).collect()
    }
    assert stream_rows == batch_rows


def test_streaming_session_window_runs(spark):
    stream = session_counts_stream(read_events_stream(spark, SF_SMOKE))
    got = run_available_now(stream, "t_session")
    rows = got.collect()
    assert len(rows) > 0
    # session invariants: start <= end, positive event counts
    for r in rows:
        assert r["sess_start"] <= r["sess_end"]
        assert r["n_events"] >= 1
    # total events across sessions == total events in the table
    total = sum(r["n_events"] for r in rows)
    from distributed_system_mapreduce_spark.sources.io import load

    assert total == load(spark, SF_SMOKE, "events").count()
