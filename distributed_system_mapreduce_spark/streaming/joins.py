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


#: output schema of the streaming as-of attributor
_ASOF_OUT = (
    "purchase_id long, user_id long, purchase_ts long, "
    "last_click_ts long, gap_us long"
)
_ASOF_STATE = "click_ts long, click_id long"


def asof_attribution_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of ``join_asof``: attribute each purchase to the
    user's latest strictly-earlier click, as events arrive.

    ``events`` needs (event_id, user_id, ts_epoch, event_type) with
    time-ordered micro-batches (the replay harness splits by time, the
    shape a log-shipped changelog has). ``applyInPandasWithState`` keyed
    by user holds ONE (ts, id) pair — the latest click seen — and each
    batch folds its rows in (ts, side, event_id) order: purchases sort
    before clicks at equal ts, so the strict '<' as-of semantics of the
    batch window are preserved exactly. Emits one attribution row per
    purchase; state is O(users) x 16 bytes, the same bound as the batch
    running-max carries per partition.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdf_iter, state):
        if state.exists:
            c_ts, c_id = state.get
        else:
            c_ts, c_id = (None, None)
        out = []
        rows = []
        for pdf in pdf_iter:
            rows.extend(
                zip(
                    pdf["ts_epoch"].tolist(),
                    pdf["event_type"].tolist(),
                    pdf["event_id"].tolist(),
                )
            )
        # purchases (side 0) before clicks (side 1) at equal ts — the
        # batch window's exact tie order
        rows.sort(key=lambda r: (r[0], 0 if r[1] == "purchase" else 1, r[2]))
        for ts, etype, eid in rows:
            if etype == "purchase":
                out.append(
                    (
                        eid,
                        key[0],
                        ts,
                        c_ts,
                        None if c_ts is None else ts - c_ts,
                    )
                )
            elif etype == "click":
                if c_ts is None or (ts, eid) > (c_ts, c_id):
                    c_ts, c_id = ts, eid
        if c_ts is not None:
            state.update((c_ts, c_id))
        yield pd.DataFrame(
            out,
            columns=[
                "purchase_id", "user_id", "purchase_ts",
                "last_click_ts", "gap_us",
            ],
        )

    return events.filter(
        F.col("event_type").isin("click", "purchase")
    ).groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=_ASOF_OUT,
        stateStructType=_ASOF_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
