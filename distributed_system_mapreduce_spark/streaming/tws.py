"""transformWithState stateful processors (Spark 4's arbitrary-state API),
environment-gated.

``transformWithStateInPandas`` supersedes ``applyInPandasWithState`` as the
arbitrary-stateful-operator API: typed state handles (value/list/map state)
instead of one pickled GroupState blob, per-key event/processing-time
timers, composable state TTL, and an initial-state bootstrap — the API the
existing minhash/EWMA/CDC processors (streaming/dedup.py,
streaming/windows.py) would target on Spark 4-native clusters.

This container ships a broken ``google.protobuf`` (the runner's state
protocol needs it: the driver-side worker dies with ``ImportError: cannot
import name 'descriptor'`` before the first batch, and pip installs are
unavailable), so — exactly like the Delta/Iceberg connectors
(sources/table_formats.py) — the processor and plan builder are real and
importable everywhere, the PROBE tells callers whether the runtime can
execute them, and the test suite runs the batch-equality check when it can
and records the gate when it can't (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

try:  # the module contract is "importable everywhere, gate at RUNTIME":
    # streaming/__init__ re-exports this module, so a Spark without the
    # transformWithState API must not take the whole streaming package
    # down with it (ADVICE r9). The probe folds the miss into
    # tws_runtime_available().
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    _TWS_IMPORT_ERROR: Exception | None = None
except Exception as _exc:  # pragma: no cover - Spark-version-specific
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = object  # type: ignore[assignment,misc]
    _TWS_IMPORT_ERROR = _exc
from pyspark.sql.types import DoubleType, LongType, StructField, StructType


class TwsUnavailable(RuntimeError):
    """transformWithState cannot execute on this cluster."""


def tws_runtime_available() -> tuple[bool, str]:
    """Whether the transformWithState Python runner can start here.

    The runner imports protobuf-generated message classes on startup; a
    missing/broken ``google.protobuf`` kills the driver-side worker with a
    non-actionable stream crash, so probe the import up front and report
    the actual remedy. A Spark without the stateful_processor module at
    all (gated at import above) reports through the same channel.
    """
    if _TWS_IMPORT_ERROR is not None:
        return False, (
            "this Spark has no pyspark.sql.streaming.stateful_processor "
            f"(transformWithState needs Spark 4: {_TWS_IMPORT_ERROR})"
        )
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True, "ok"
    except Exception as exc:  # pragma: no cover - env-specific
        return False, (
            "transformWithState needs a working google.protobuf for its "
            f"state-protocol runner (import failed: {exc}); install the "
            "'protobuf' package on driver and executors"
        )


#: output schema of :class:`UserTotalsProcessor`
USER_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("s", DoubleType())]
)


class UserTotalsProcessor(StatefulProcessor):
    """Running per-user (event count, value sum) — the
    transformWithState twin of ``running_user_totals_stream``
    (streaming/windows.py), on typed ValueState instead of a pickled
    GroupState blob.

    State per key is two scalars; every batch folds its rows into the
    handle and emits the updated totals (update semantics). Totals round
    to 2 dp on emission so bounded replay equals the batch rollup
    hash-for-hash.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
        import pandas as pd

        n, s = 0, 0.0
        if self._state.exists():
            prev = self._state.get()
            n, s = int(prev[0]), float(prev[1])
        for pdf in rows:
            n += len(pdf)
            s += float(pdf["value"].sum())
        self._state.update((n, s))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(s, 2)],
            }
        )

    def close(self) -> None:
        pass


def user_totals_tws(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals via ``transformWithStateInPandas``.

    Plan construction always works (the gate is a RUNTIME property of the
    Python runner); call :func:`tws_runtime_available` before starting the
    query, or let the stream raise and map the crash back through
    :class:`TwsUnavailable`.
    """
    return events.select("user_id", "value").groupBy(
        "user_id"
    ).transformWithStateInPandas(
        statefulProcessor=UserTotalsProcessor(),
        outputStructType=USER_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
