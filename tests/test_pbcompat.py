"""pbcompat + tws runtime availability (VERDICT r10 #7).

The "Done" criterion for the r10 advice was ``tws_runtime_available()[0]
is True`` in CI — through r10 the broken-protobuf container forced the
gated path; the pbcompat shim (vendored pure-Python protobuf runtime,
linked read-only from the local Google Cloud SDK) now makes the state
protocol importable, and tests/test_streaming.py runs the
transformWithState batch-equality for real. This module pins the shim
itself so a regression reverts to an actionable gate, not a silent skip.
"""

from __future__ import annotations

from distributed_system_mapreduce_spark.pbcompat import ensure_protobuf


def test_ensure_protobuf_makes_runtime_importable():
    ok, detail = ensure_protobuf()
    assert ok, detail
    from google.protobuf import descriptor  # noqa: F401


def test_ensure_protobuf_is_idempotent_and_memoized():
    assert ensure_protobuf() == ensure_protobuf()


def test_tws_runtime_available_here(spark):
    """The full probe — protobuf runtime AND the generated state-protocol
    messages (which run gencode/runtime version validation) — must pass
    on this container now that the shim links the vendored runtime."""
    from distributed_system_mapreduce_spark.streaming import (
        tws_runtime_available,
    )

    ok, reason = tws_runtime_available()
    assert ok, reason
