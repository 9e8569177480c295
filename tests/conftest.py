from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.01"
SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from distributed_system_mapreduce_spark.session import get_spark

    s = get_spark("dsmr-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    from distributed_system_mapreduce_spark.testing import duck_connection

    con = duck_connection(SF_DIR)
    yield con
    con.close()


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    """Surface transformWithState environment degradation LOUDLY
    (VERDICT r14 #7): when google.protobuf is absent and unshimmable the
    tws tests skip at runtime — which must read as an environment
    regression in the summary, never blend into ordinary skips."""
    gated = [
        rep
        for rep in terminalreporter.stats.get("skipped", [])
        if "transformWithState runtime gated" in str(
            getattr(rep, "longrepr", "")
        )
    ]
    if gated:
        from distributed_system_mapreduce_spark.pbcompat import (
            _RESULT as pb_result,
        )

        terminalreporter.write_sep(
            "!",
            f"transformWithState DEGRADED: {len(gated)} streaming tests "
            f"skipped (protobuf shim: {pb_result})",
            yellow=True,
        )
