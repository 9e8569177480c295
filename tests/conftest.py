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
