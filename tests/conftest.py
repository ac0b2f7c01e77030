from __future__ import annotations

import os

import pytest

from df_to_azure_spark.session import get_spark

# Overridable so the suite runs on machines with a different data layout
# (mirrors bench.py's SPARK_GRAFT_SF_DIR convention).
SF_SMOKE = os.environ.get("SPARK_GRAFT_SF_SMOKE", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="df_to_azure_spark-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(autouse=True)
def _pin_hygiene():
    """Release dead localCheckpoint/persist blocks after EVERY test.

    The suite runs ~600 tests in one Spark session; pinned intermediates
    are garbage once a test's assertions ran, but the ContextCleaner
    frees them far too lazily, so dead storage blocks accumulate and tax
    every later test (the round-15 bench finding, same mechanism).  No
    fixture holds a pinned frame across tests; the one session-lifetime
    pin (the nn-descent graph memo) is protect_pin-registered and
    skipped."""
    yield
    from pyspark.sql import SparkSession

    from df_to_azure_spark.session import release_pins

    s = SparkSession.getActiveSession()
    if s is not None:
        try:
            release_pins(s)
        except Exception:
            pass


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return SF_ORACLE
