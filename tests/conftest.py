"""Shared Spark fixture: one local session for the whole test run."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from tap_rest_api_msdk_spark.session import get_spark

    s = get_spark("engine-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()
