"""Shared Spark session for the test suite.

local mode with a modest core count + small shuffle partitioning so the
suite stays fast; the engine itself is configured identically to production
(AQE on, Arrow on) via ``build_session``.
"""

from __future__ import annotations

import pytest

from great_expectations_spark.skew import build_session


@pytest.fixture(scope="session")
def spark():
    spark = build_session(
        app_name="ges-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={
            "spark.driver.memory": "4g",
            "spark.ui.enabled": "false",
            "spark.sql.session.timeZone": "UTC",
        },
    )
    yield spark
    spark.stop()
