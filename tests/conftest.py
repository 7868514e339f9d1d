"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from genesapi_cli_spark.session import build_session  # noqa: E402

#: sf dir used by the local oracle gate — the driver checks at sf0.01, so we do.
ORACLE_SF_DIR = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
SMOKE_SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="genesapi-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
