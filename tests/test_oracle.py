"""The local correctness gate: every registered query vs the DuckDB oracle at
sf0.01 — the same scale factor, data, and comparison the driver uses."""

from __future__ import annotations

import pytest

import genesapi_cli_spark
from genesapi_cli_spark.oracle import check_query, duckdb_connect
from genesapi_cli_spark.registry import REGISTRY

from .conftest import ORACLE_SF_DIR

genesapi_cli_spark.load_all()


@pytest.fixture(scope="module")
def con():
    c = duckdb_connect(ORACLE_SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, con, name):
    res = check_query(spark, REGISTRY[name], ORACLE_SF_DIR, con)
    assert res.ok, str(res)
