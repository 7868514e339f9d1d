"""Registry-wide oracle declared-type lint.

The external driver's value hash is sensitive to DECLARED DuckDB result
types: an uncast SUM(BIGINT) declares HUGEINT and hash-fails against Spark's
bigint even though the fetched Python values are identical (round-2 failure
class: q_agg_gini / q_agg_lorenz / q_agg_weighted / q_agg_weighted_median).
This test executes EVERY registered oracle in DuckDB at sf0.001 and asserts
no output column declares HUGEINT / UHUGEINT / DECIMAL — so reverting any of
the CAST(... AS BIGINT) fixes turns the suite red. DuckDB-only: no Spark
session needed, runs in seconds.
"""

from __future__ import annotations

import pytest

import genesapi_cli_spark
from genesapi_cli_spark.oracle import _FORBIDDEN_DUCK, _duck_kind, duckdb_connect
from genesapi_cli_spark.registry import REGISTRY

from .conftest import SMOKE_SF_DIR

genesapi_cli_spark.load_all()


@pytest.fixture(scope="module")
def con():
    c = duckdb_connect(SMOKE_SF_DIR)
    yield c
    c.close()


def _oracle_queries():
    return sorted((n, q) for n, q in REGISTRY.items() if q.oracle is not None)


def test_every_oracle_declares_whitelisted_types(con):
    offenders = {}
    for name, q in _oracle_queries():
        rel = con.sql(q.oracle)
        bad = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if any(f in str(t).upper() for f in _FORBIDDEN_DUCK)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"oracles declaring forbidden DuckDB types (driver hash-fail class): {offenders}"
    )


def test_every_oracle_kind_is_mappable(con):
    """Every declared output type must map to a known cross-engine kind."""
    known = {"int", "float", "str", "bool", "date", "timestamp", "list", "bytes", "complex"}
    unmapped = {}
    for name, q in _oracle_queries():
        rel = con.sql(q.oracle)
        bad = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if _duck_kind(str(t)) not in known
        ]
        if bad:
            unmapped[name] = bad
    assert not unmapped, f"oracle output types with no kind mapping: {unmapped}"


def test_forbidden_type_detector_fires():
    """Sanity: an uncast SUM(BIGINT) must be flagged, proving the lint bites."""
    import duckdb

    rel = duckdb.sql("SELECT SUM(CAST(1 AS BIGINT)) AS s")
    assert any(f in str(rel.types[0]).upper() for f in _FORBIDDEN_DUCK)
