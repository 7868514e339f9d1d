"""genesapi_cli_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ``datenguide/genesapi-cli``, rebuilt Spark-first.

The reference (see /root/repo/SURVEY.md; the /root/reference mount was empty,
so all reference citations are reconstructed upstream-module paths, e.g.
``genesapi/serialize.py (upstream)``) is a single-process batch ETL pipeline
over GENESIS statistical cubes.  This engine re-expresses every capability as
declarative Spark DataFrame / SQL plans so that Catalyst + Tungsten (and AQE at
cluster scale) choose the physical strategy:

- ``session``    — SparkSession config required for the testdata lake
- ``io``         — typed loaders for the parquet tables (incl. the ns-timestamp fix)
- ``registry``   — the query contract: name -> (spark callable, DuckDB oracle SQL)
- ``operators``  — scans, filters, joins, aggregates, windows, sorts, set ops,
                   text/dedup/similarity (LLM-pipeline ops), pivot
- ``functions``  — scalar function surface + Python/pandas UDFs + UDTF
- ``sources``    — GENESIS cube text parser, NDJSON document sink
- ``streaming``  — event-time windows (batch+stream dual mount), incremental sync
- ``plans``      — explain/plan-inspection helpers used by tests and bench
"""

from genesapi_cli_spark.registry import REGISTRY, register  # noqa: F401

__version__ = "0.1.0"


def load_all() -> None:
    """Import every query-defining module so REGISTRY is fully populated."""
    import genesapi_cli_spark.operators  # noqa: F401
    import genesapi_cli_spark.functions  # noqa: F401
    import genesapi_cli_spark.sources  # noqa: F401
    import genesapi_cli_spark.streaming  # noqa: F401
