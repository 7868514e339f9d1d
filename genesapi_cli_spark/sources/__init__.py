"""Non-parquet sources and sinks (GENESIS cube text parser, NDJSON docs)."""

import genesapi_cli_spark.sources.cube  # noqa: F401
import genesapi_cli_spark.sources.delimited  # noqa: F401
import genesapi_cli_spark.sources.layout  # noqa: F401
import genesapi_cli_spark.sources.sinks  # noqa: F401
