"""Relational + LLM-pipeline operators. Importing this package registers all
operator queries into :mod:`genesapi_cli_spark.registry`."""

import genesapi_cli_spark.operators.aggregates  # noqa: F401
import genesapi_cli_spark.operators.dedup  # noqa: F401
import genesapi_cli_spark.operators.experiments  # noqa: F401
import genesapi_cli_spark.operators.extended  # noqa: F401
import genesapi_cli_spark.operators.filters  # noqa: F401
import genesapi_cli_spark.operators.graph  # noqa: F401
import genesapi_cli_spark.operators.history  # noqa: F401
import genesapi_cli_spark.operators.joins  # noqa: F401
import genesapi_cli_spark.operators.multimodal  # noqa: F401
import genesapi_cli_spark.operators.scans  # noqa: F401
import genesapi_cli_spark.operators.pivot  # noqa: F401
import genesapi_cli_spark.operators.setops  # noqa: F401
import genesapi_cli_spark.operators.similarity  # noqa: F401
import genesapi_cli_spark.operators.text  # noqa: F401
import genesapi_cli_spark.operators.timeseries  # noqa: F401
import genesapi_cli_spark.operators.tpch  # noqa: F401
import genesapi_cli_spark.operators.sorts  # noqa: F401
import genesapi_cli_spark.operators.windows  # noqa: F401
