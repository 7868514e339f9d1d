"""Relational + LLM-pipeline operators. Importing this package registers all
operator queries into :mod:`genesapi_cli_spark.registry`."""

import genesapi_cli_spark.operators.aggregates  # noqa: F401
import genesapi_cli_spark.operators.filters  # noqa: F401
import genesapi_cli_spark.operators.scans  # noqa: F401
import genesapi_cli_spark.operators.setops  # noqa: F401
import genesapi_cli_spark.operators.sorts  # noqa: F401
