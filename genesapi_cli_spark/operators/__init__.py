"""Relational + LLM-pipeline operators. Importing this package registers all
operator queries into :mod:`genesapi_cli_spark.registry`."""

import genesapi_cli_spark.operators.aggregates  # noqa: F401
