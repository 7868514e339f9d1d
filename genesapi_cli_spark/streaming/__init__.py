"""Event-time windowed operators (batch + Structured Streaming dual mount)."""

import genesapi_cli_spark.streaming.joins  # noqa: F401
import genesapi_cli_spark.streaming.windows  # noqa: F401
