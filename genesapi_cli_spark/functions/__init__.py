"""Scalar function surface + UDF/UDTF queries. Importing registers queries."""

import genesapi_cli_spark.functions.scalar  # noqa: F401
import genesapi_cli_spark.functions.udfs  # noqa: F401
