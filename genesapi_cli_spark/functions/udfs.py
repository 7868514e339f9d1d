"""Python UDF / pandas UDF / UDTF surface (SURVEY.md §2.8).

Reference analog: region-key normalization (AGS zero-padding) in
``genesapi/util.py (upstream)``; the pandas path follows the Arrow-batched
patterns in SNIPPETS.md.

Scale notes: plain Python UDFs are the slow path (row-at-a-time pickling) and
exist here only to prove semantic equivalence with the SQL form (`lpad`);
anything hot uses pandas_udf (Arrow columnar batches, ~10-100× faster) or pure
built-ins. The UDTF demonstrates PySpark 4's table-function surface for
fan-out parses; at scale the same job is done by from_json + explode
(JVM-side), which is what the NDJSON sink path uses.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf
from pyspark.sql.types import StringType

from genesapi_cli_spark.io import load, spread
from genesapi_cli_spark.registry import register

# --- q_udf_python -----------------------------------------------------------

_UDF_ORACLE = """
SELECT c_custkey, lpad(CAST(c_nationkey AS VARCHAR), 5, '0') AS region_code
FROM customer
"""


@register("q_udf_python", oracle=_UDF_ORACLE)
def q_udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AGS-style zero-padded region code via a plain Python UDF, proven
    equivalent to SQL lpad by the oracle (util.py upstream normalizes region
    keys the same way)."""

    @udf(returnType=StringType())
    def ags_pad(nationkey: int) -> str:
        return str(nationkey).zfill(5)

    customer = load(spark, sf_dir, "customer")
    return customer.select("c_custkey", ags_pad(F.col("c_nationkey")).alias("region_code"))


# --- q_udf_pandas -----------------------------------------------------------

_ZSCORE_ORACLE = """
WITH m AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,7))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(value * value AS DECIMAL(18,7))) AS DOUBLE) AS sxx
  FROM events
  GROUP BY event_type
)
SELECT event_id,
       e.event_type,
       (value - sx / n) / SQRT((sxx - sx * sx / n) / (n - 1)) AS z
FROM events e JOIN m ON e.event_type = m.event_type
"""


@register("q_udf_pandas", oracle=_ZSCORE_ORACLE)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized z-score via scalar pandas_udf (Arrow batches).

    The group mean/std come from exact decimal moments (JVM aggregate,
    order-independent — joined back broadcast); the pandas UDF does only the
    per-row arithmetic, which is elementwise IEEE double math and therefore
    bit-identical to the oracle's SQL expression.
    """
    ev = load(spark, sf_dir, "events")
    dec = "decimal(18,7)"
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(dec)).cast("double").alias("sx"),
        F.sum((F.col("value") * F.col("value")).cast(dec)).cast("double").alias("sxx"),
    )

    @pandas_udf("double")
    def zscore(v: pd.Series, n: pd.Series, sx: pd.Series, sxx: pd.Series) -> pd.Series:
        mean = sx / n
        std = ((sxx - sx * sx / n) / (n - 1)) ** 0.5
        return (v - mean) / std

    return (
        ev.join(F.broadcast(m), "event_type")
        .select(
            "event_id",
            "event_type",
            zscore(F.col("value"), F.col("n"), F.col("sx"), F.col("sxx")).alias("z"),
        )
    )


# --- q_udtf -----------------------------------------------------------------


_UDTF_ORACLE = """
SELECT event_id,
       'k' AS key,
       CAST(json_extract_string(props, '$.k') AS INT) AS value
FROM events
WHERE props IS NOT NULL AND json_extract_string(props, '$.k') IS NOT NULL
"""


@register("q_udtf", oracle=_UDTF_ORACLE)
def q_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PySpark 4 UDTF: explode each event's props JSON into (key, value) rows
    via a LATERAL table function (the JVM-side equivalent for hot paths is
    from_json + explode). The Python UDTF handles arbitrary key sets; the
    oracle exploits the generator's verified single-key `{"k": N}` shape
    (DuckDB 1.0 core lacks json_each) — value-checked on this corpus,
    general by construction on any other."""

    @udtf(returnType="key string, value int")
    class ParseProps:
        def eval(self, props: str):
            if props is None:
                return
            for k, v in json.loads(props).items():
                yield k, int(v)

    spark.udtf.register("parse_props", ParseProps)
    # spread: the Python UDTF runs one worker per partition — a single-row-
    # group local file would serialize the whole corpus through ONE worker.
    spread(load(spark, sf_dir, "events")).select("event_id", "props").createOrReplaceTempView(
        "events_props"
    )
    return spark.sql(
        """
        SELECT e.event_id, p.key, p.value
        FROM events_props e, LATERAL parse_props(e.props) p
        """
    )
