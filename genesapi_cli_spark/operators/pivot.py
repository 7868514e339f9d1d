"""Long→wide pivot (SURVEY.md §2.10, `q_genesis_pivot`).

Reference analog: the nesting step of ``genesapi/serialize.py (upstream)`` —
facts are long/EAV rows (one per measure); documents are wide per-key objects.
Pivot with an explicit value list is the distributed form: one hash aggregate,
no second pass to discover the pivot domain (an implicit pivot would trigger a
distinct scan first — never do that at 100 TB; the measure catalog is known).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from genesapi_cli_spark.io import load
from genesapi_cli_spark.registry import DEC, register

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

_PIVOT_ORACLE = """
SELECT user_id,
       CAST(SUM(CAST(value AS DECIMAL(27,7))) FILTER (WHERE event_type = 'click') AS DOUBLE) AS click,
       CAST(SUM(CAST(value AS DECIMAL(27,7))) FILTER (WHERE event_type = 'error') AS DOUBLE) AS error,
       CAST(SUM(CAST(value AS DECIMAL(27,7))) FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase,
       CAST(SUM(CAST(value AS DECIMAL(27,7))) FILTER (WHERE event_type = 'signup') AS DOUBLE) AS signup,
       CAST(SUM(CAST(value AS DECIMAL(27,7))) FILTER (WHERE event_type = 'view') AS DOUBLE) AS view
FROM events
GROUP BY user_id
"""


@register("q_genesis_pivot", oracle=_PIVOT_ORACLE)
def q_genesis_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user wide layout: event_type pivoted to summed value columns with
    an explicit pivot domain (the reference's measure list). Users missing a
    type get NULL — same as the oracle's FILTER form."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.sum(F.col("value").cast(DEC)).cast("double"))
    )
