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
       CAST(SUM(CAST(value AS DECIMAL(18,7))) FILTER (WHERE event_type = 'click') AS DOUBLE) AS click,
       CAST(SUM(CAST(value AS DECIMAL(18,7))) FILTER (WHERE event_type = 'error') AS DOUBLE) AS error,
       CAST(SUM(CAST(value AS DECIMAL(18,7))) FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase,
       CAST(SUM(CAST(value AS DECIMAL(18,7))) FILTER (WHERE event_type = 'signup') AS DOUBLE) AS signup,
       CAST(SUM(CAST(value AS DECIMAL(18,7))) FILTER (WHERE event_type = 'view') AS DOUBLE) AS view
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


# --- q_pivot_multi -----------------------------------------------------------

_PIVOT_MULTI_ORACLE = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN l_returnflag = 'A'
                THEN CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                ELSE 0 END) AS BIGINT) AS A_cents,
       CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS A_n,
       CAST(SUM(CASE WHEN l_returnflag = 'N'
                THEN CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                ELSE 0 END) AS BIGINT) AS N_cents,
       CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS N_n,
       CAST(SUM(CASE WHEN l_returnflag = 'R'
                THEN CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                ELSE 0 END) AS BIGINT) AS R_cents,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS R_n
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("q_pivot_multi", oracle=_PIVOT_MULTI_ORACLE)
def q_pivot_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-measure pivot: order priority × return flag with BOTH an exact
    cents sum and a row count per cell — the two-measure crosstab
    `pivot().agg(sum, count)` plans as ONE Expand + hash aggregate (each
    input row expands per measure, never per pivot value), not 6 scans.

    The pivot values are pinned explicitly (['A','N','R']) so the plan
    never runs the implicit distinct-values job — at 100 TB an unpinned
    pivot is two jobs, the first a full distinct scan. Exact integer cents
    keep the wide row hashable without float order effects."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_returnflag",
        F.expr("CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    wide = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(
            F.sum("cents").cast("bigint").alias("cents"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    return wide.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(f"{v}_{m}"), F.lit(0).cast("bigint")).alias(f"{v}_{m}")
            for v in ("A", "N", "R")
            for m in ("cents", "n")
        ],
    ).orderBy("o_orderpriority")
