"""Sort / limit / top-k operators (SURVEY.md §2.6).

Reference analog: deterministic output ordering of serialized documents and
top-N diagnostics in ``genesapi/cli.py (upstream)``.

Scale notes: a global ``orderBy`` is a range-partitioned sort (sampled
boundaries) — fine for small dimension outputs; ``orderBy().limit(k)``
compiles to TakeOrderedAndProject: per-partition top-k + driver merge of k
rows, which is the only safe global-top-k at 100 TB (no full sort, no full
shuffle). Verified in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from genesapi_cli_spark.io import load
from genesapi_cli_spark.registry import register

_SORT_ORACLE = """
SELECT n_name, n_nationkey,
       ROW_NUMBER() OVER (ORDER BY n_name DESC) AS rnk
FROM nation
"""


@register("q_sort_order", oracle=_SORT_ORACLE)
def q_sort_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort with the rank materialized as a column, so the
    order-insensitive hash still proves the ordering."""
    nation = load(spark, sf_dir, "nation")
    w = Window.orderBy(F.col("n_name").desc())
    return nation.select("n_name", "n_nationkey", F.row_number().over(w).alias("rnk"))


_TOPK_ORACLE = """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


@register("q_limit_topk", oracle=_TOPK_ORACLE)
def q_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most expensive orders, tie-broken by key →
    TakeOrderedAndProject (no global sort)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )
