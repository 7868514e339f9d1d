"""Set operators (SURVEY.md §2.7).

Reference analog: merging facts across cube versions in
``genesapi/storage.py (upstream)`` (union) and presence/absence reconciliation
during catalog builds. INTERSECT/EXCEPT compile to aggregate + join plans in
Spark; the inputs here are pre-distinct key sets, so the shuffled volume is
bounded by key cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from genesapi_cli_spark.io import load
from genesapi_cli_spark.registry import register

_UNION_ORACLE = """
SELECT src, COUNT(*) AS n_rows, COUNT(DISTINCT nationkey) AS n_distinct
FROM (
  SELECT 'customer' AS src, c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT 'supplier' AS src, s_nationkey AS nationkey FROM supplier
)
GROUP BY src
"""


@register("q_set_union", oracle=_UNION_ORACLE)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL with source tags + per-source distinct cardinality."""
    customer = load(spark, sf_dir, "customer").select(
        F.lit("customer").alias("src"), F.col("c_nationkey").alias("nationkey")
    )
    supplier = load(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("src"), F.col("s_nationkey").alias("nationkey")
    )
    return (
        customer.unionByName(supplier)
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("nationkey").alias("n_distinct"),
        )
    )


_INTERSECT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
"""


@register("q_set_intersect", oracle=_INTERSECT_ORACLE)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations having both customers and suppliers (INTERSECT = distinct
    semi-join)."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


_EXCEPT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
"""


@register("q_set_except", oracle=_EXCEPT_ORACLE)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations with customers but no high-balance suppliers (EXCEPT =
    distinct anti-join)."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.subtract(s)  # EXCEPT (distinct) — matches the oracle's EXCEPT
