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


# --- q_set_bag_ops ----------------------------------------------------------

_BAG_ORACLE = """
WITH a AS (
  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
), r AS (
  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
), diff AS (
  SELECT l_partkey FROM a EXCEPT ALL SELECT l_partkey FROM r
), common AS (
  SELECT l_partkey FROM a INTERSECT ALL SELECT l_partkey FROM r
)
SELECT 'except_all' AS op,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT l_partkey) AS n_keys,
       CAST(SUM(l_partkey) AS BIGINT) AS key_sum
FROM diff
UNION ALL
SELECT 'intersect_all' AS op,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT l_partkey) AS n_keys,
       CAST(SUM(l_partkey) AS BIGINT) AS key_sum
FROM common
"""


@register("q_set_bag_ops", oracle=_BAG_ORACLE)
def q_set_bag_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations (EXCEPT ALL / INTERSECT ALL): duplicate
    MULTIPLICITY survives — `except_all` keeps max(nA−nB, 0) copies and
    `intersect_all` min(nA, nB), unlike the distinct variants
    (q_set_except/q_set_intersect) which collapse to membership. This is the
    semantics reconciliation diffs need: "how many occurrences are missing",
    not "which keys".

    Spark plans exceptAll/intersectAll as a tagged union + count aggregate +
    replicate — one shuffle on the value, no join; multiplicities make both
    engines' row counts exactly comparable.
    """
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select("l_partkey")
    r = li.filter(F.col("l_returnflag") == "R").select("l_partkey")

    def profile(df: DataFrame, op: str) -> DataFrame:
        return df.agg(
            F.lit(op).alias("op"),
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("l_partkey").alias("n_keys"),
            F.sum("l_partkey").cast("bigint").alias("key_sum"),
        ).select("op", "n_rows", "n_keys", "key_sum")

    return profile(a.exceptAll(r), "except_all").unionByName(
        profile(a.intersectAll(r), "intersect_all")
    )
