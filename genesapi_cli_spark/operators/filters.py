"""Filter / projection operators (SURVEY.md §2.2).

Reference analog: value cleaning and quality-flag filtering in
``genesapi/serialize.py (upstream)`` (confidential tokens ``...``/``-`` → null)
and cube-name pattern selection in ``genesapi/cli.py (upstream)``. All are
row-level predicates/projections — whole-stage-codegen'd, pushed to the scan
where the data source supports it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from genesapi_cli_spark.io import load
from genesapi_cli_spark.registry import dec_sum, oracle_dec_sum, register

# --- q_filter_range (TPC-H Q6 shape) ---------------------------------------

_RANGE_ORACLE = f"""
SELECT {oracle_dec_sum('l_extendedprice * l_discount', 'revenue')},
       COUNT(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.08
  AND l_quantity < 25
"""


@register("q_filter_range", oracle=_RANGE_ORACLE)
def q_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: date-range + BETWEEN + `<` predicates, all pushed to the
    Parquet scan; the result is one aggregated row."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & F.col("l_discount").between(0.02, 0.08)
        & (F.col("l_quantity") < 25)
    ).agg(
        dec_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count(F.lit(1)).alias("n"),
    )


# --- q_project_derived ------------------------------------------------------

_DERIVED_ORACLE = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS gross
FROM lineitem
WHERE l_linenumber <= 2
"""


@register("q_project_derived", oracle=_DERIVED_ORACLE)
def q_project_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived measure columns per row (the reference's measure computation):
    pure projection — narrow, pipelined, no shuffle."""
    li = load(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.filter(F.col("l_linenumber") <= 2).select(
        "l_orderkey",
        "l_linenumber",
        net.alias("net"),
        (net * (1 + F.col("l_tax"))).alias("gross"),
    )


# --- q_filter_in_null -------------------------------------------------------

_IN_NULL_ORACLE = """
SELECT o_orderkey,
       o_orderstatus,
       COALESCE(NULLIF(o_orderpriority, '3-MEDIUM'), 'UNSPECIFIED') AS prio_adj,
       CASE WHEN o_totalprice IS NULL THEN -1.0 ELSE o_totalprice END AS price_clean
FROM orders
WHERE o_orderstatus IN ('F', 'P')
"""


@register("q_filter_in_null", oracle=_IN_NULL_ORACLE)
def q_filter_in_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + NULL-safe scalar handling — the Spark-native form of the
    reference's confidential-token cleaning (`...`/`-` → NULL → default)."""
    orders = load(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderstatus").isin("F", "P")).select(
        "o_orderkey",
        "o_orderstatus",
        F.coalesce(F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")), F.lit("UNSPECIFIED")).alias(
            "prio_adj"
        ),
        F.when(F.col("o_totalprice").isNull(), F.lit(-1.0))
        .otherwise(F.col("o_totalprice"))
        .alias("price_clean"),
    )


# --- q_filter_like ----------------------------------------------------------

_LIKE_ORACLE = """
SELECT p_brand,
       COUNT(*) AS n_like,
       COUNT(*) FILTER (WHERE regexp_matches(p_name, '(gold|steel)')) AS n_regex
FROM part
WHERE p_name LIKE '%a%' AND p_type NOT LIKE 'PROMO%'
GROUP BY p_brand
"""


@register("q_filter_like", oracle=_LIKE_ORACLE)
def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / NOT LIKE / regexp predicates (cube-name pattern selection in the
    reference CLI). rlike is unanchored in both engines."""
    part = load(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_name").like("%a%") & ~F.col("p_type").like("PROMO%"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_like"),
            F.count(F.when(F.col("p_name").rlike("(gold|steel)"), 1)).alias("n_regex"),
        )
    )
