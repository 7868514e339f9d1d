"""Additional TPC-H-shaped reference queries (Q3, Q4, Q7, Q10, Q14, Q18
shapes, adapted to the testdata's column subset).

The registry already carries Q1 (q_agg_pricing_summary — the flagship), Q5
(q_join_multiway), and Q6 (q_filter_range); this module rounds out the
classic decision-support shapes so a user of the reference's analytical
surface finds the standard benchmark queries runnable as-is.

Scale notes: each query is a single declarative plan — dims broadcast,
facts shuffle once into the aggregate, TopK runs as TakeOrderedAndProject
(no global sort materialization). Revenue sums go through the exact
decimal cast (order-independent, see registry.dec_sum); output money/date
columns are raw copies or deterministic casts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from genesapi_cli_spark.io import load
from genesapi_cli_spark.registry import dec_sum, oracle_dec_sum, register

_REV = "l_extendedprice * (1 - l_discount)"

# --- Q3: shipping-priority candidates ---------------------------------------

_Q3_ORACLE = f"""
SELECT l_orderkey,
       {oracle_dec_sum(_REV, 'revenue')},
       CAST(o_orderdate AS DATE) AS o_date,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-06-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1997-06-15 00:00:00'
GROUP BY l_orderkey, o_date, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q_tpch_q3", oracle=_Q3_ORACLE)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 unshipped high-revenue orders for one market
    segment as of a cutoff date (o_shippriority is absent from the testdata;
    o_orderpriority stands in). Customer prunes orders via broadcast; both
    date predicates push to the scans; the TopK is TakeOrderedAndProject on
    the deterministic (revenue, orderkey) key."""
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-06-15 00:00:00").cast("timestamp_ntz")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-06-15 00:00:00").cast("timestamp_ntz")
    )
    return (
        cust.select("c_custkey")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("o_date"),
            "o_orderpriority",
        )
        .agg(dec_sum(F.expr(_REV), "revenue"))
        .select("l_orderkey", "revenue", "o_date", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# --- Q10: returned-item reporting -------------------------------------------

_Q10_ORACLE = f"""
SELECT c_custkey, c_name,
       {oracle_dec_sum(_REV, 'revenue')},
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q_tpch_q10", oracle=_Q10_ORACLE)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in one
    quarter. nation broadcasts onto the customer dim, the quarter predicate
    prunes orders at the scan, and the return-flag predicate prunes
    lineitem before the join."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dec_sum(F.expr(_REV), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --- Q14: promotion effect --------------------------------------------------

_Q14_ORACLE = f"""
SELECT CAST(100 AS DOUBLE)
         * (CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST({_REV} AS DECIMAL(27,7)) ELSE 0 END) AS DOUBLE))
         / (CAST(SUM(CAST({_REV} AS DECIMAL(27,7))) AS DOUBLE)) AS promo_revenue_pct,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
"""


@register("q_tpch_q14", oracle=_Q14_ORACLE)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: share of one month's revenue from PROMO-type parts. Part
    broadcasts; the month predicate reaches the lineitem scan; both the
    conditional and total revenue ride ONE aggregate as exact decimal sums,
    and the percentage is a single double division — deterministic without
    any rounding."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp_ntz"))
    )
    part = load(spark, sf_dir, "part")
    rev = F.expr(_REV).cast("decimal(27,7)")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        (
            F.lit(100).cast("double")
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).cast(
                "double"
            )
            / F.sum(rev).cast("double")
        ).alias("promo_revenue_pct"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    )


# --- Q18: large-volume customers --------------------------------------------

_Q18_QTY = 300

_Q18_ORACLE = f"""
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS o_date,
       o_totalprice,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS BIGINT)) > {_Q18_QTY}
)
GROUP BY c_name, c_custkey, o_orderkey, o_date, o_totalprice
"""


@register("q_tpch_q18", oracle=_Q18_ORACLE)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: whale orders (total quantity > 300) with their customers.
    The IN-subquery plans as a semi-join against the pre-aggregated
    order-quantity table; quantities are exact integer sums. At 100 TB the
    HAVING aggregate and the outer join share the l_orderkey partitioning,
    so AQE reuses the exchange instead of reshuffling."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("sq"))
        .filter(F.col("sq") > _Q18_QTY)
        .select(F.col("l_orderkey").alias("big_key"))
    )
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(big, F.col("o_orderkey") == F.col("big_key"), "left_semi")
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_date"),
            "o_totalprice",
        )
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"))
    )


# --- Q4: order-priority checking (EXISTS semi-join) --------------------------

_Q4_ORACLE = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
"""


@register("q_tpch_q4", oracle=_Q4_ORACLE)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of one quarter's orders having at
    least one line item shipped after the order date (the testdata carries
    no commit/receipt dates, so the standard late-delivery predicate adapts
    to l_shipdate > o_orderdate — same EXISTS decorrelation shape).

    Plan: the quarter predicate prunes orders at the scan; EXISTS becomes a
    LEFT SEMI hash join on orderkey (no fact duplication, no distinct); one
    5-group aggregate. At 100 TB the semi join is the whole cost — both
    sides shuffle on orderkey once, and the build side carries two columns.
    """
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("order_count")
    )


# --- Q7: volume shipping between two nations ---------------------------------

_Q7_ORACLE = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(YEAR(l.l_shipdate) AS INTEGER) AS l_year,
       {oracle_dec_sum(_REV.replace('l_', 'l.l_'), 'revenue')}
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY supp_nation, cust_nation, l_year
"""


@register("q_tpch_q7", oracle=_Q7_ORACLE)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by ship year —
    the classic "national account" join (supplier's nation on one side of
    every line item, customer's nation on the other).

    Plan: both nation dims broadcast; supplier and customer broadcast after
    their nation filters (each keeps ~1/25 of rows); the only repartition
    joins are lineitem⋈orders. The OR-of-two-pairs predicate evaluates
    post-join on the two broadcast nation names — Catalyst pushes the
    individual nation memberships into the dim scans.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pair = ("NATION_3", "NATION_7")
    n1 = load(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation")
    )
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("nk1")
    ).select("s_suppkey", "supp_nation")
    cust = load(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("nk2")
    ).select("c_custkey", "cust_nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# --- Q16: parts/supplier relationship --------------------------------------

_Q16_ORACLE = """
WITH bad_supp AS (
  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
)
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM bad_supp)
GROUP BY p_brand, p_type, p_size
"""


@register("q_tpch_q16", oracle=_Q16_ORACLE)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can furnish each
    surviving (brand, type, size) combination, excluding one brand, one type
    family, and blacklisted suppliers (the testdata carries no supplier
    comment, so "customer complaints" adapts to a negative account balance
    — same NOT IN anti-join decorrelation shape).

    Scale shape: part predicates (brand<>, NOT LIKE, size IN) all push to
    the part scan; the pruned part dim broadcasts into lineitem; the tiny
    blacklist decorrelates to a broadcast null-aware anti-join (never a
    shuffle); the distinct-supplier count is the only fact shuffle, keyed
    on (brand, type, size) with partial distinct map-side.
    """
    supp_bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & ~F.col("p_type").startswith("PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            F.broadcast(supp_bad.select("s_suppkey")),
            li.l_suppkey == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", F.col("p_size").cast("bigint").alias("p_size"))
        .agg(F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


# --- Q2: minimum-cost supplier per part -------------------------------------

_Q2_ORACLE = """
WITH offers AS (
  SELECT l_partkey, l_suppkey,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents
  FROM lineitem
)
SELECT p.p_partkey, p.p_brand, o.l_suppkey, s.s_name, o.price_cents
FROM part p
JOIN offers o ON o.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = o.l_suppkey
WHERE p.p_size <= 5 AND p.p_type LIKE 'SMALL%'
  AND o.price_cents = (
    SELECT MIN(o2.price_cents) FROM offers o2 WHERE o2.l_partkey = p.p_partkey
  )
"""


@register("q_tpch_q2", oracle=_Q2_ORACLE)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each part in a size/type slice, the supplier(s)
    offering it at the minimum observed price (the testdata has no partsupp
    cost table, so the offer book is lineitem's exact price cents). The
    oracle keeps Q2's textbook CORRELATED-MIN subquery; the Spark side is
    the decorrelated form every planner rewrites it to — a per-part MIN
    aggregate joined back on (partkey, price) — so the hash match proves
    the decorrelation equivalence including ties (two suppliers at the
    same minimum both survive, exactly as the subquery form keeps them).

    Scale shape: part predicates push to the scan and the pruned part dim
    broadcasts; the offer book aggregates map-side per partkey; the
    join-back is an equi join on (partkey, cents) — no per-row subquery
    execution anywhere.
    """
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 5) & F.col("p_type").startswith("SMALL")
    )
    offers = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.expr("CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)").alias(
            "price_cents"
        ),
    )
    supplier = load(spark, sf_dir, "supplier")
    best = offers.groupBy("l_partkey").agg(
        F.min("price_cents").alias("best_cents")
    )
    return (
        offers.join(
            best,
            (offers.l_partkey == best.l_partkey)
            & (offers.price_cents == best.best_cents),
        )
        .drop(best.l_partkey)
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier.s_suppkey)
        .select("p_partkey", "p_brand", "l_suppkey", "s_name", "price_cents")
    )


# --- Q19: disjunctive predicate revenue --------------------------------------

_Q19_ORACLE = f"""
SELECT {oracle_dec_sum(_REV, 'revenue')}, COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 20 AND l_quantity <= 30)
"""


@register("q_tpch_q19", oracle=_Q19_ORACLE)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue under three OR'd brand/size/
    quantity clause groups) — the benchmark's disjunctive-predicate stress:
    a naive planner evaluates the whole OR after the join; a good one
    derives the IMPLIED single-table predicates (brand ∈ {{...}} onto part,
    quantity ≤ 30 onto lineitem) and pushes them below the join so both
    scans prune before any row pairs up. Spark's
    ConstantFolding+PushDownPredicates derive exactly those; the pruned
    part side then broadcasts.

    Parity: the revenue is the registry's exact decimal sum; quantity
    bounds are whole numbers compared against the raw double column
    identically on both engines.
    """
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & (F.col("l_quantity") >= 1)
        & (F.col("l_quantity") <= 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & (F.col("l_quantity") >= 10)
        & (F.col("l_quantity") <= 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & (F.col("l_quantity") >= 20)
        & (F.col("l_quantity") <= 30)
    )
    return joined.filter(cond).agg(
        dec_sum(F.expr(_REV), "revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --- Q21: waiting-order suppliers (double correlation) -----------------------

_Q21_ORACLE = """
WITH l AS (
  SELECT l_orderkey, l_suppkey, l_shipdate FROM lineitem
)
SELECT s.s_suppkey, s.s_name,
       CAST(COUNT(*) AS BIGINT) AS numwait
FROM l l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE EXISTS (
    SELECT 1 FROM l l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM l l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > l1.l_shipdate
  )
GROUP BY s.s_suppkey, s.s_name
"""


@register("q_tpch_q21", oracle=_Q21_ORACLE)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — the benchmark's hardest decorrelation: line items
    whose supplier was the LAST to ship on a multi-supplier order (the
    "who kept the order waiting" blame query), counted per supplier. The
    oracle keeps the textbook EXISTS + NOT EXISTS double correlation; the
    Spark side computes both conditions from ONE window pass per order —
    max other-supplier shipdate and other-supplier presence — because both
    correlated subqueries range over the same (orderkey) partition:

        EXISTS(other supplier)            ≡ n_other_supp ≥ 1
        NOT EXISTS(other ships later)     ≡ max_other_ship ≤ own shipdate

    where max_other_ship excludes the row's own supplier via the standard
    two-extremes trick (global max + max over other suppliers derived from
    the top-2 distinct supplier maxima), here computed exactly with a
    per-(order, supplier) pre-aggregate joined back to the order's top two.

    Scale shape: one (order, supplier) hash agg collapses line items, one
    (order) window ranks supplier maxima (top-2 carried, not all), and the
    blame test is a projection — no correlated re-execution, no pair join
    across suppliers of an order.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    supplier = load(spark, sf_dir, "supplier")
    # per-(order, supplier) last ship + per-order supplier count via window
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("supp_max")
    )
    w_ord = Window.partitionBy("l_orderkey")
    w_rank = Window.partitionBy("l_orderkey").orderBy(
        F.col("supp_max").desc(), F.col("l_suppkey")
    )
    ranked = per_os.select(
        "l_orderkey",
        "l_suppkey",
        "supp_max",
        F.count(F.lit(1)).over(w_ord).alias("n_supp"),
        F.max("supp_max").over(w_ord).alias("max1"),
        F.row_number().over(w_rank).alias("rk"),
    )
    # max over OTHER suppliers: the global max unless this row holds it
    # uniquely (rk=1), in which case the second-ranked supplier's max.
    second = ranked.filter(F.col("rk") == 2).select(
        F.col("l_orderkey").alias("o2"), F.col("supp_max").alias("max2")
    )
    blamed_os = (
        ranked.filter(F.col("n_supp") >= 2)
        .join(second, F.col("l_orderkey") == F.col("o2"), "left")
        .select(
            "l_orderkey",
            "l_suppkey",
            "supp_max",
            F.when(F.col("rk") == 1, F.col("max2"))
            .otherwise(F.col("max1"))
            .alias("max_other"),
        )
        .filter(F.col("max_other") <= F.col("supp_max"))
    )
    # blame counts LINE ITEMS (the oracle counts l1 rows): join back the
    # per-(order, supplier) verdict to the line-item multiplicity, but only
    # rows at the supplier's own max shipdate qualify under NOT EXISTS when
    # earlier rows of the same supplier are outshipped by others.
    li_verdict = li.join(
        blamed_os.select("l_orderkey", "l_suppkey", "max_other"),
        ["l_orderkey", "l_suppkey"],
    ).filter(F.col("max_other") <= F.col("l_shipdate"))
    return (
        li_verdict.join(
            F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
    )
