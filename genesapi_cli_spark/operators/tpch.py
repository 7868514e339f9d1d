"""Additional TPC-H-shaped reference queries (Q3, Q4, Q7, Q10, Q14, Q18
shapes, adapted to the testdata's column subset).

The registry already carries Q1 (q_agg_pricing_summary — the flagship); Q5
and Q6 existed as shape-analogs (q_join_multiway, q_filter_range) and since
round 10 also under their canonical names (q_tpch_q5 with the
local-commerce c_nationkey = s_nationkey condition, q_tpch_q6 as the pure
scan-filter-aggregate), so this module now covers Q2–Q22 by name and a
user of the reference's analytical surface finds the standard benchmark
queries runnable as-is.

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
from genesapi_cli_spark.registry import DEC, dec_sum, oracle_dec_sum, register

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
                     THEN CAST({_REV} AS DECIMAL(18,7)) ELSE 0 END) AS DOUBLE))
         / (CAST(SUM(CAST({_REV} AS DECIMAL(18,7))) AS DOUBLE)) AS promo_revenue_pct,
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
    rev = F.expr(_REV).cast("decimal(18,7)")
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
    two-extremes trick (global max, with the rank-1 holder falling back to
    the max over the remaining suppliers — a second window over the SAME
    (orderkey) partition, not a self-join).

    Scale shape: ONE line-item pass. The per-(order, supplier) aggregate
    carries the supplier's shipdate multiset (bounded: TPC-H orders hold
    ~4-7 line items ACROSS all suppliers, so the array is a handful of
    dates), which turns the blame count into an array filter instead of a
    second fact scan + (orderkey, suppkey) join-back, and the two-extremes
    trick into window functions instead of a rank-2 self-join — the plan
    drops from three line-item scans (per_os twice via the self-join + the
    join-back) to one, with one Exchange per aggregation level and zero
    joins on fact-sized relations.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    supplier = load(spark, sf_dir, "supplier")
    # per-(order, supplier): last ship + the group's shipdate multiset
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("supp_max"),
        F.sort_array(F.collect_list("l_shipdate")).alias("ships"),
    )
    w_ord = Window.partitionBy("l_orderkey")
    w_rank = Window.partitionBy("l_orderkey").orderBy(
        F.col("supp_max").desc(), F.col("l_suppkey")
    )
    ranked = per_os.select(
        "l_orderkey",
        "l_suppkey",
        "supp_max",
        "ships",
        F.count(F.lit(1)).over(w_ord).alias("n_supp"),
        F.max("supp_max").over(w_ord).alias("max1"),
        F.row_number().over(w_rank).alias("rk"),
    )
    # max over OTHER suppliers: the global max unless this row holds it
    # uniquely (rk=1), in which case the max over the rows ranked below it
    # (ties at the top make rk=2 carry the same supp_max, so this stays
    # exact) — one more window function on the same partition, no join.
    ranked = ranked.withColumn(
        "max2",
        F.max(F.when(F.col("rk") >= 2, F.col("supp_max"))).over(w_ord),
    )
    blamed_os = (
        ranked.filter(F.col("n_supp") >= 2)
        .select(
            "l_suppkey",
            "ships",
            "supp_max",
            F.when(F.col("rk") == 1, F.col("max2"))
            .otherwise(F.col("max1"))
            .alias("max_other"),
        )
        .filter(F.col("max_other") <= F.col("supp_max"))
    )
    # blame counts LINE ITEMS (the oracle counts l1 rows): the qualifying
    # rows are exactly the group's shipdates at or after max_other — an
    # array filter over the multiset carried through the aggregate.
    counted = blamed_os.select(
        "l_suppkey",
        F.expr("size(filter(ships, d -> d >= max_other))").alias("n_blamed"),
    )
    return (
        counted.join(
            F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_suppkey", "s_name")
        .agg(F.sum("n_blamed").cast("bigint").alias("numwait"))
    )


# --- Q8: national market share ----------------------------------------------

_Q8_ORACLE = f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                     THEN CAST({_REV} AS DECIMAL(18,7))
                     ELSE CAST(0 AS DECIMAL(18,7)) END) AS DOUBLE)
         / CAST(SUM(CAST({_REV} AS DECIMAL(18,7))) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN part     ON p_partkey  = l_partkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey  = o_custkey
JOIN (SELECT s_suppkey, n_name AS supp_nation
      FROM supplier JOIN nation ON s_nationkey = n_nationkey) s
     ON s.s_suppkey = l_suppkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
JOIN region    ON r_regionkey = cn.n_regionkey
WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
GROUP BY o_year
ORDER BY o_year
"""


@register("q_tpch_q8", oracle=_Q8_ORACLE)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's share of PROMO-part revenue sold into
    EUROPE-region customers, per order year. Classic market-share CASE
    ratio: both the conditional numerator and the denominator are exact
    decimal sums folded into ONE hash aggregate over the joined fact, then
    a single double division — no second pass, no join of two aggregates.

    Scale shape: part/supplier/customer-nation/region dims all broadcast;
    the fact shuffles once on o_year (7 groups → map-side combine does
    nearly all the work). The p_type predicate prunes the part build side
    before broadcast."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp_nat = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust_eur = (
        cust.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    rev = F.expr(_REV).cast(DEC)
    return (
        li.join(F.broadcast(part.select("p_partkey")), F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust_eur), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(supp_nat), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(
                        F.lit(0).cast(DEC)
                    )
                ).cast("double")
                / F.sum(rev).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --- Q9: product-type profit ------------------------------------------------

_PROFIT = (
    "l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity"
)

_Q9_ORACLE = f"""
SELECT supp_nation, CAST(year(o_orderdate) AS INT) AS o_year,
       {oracle_dec_sum(_PROFIT, 'sum_profit')}
FROM lineitem
JOIN part   ON p_partkey  = l_partkey
JOIN orders ON o_orderkey = l_orderkey
JOIN (SELECT s_suppkey, n_name AS supp_nation
      FROM supplier JOIN nation ON s_nationkey = n_nationkey) s
     ON s.s_suppkey = l_suppkey
WHERE p_name LIKE '%green%' OR p_name LIKE '%red%'
GROUP BY supp_nation, o_year
ORDER BY supp_nation, o_year
"""


@register("q_tpch_q9", oracle=_Q9_ORACLE)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year for
    color-named parts. The testdata has no partsupp, so supply cost is the
    standard retail-margin proxy (60% of p_retailprice per unit) — the
    plan shape (LIKE-filtered part dim, 4-way star join, two-level group)
    is what Q9 exercises, and the profit expression is identical IEEE
    arithmetic on both engines before the exact decimal sum.

    Scale shape: LIKE prunes part to ~25% before broadcast; one shuffle on
    (supp_nation, o_year) ≈ 175 groups."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        F.col("p_name").like("%green%") | F.col("p_name").like("%red%")
    )
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    supp_nat = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    return (
        li.join(
            F.broadcast(part.select("p_partkey", "p_retailprice")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(orders.select("o_orderkey", "o_orderdate"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(supp_nat), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(
            "supp_nation", F.year("o_orderdate").cast("int").alias("o_year")
        )
        .agg(dec_sum(F.expr(_PROFIT), "sum_profit"))
        .orderBy("supp_nation", "o_year")
    )


# --- Q11: important stock ----------------------------------------------------

_Q11_FRACTION = "0.0008"

_Q11_ORACLE = f"""
WITH pv AS (
  SELECT l_partkey, {oracle_dec_sum('l_extendedprice', 'part_value')}
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, part_value
FROM pv
WHERE part_value > {_Q11_FRACTION} * (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,7))) AS DOUBLE) FROM lineitem)
ORDER BY part_value DESC, l_partkey
"""


@register("q_tpch_q11", oracle=_Q11_ORACLE)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose total traded value exceeds a fixed
    fraction of the corpus-wide value (the testdata has no partsupp, so
    lineitem extendedprice stands in for supplycost*availqty — the shape
    under test is the group-agg + scalar-subquery-threshold HAVING).

    Scale shape: the global total is DERIVED from the per-part aggregate
    (one fact scan, one shuffle) and broadcast back as a 1-row literal —
    not a second scan of the fact, which is what a naive translation of
    the scalar subquery would do. Both sides sum exact decimals, and the
    threshold comparison is double*double on identical values."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    pv = li.groupBy("l_partkey").agg(dec_sum("l_extendedprice", "part_value_dec"))
    # total from the per-part aggregate: re-sum the exact decimal partials
    total = pv.agg(
        F.sum(F.col("part_value_dec").cast(DEC)).cast("double").alias("total_value")
    )
    return (
        pv.join(F.broadcast(total))
        .filter(
            F.col("part_value_dec")
            > F.lit(0.0008) * F.col("total_value")
        )
        .select("l_partkey", F.col("part_value_dec").alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )


# --- Q12: shipping-priority classes ------------------------------------------

_Q12_ORACLE = """
SELECT l_returnflag AS ship_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY ship_class
ORDER BY ship_class
"""


@register("q_tpch_q12", oracle=_Q12_ORACLE)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: high- vs low-priority line counts per shipping
    class for one ship year (the testdata has no l_shipmode; l_returnflag
    is the 3-value class column standing in). The CASE pivot folds both
    counts into one hash aggregate; the year predicate prunes the lineitem
    scan before the join; 3 output groups mean map-side combine collapses
    virtually all rows before the single shuffle."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.select("l_orderkey", "l_returnflag")
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


# --- Q13: customer order-count distribution -----------------------------------

_Q13_ORACLE = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                   AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("q_tpch_q13", oracle=_Q13_ORACLE)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: the customer order-count histogram — a LEFT join with an
    extra non-equi predicate (so customers keep count 0), a per-customer
    COUNT of the non-null side, then a second aggregate over the counts.
    COUNT(o_orderkey) counts only matched rows, exactly the SQL semantics.

    Scale shape: two shuffles by construction (c_custkey, then c_count);
    the second input is one row per customer, already tiny. The filter on
    orders is pushed to its scan even though it sits in the LEFT join's ON
    clause."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --- Q15: top supplier --------------------------------------------------------

_Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, {oracle_dec_sum(_REV, 'total_revenue')}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@register("q_tpch_q15", oracle=_Q15_ORACLE)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with the maximum quarterly revenue — the
    classic view-reuse query. The revenue "view" is computed ONCE; its max
    comes from re-aggregating the tiny per-supplier result (100 rows), not
    a second fact scan, and joins back as a broadcast 1-row equality.
    Revenue values compare exactly because both arms reuse the same
    decimal-summed doubles."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp_ntz"))
    )
    supplier = load(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dec_sum(F.expr(_REV), "total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --- Q17: small-quantity-order revenue ----------------------------------------

_Q17_ORACLE = """
WITH avg_qty AS (
  SELECT l_partkey AS ap_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,7))) AS DOUBLE) / COUNT(*) AS part_avg
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,7))) AS DOUBLE) / 7.0 AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_small
FROM lineitem
JOIN part    ON p_partkey = l_partkey
JOIN avg_qty ON ap_partkey = l_partkey
WHERE p_brand = 'Brand#23' AND p_size <= 10
  AND l_quantity < 0.5 * part_avg
"""


@register("q_tpch_q17", oracle=_Q17_ORACLE)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue that would vanish without small-quantity orders.
    The correlated AVG-per-part subquery decorrelates into a per-part
    pre-aggregate joined back to the fact — Spark expresses exactly that
    plan. The average is the order-independent exact-decimal-sum /
    count division, so the `l_quantity < 0.5 * avg` cut falls identically
    on both engines.

    Scale shape: the per-part aggregate shuffles once on l_partkey and the
    back-join reuses that partitioning; the brand/size filter prunes part
    to a broadcast."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 10)
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count(F.lit(1))).alias(
            "part_avg"
        )
    )
    return (
        li.join(F.broadcast(part.select("p_partkey")), F.col("p_partkey") == F.col("l_partkey"))
        .join(avg_qty, F.col("ap_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("part_avg"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_small"),
        )
    )


# --- Q20: potential part promotion --------------------------------------------

_Q20_ORACLE = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'hot%'
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey
  HAVING SUM(CAST(l_quantity AS BIGINT)) > 400
)
ORDER BY s_suppkey
"""


@register("q_tpch_q20", oracle=_Q20_ORACLE)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved a promotable volume of
    hot-named parts in one year (no partsupp in the testdata, so shipped
    quantity stands in for availqty — preserving the nested
    filter→aggregate→HAVING→semi-join pipeline that makes Q20 a planning
    benchmark). Quantities sum as exact integers; the semi-join build side
    is the ~dozens-row HAVING survivor set, broadcast."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("hot%"))
    supplier = load(spark, sf_dir, "supplier")
    movers = (
        li.join(F.broadcast(part.select("p_partkey")), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty"))
        .filter(F.col("qty") > 400)
        .select("l_suppkey")
    )
    return (
        supplier.join(
            F.broadcast(movers), F.col("s_suppkey") == F.col("l_suppkey"), "semi"
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# --- Q22: global sales opportunity --------------------------------------------

_Q22_CODES = "('11', '13', '17', '19', '22', '25', '31')"

_Q22_ORACLE = f"""
WITH pos_avg AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,7))) AS DOUBLE) / COUNT(*) AS avg_bal
  FROM customer
  WHERE c_acctbal > 0.0 AND substring(c_name, 17, 2) IN {_Q22_CODES}
)
SELECT substring(c_name, 17, 2) AS cntrycode,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       {oracle_dec_sum('c_acctbal', 'totacctbal')}
FROM customer, pos_avg
WHERE substring(c_name, 17, 2) IN {_Q22_CODES}
  AND c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY cntrycode
ORDER BY cntrycode
"""


@register("q_tpch_q22", oracle=_Q22_ORACLE)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: rich-but-dormant customers by "country code" (the
    testdata has no c_phone; the last-two digits of c_name stand in;
    "dormant" means no order since 1999 — every testdata customer has
    SOME order, so the unrestricted NOT EXISTS would be vacuous).
    Three classic pieces in one plan: a scalar AVG subquery over a
    filtered slice, a NOT EXISTS anti-join against orders, and a final
    rollup per code.

    Scale shape: the scalar average derives from the same filtered
    customer slice (computed once, broadcast as one row); the anti-join
    build side is orders' distinct custkeys. The average is the exact
    decimal-sum / count division so the `>` cut matches DuckDB exactly."""
    cust = load(spark, sf_dir, "customer").filter(
        F.substring("c_name", 17, 2).isin("11", "13", "17", "19", "22", "25", "31")
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate")
            >= F.lit("1999-01-01 00:00:00").cast("timestamp_ntz")
        )
        .select("o_custkey")
    )
    pos_avg = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count(F.lit(1))).alias(
            "avg_bal"
        )
    )
    return (
        cust.join(F.broadcast(pos_avg))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "anti")
        .groupBy(F.substring("c_name", 17, 2).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            dec_sum("c_acctbal", "totacctbal"),
        )
        .orderBy("cntrycode")
    )


# --- Q5: local supplier volume ------------------------------------------------

_Q5_ORACLE = f"""
SELECT n.n_name,
       {oracle_dec_sum(_REV.replace('l_', 'l.l_'), 'revenue')}
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
                AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
"""


@register("q_tpch_q5", oracle=_Q5_ORACLE)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: local supplier volume — revenue by nation for one region's
    customers buying from SAME-NATION suppliers in one order year. The
    distinguishing feature is the non-key equi-condition
    c_nationkey = s_nationkey riding the supplier join: "local" commerce.

    Plan: region→nation prunes to one region's nations — the only
    unconditionally-broadcast dim (≤25 rows, constant in SF). Supplier and
    customer both grow linearly with SF (10k / 150k rows per SF), so
    neither is force-broadcast: both are first semi-pruned to the region's
    nations (valid for customer because the locality condition
    c_nationkey = s_nationkey forces ASIA customers — a 5× cut), then
    joined via shuffle_hash hints. The explicit hint PINS the joins to
    shuffled-hash (it takes precedence over AQE's size-based broadcast
    selection, so small SFs pay the shuffle): the point of the hint is the
    scale ceiling — no sort on the linear-growth sides and no unbounded
    broadcast, whatever the SF.
    The year predicate prunes orders at the scan; orders⋈customer runs
    dim-side (both linear-but-small) before the single fact shuffle of
    lineitem on l_orderkey, and the supplier join carries the locality
    condition so no extra filter pass is needed. At 100 TB: one fact
    shuffle on the join key plus AQE-sized dim joins — no unbounded
    driver-side broadcast anywhere in the plan.
    """
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    cust = (
        load(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation.select("n_nationkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "semi",
        )
        .select("c_custkey", "c_nationkey")
    )
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    co = orders.join(
        cust.hint("shuffle_hash"), F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "c_nationkey")
    return (
        li.join(co.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp.hint("shuffle_hash"),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# --- Q6: forecasting revenue change -------------------------------------------

_Q6_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,7))) AS DOUBLE)
         AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


@register("q_tpch_q6", oracle=_Q6_ORACLE)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: forecasting revenue change — the pure scan-filter-aggregate
    benchmark (no join at all). Its whole point is predicate pushdown +
    vectorized decode: every predicate (ship year, discount band, quantity
    cap) reaches the parquet scan as PushedFilters, the projection prunes
    to three columns, and the aggregate is a single partial+final sum.
    The n_lines count makes the selectivity visible in the certificate.

    At 100 TB this query IS the scan throughput measurement: zero shuffles
    beyond the 1-row final aggregate, so any slowdown is storage-side —
    which is exactly why the suite needs one query shaped like this.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dec_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )
