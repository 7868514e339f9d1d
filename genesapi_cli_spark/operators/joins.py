"""Join operators (SURVEY.md §2.3).

Reference analog: fact ⋈ catalog-metadata enrichment in
``genesapi/serialize.py (upstream)`` (labels, units, region names) and the
``should_update`` skip-set logic of ``genesapi/storage.py (upstream)``
(semi/anti joins).

Scale notes per shape:
- small dims (region/nation/customer/supplier/part at dim-like cardinality)
  broadcast — no shuffle of the fact side; `q_join_broadcast` pins the hint,
  elsewhere AQE's size estimate picks it.
- big-big equi joins shuffle on the key; AQE handles skew splitting.
- the theta join keeps its equi key (nationkey) so Catalyst plans a hash/SMJ
  join with a residual predicate — NOT a cartesian product.
- the as-of join is deliberately NOT a pair-join + filter (quadratic in events
  per user); it is the sort-based formulation: union both streams, one shuffle
  by user_id, running `last(ignorenulls)` window — O(n log n) per key and
  skew-bounded. This is the pattern that survives 100 TB event tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from genesapi_cli_spark.io import load, spread
from genesapi_cli_spark.registry import dec_sum, oracle_dec_sum, register

# --- q_join_inner -----------------------------------------------------------

_INNER_ORACLE = f"""
SELECT c_mktsegment,
       {oracle_dec_sum('o_totalprice', 'revenue')},
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


@register("q_join_inner", oracle=_INNER_ORACLE)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join orders ⋈ customer, revenue per market segment.
    No hint: Catalyst/AQE picks broadcast (customer is dim-sized) or SMJ."""
    orders, customer = load(spark, sf_dir, "orders"), load(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(dec_sum("o_totalprice", "revenue"), F.count(F.lit(1)).alias("n_orders"))
    )


# --- q_join_broadcast -------------------------------------------------------

_BCAST_ORACLE = f"""
SELECT p_brand, {oracle_dec_sum('l_quantity', 'sum_qty')}, COUNT(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


@register("q_join_broadcast", oracle=_BCAST_ORACLE)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ broadcast(part): the fact side never shuffles for the join —
    the only shuffle is the final 16-brand aggregate. The explicit hint is the
    contract for small-lookup joins (reference's label enrichment)."""
    li, part = load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(dec_sum("l_quantity", "sum_qty"), F.count(F.lit(1)).alias("n"))
    )


# --- q_join_multiway (TPC-H Q5 shape) --------------------------------------

_MULTIWAY_ORACLE = f"""
SELECT n_name, {oracle_dec_sum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


@register("q_join_multiway", oracle=_MULTIWAY_ORACLE)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: five-way enrichment chain with a local-supplier predicate.
    Dims broadcast; the only shuffled join is orders⋈lineitem; the region
    filter prunes before any join (Catalyst pushes it through)."""
    region, nation, customer, orders, lineitem, supplier = (
        load(spark, sf_dir, t)
        for t in ("region", "nation", "customer", "orders", "lineitem", "supplier")
    )
    return (
        region.filter(F.col("r_name") == "ASIA")
        .join(nation, nation.n_regionkey == region.r_regionkey)
        .join(customer, customer.c_nationkey == nation.n_nationkey)
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# --- q_join_left ------------------------------------------------------------

_LEFT_ORACLE = """
SELECT c_nationkey,
       COUNT(DISTINCT c_custkey) AS n_customers,
       COUNT(DISTINCT CASE WHEN o_orderkey IS NULL THEN c_custkey END) AS n_without_orders
FROM customer LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_nationkey
"""


@register("q_join_left", oracle=_LEFT_ORACLE)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping customers without orders (the reference keeps
    facts whose metadata is missing)."""
    customer, orders = load(spark, sf_dir, "customer"), load(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_nationkey")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.countDistinct(
                F.when(F.col("o_orderkey").isNull(), F.col("c_custkey"))
            ).alias("n_without_orders"),
        )
    )


# --- q_join_full ------------------------------------------------------------

_FULL_ORACLE = """
SELECT COALESCE(c.k, s.k) AS nationkey, c.n_cust, s.n_supp
FROM (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) c
FULL OUTER JOIN
     (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) s
ON c.k = s.k
"""


@register("q_join_full", oracle=_FULL_ORACLE)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer reconciliation of per-nation customer vs supplier counts;
    nulls mark presence on one side only."""
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c.k == s.k, "full").select(
        F.coalesce(c.k, s.k).alias("nationkey"), "n_cust", "n_supp"
    )


# --- q_join_semi / q_join_anti ---------------------------------------------

_SEMI_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


@register("q_join_semi", oracle=_SEMI_ORACLE)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as left_semi — probe side streams, no row multiplication."""
    customer, orders = load(spark, sf_dir, "customer"), load(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


_ANTI_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
"""


@register("q_join_anti", oracle=_ANTI_ORACLE)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as left_anti — the reference's should_update skip-set
    (storage.py upstream): rows not present in the already-loaded keyset.
    Restricted to urgent orders so the anti-set is non-trivial at every sf."""
    customer, orders = load(spark, sf_dir, "customer"), load(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# --- q_join_theta -----------------------------------------------------------

_THETA_ORACLE = """
SELECT s_nationkey AS nationkey, COUNT(*) AS n_pairs
FROM supplier JOIN customer
  ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
GROUP BY s_nationkey
"""


@register("q_join_theta", oracle=_THETA_ORACLE)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi pair join blocked by nation. The equality on nationkey is the
    join key (hash/SMJ); the balance inequality is a residual predicate — this
    never degenerates to a cartesian product."""
    supplier, customer = load(spark, sf_dir, "supplier"), load(spark, sf_dir, "customer")
    return (
        supplier.join(
            customer,
            (supplier.s_nationkey == customer.c_nationkey)
            & (supplier.s_acctbal > customer.c_acctbal),
        )
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# --- q_join_cross -----------------------------------------------------------

_CROSS_ORACLE = """
SELECT r_name, n_name,
       CASE WHEN n_regionkey = r_regionkey THEN 1 ELSE 0 END AS is_home
FROM region CROSS JOIN nation
"""


@register("q_join_cross", oracle=_CROSS_ORACLE)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian grid (5 × 25) with a membership flag."""
    region, nation = load(spark, sf_dir, "region"), load(spark, sf_dir, "nation")
    return region.crossJoin(nation).select(
        "r_name",
        "n_name",
        F.when(F.col("n_regionkey") == F.col("r_regionkey"), 1).otherwise(0).alias("is_home"),
    )


# --- q_join_asof ------------------------------------------------------------

_ASOF_ORACLE = """
WITH tagged AS (
  SELECT user_id,
         epoch_us(ts) AS us,
         event_id,
         event_type = 'signup' AS is_signup
  FROM events
  WHERE event_type IN ('purchase', 'signup')
), enriched AS (
  SELECT user_id, us, event_id, is_signup,
         LAST_VALUE(CASE WHEN is_signup THEN us END IGNORE NULLS) OVER w AS signup_us,
         LAST_VALUE(CASE WHEN is_signup THEN event_id END IGNORE NULLS) OVER w AS signup_event_id
  FROM tagged
  WINDOW w AS (
    PARTITION BY user_id
    ORDER BY us, is_signup DESC, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  )
)
SELECT event_id, user_id, us AS purchase_us, signup_us, signup_event_id
FROM enriched
WHERE NOT is_signup
"""


@register("q_join_asof", oracle=_ASOF_ORACLE)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest signup at-or-
    before it (time-alignment of facts to reference dates in the reference).

    Spark has no native as-of join in SQL; the scalable formulation is NOT a
    range pair-join (quadratic per user) but union + single shuffle on
    user_id + running ``last(ignorenulls)`` — signups sort before purchases at
    equal timestamps so ts_signup == ts_purchase matches. Ties between signups
    resolve to the highest event_id on both engines (explicit sort keys).
    """
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "signup")
    )
    tagged = ev.select(
        "user_id",
        F.col("ts_us").alias("us"),
        "event_id",
        (F.col("event_type") == "signup").alias("is_signup"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("us"), F.col("is_signup").desc(), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = tagged.select(
        "event_id",
        "user_id",
        "us",
        "is_signup",
        F.last(F.when(F.col("is_signup"), F.col("us")), ignorenulls=True)
        .over(w)
        .alias("signup_us"),
        F.last(F.when(F.col("is_signup"), F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("signup_event_id"),
    )
    return enriched.filter(~F.col("is_signup")).select(
        "event_id", "user_id", F.col("us").alias("purchase_us"), "signup_us", "signup_event_id"
    )


# --- q_join_range -----------------------------------------------------------

_RANGE_ORACLE = """
WITH bands AS (
  SELECT CAST(i AS INT) AS band_id,
         CAST(i * i * 1500.0 AS DOUBLE) AS lo,
         CAST((i + 1) * (i + 1) * 1500.0 AS DOUBLE) AS hi
  FROM range(20) t(i)
)
SELECT band_id,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,7))) AS DOUBLE) AS sum_price
FROM bands JOIN orders ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band_id
"""


@register("q_join_range", oracle=_RANGE_ORACLE)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: orders matched to irregular price bands
    [i²·1500, (i+1)²·1500), the value-banding the reference applies when
    grouping statistics into class intervals.

    A naive ``ON price >= lo AND price < hi`` theta join is BroadcastNestedLoop
    (every row × every band). The scale formulation is *bucket expansion*:
    each interval explodes into the fixed-width buckets it overlaps
    (``sequence(floor(lo/B), floor(hi/B))``), the fact side computes one
    bucket per row, and the join becomes an equi-join on bucket + residual
    range filter — hash join, shuffle-free here because the expanded band side
    stays broadcastable. The same rewrite holds when the interval side is
    large: equi-join on bucket shuffles both sides by bucket instead of
    looping.
    """
    bucket_w = 25000.0
    bands = spark.range(20).select(
        F.col("id").cast("int").alias("band_id"),
        (F.col("id") * F.col("id") * F.lit(1500.0)).alias("lo"),
        ((F.col("id") + 1) * (F.col("id") + 1) * F.lit(1500.0)).alias("hi"),
    )
    expanded = bands.select(
        "band_id",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / bucket_w), F.floor(F.col("hi") / bucket_w)
            )
        ).alias("bkt"),
    )
    orders = load(spark, sf_dir, "orders").withColumn(
        "bkt", F.floor(F.col("o_totalprice") / bucket_w)
    )
    joined = orders.join(F.broadcast(expanded), on="bkt").filter(
        (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi"))
    )
    return joined.groupBy("band_id").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,7)")).cast("double").alias("sum_price"),
    )


# --- q_join_skew_salted -----------------------------------------------------

_SKEW_ORACLE = """
SELECT s_nationkey,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,7))) AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier
  ON s_suppkey = CASE WHEN l_orderkey % 4 = 0 THEN 1 ELSE l_suppkey END
GROUP BY s_nationkey
"""


@register("q_join_skew_salted", oracle=_SKEW_ORACLE)
def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant salted join: ~25% of lineitems are remapped onto one
    hot supplier (CASE key), then joined to supplier with an 8-way salt —
    the hot key's rows spread across 8 shuffle partitions instead of one
    straggler task.

    Build side replicates each supplier row 8× (explode(sequence)); probe side
    computes a deterministic salt (xxhash64 of the row key, pmod 8 — NOT
    rand(), which breaks retry/replay determinism). Join keys become
    (suppkey, salt); results are provably identical to the unsalted join, so
    the oracle is the plain join. SHUFFLE_HASH hint models the
    both-sides-large case where broadcast (the first skew escape) is
    unavailable; with AQE skew-join this is the manual fallback for a single
    pathological key.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_extendedprice",
        F.when(F.col("l_orderkey") % 4 == 0, F.lit(1))
        .otherwise(F.col("l_suppkey"))
        .alias("k"),
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(8)).alias("salt"),
    )
    sup = load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_nationkey",
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("salt"),
    )
    j = li.join(
        sup.hint("shuffle_hash"),
        (F.col("k") == F.col("s_suppkey")) & (li["salt"] == sup["salt"]),
    )
    return j.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,7)"))
        .cast("double")
        .alias("revenue"),
    )


# --- q_join_lateral ---------------------------------------------------------

_LATERAL_ORACLE = """
SELECT n_name, l.c_custkey, l.c_acctbal
FROM nation, LATERAL (
  SELECT c_custkey, c_acctbal
  FROM customer
  WHERE c_nationkey = n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 2
) l
"""


@register("q_join_lateral", oracle=_LATERAL_ORACLE)
def q_join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL (correlated table) join: for every nation, its top-2 customers
    by account balance — the per-entity-top-k join written the SQL-standard
    way instead of window+filter (q_topk_per_group shows the window form;
    both must exist for a user switching engines).

    Catalyst plans the correlated LIMIT subquery via DomainJoin rewrite —
    the per-key top-k runs as a distributed join + per-group limit, not a
    driver loop per nation. Ties are impossible (custkey in the sort key).
    """
    load(spark, sf_dir, "nation").createOrReplaceTempView("lat_nation")
    load(spark, sf_dir, "customer").createOrReplaceTempView("lat_customer")
    return spark.sql(
        """
        SELECT n_name, l.c_custkey, l.c_acctbal
        FROM lat_nation JOIN LATERAL (
          SELECT c_custkey, c_acctbal
          FROM lat_customer
          WHERE c_nationkey = n_nationkey
          ORDER BY c_acctbal DESC, c_custkey
          LIMIT 2
        ) l
        """
    )


# --- q_join_null_safe -------------------------------------------------------

_NULL_SAFE_ORACLE = """
WITH o AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderpriority END AS pri
  FROM orders
), p AS (
  SELECT DISTINCT CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderpriority END AS pri
  FROM orders
)
SELECT COALESCE(o.pri, '<null>') AS pri_key, COUNT(*) AS n_orders
FROM o JOIN p ON o.pri IS NOT DISTINCT FROM p.pri
GROUP BY 1
"""


@register("q_join_null_safe", oracle=_NULL_SAFE_ORACLE)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys MATCH each
    other instead of vanishing — the semantics needed when joining on
    optional dimensions (the reference's confidential-token dims parse to
    NULL but must still align across cubes).

    Crucially this stays a HASH join: <=> is an equi-condition to Catalyst
    (null-aware key), not a theta residual — at 100 TB the difference
    between a shuffle-hash join and a nested loop. The NULL bucket is a
    single hot key by construction; if it dominated, pre-split it like
    q_join_skew_salted.
    """
    orders = load(spark, sf_dir, "orders")
    pri = F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(
        F.col("o_orderpriority")
    )
    o = orders.select("o_orderkey", pri.alias("pri"))
    p = orders.select(pri.alias("p_pri")).distinct()
    j = o.join(p, F.col("pri").eqNullSafe(F.col("p_pri")))
    return j.groupBy(F.coalesce("pri", F.lit("<null>")).alias("pri_key")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )


# --- q_join_asof_tolerance --------------------------------------------------

_ASOF_TOL_US = 7 * 86400 * 1000000  # 7 days in epoch-µs

_ASOF_TOL_ORACLE = f"""
WITH tagged AS (
  SELECT user_id,
         epoch_us(ts) AS us,
         event_id,
         event_type = 'signup' AS is_signup
  FROM events
  WHERE event_type IN ('purchase', 'signup')
), enriched AS (
  SELECT user_id, us, event_id, is_signup,
         LAST_VALUE(CASE WHEN is_signup THEN us END IGNORE NULLS) OVER w AS signup_us,
         LAST_VALUE(CASE WHEN is_signup THEN event_id END IGNORE NULLS) OVER w
           AS signup_event_id
  FROM tagged
  WINDOW w AS (
    PARTITION BY user_id
    ORDER BY us, is_signup DESC, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  )
)
SELECT event_id,
       user_id,
       us AS purchase_us,
       CASE WHEN us - signup_us <= {_ASOF_TOL_US} THEN signup_us END AS signup_us,
       CASE WHEN us - signup_us <= {_ASOF_TOL_US} THEN signup_event_id END
         AS signup_event_id,
       (signup_us IS NOT NULL AND us - signup_us > {_ASOF_TOL_US}) AS stale_dropped
FROM enriched
WHERE NOT is_signup
"""


@register("q_join_asof_tolerance", oracle=_ASOF_TOL_ORACLE)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness TOLERANCE (pandas merge_asof semantics):
    a purchase attributes to the latest prior signup only if it happened
    within 7 days — older matches are dropped as stale, the realistic
    attribution-window rule (and the guard against joining to a reference
    row from a different era when keys are reused).

    Same single-shuffle union+LOCF plan as q_join_asof — the tolerance is a
    pure projection on top (integer µs comparison), so bounded staleness
    costs nothing extra at any scale. `stale_dropped` makes the difference
    auditable.
    """
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "signup")
    )
    tagged = ev.select(
        "user_id",
        F.col("ts_us").alias("us"),
        "event_id",
        (F.col("event_type") == "signup").alias("is_signup"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("us"), F.col("is_signup").desc(), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = tagged.select(
        "event_id",
        "user_id",
        "us",
        "is_signup",
        F.last(F.when(F.col("is_signup"), F.col("us")), ignorenulls=True)
        .over(w)
        .alias("raw_signup_us"),
        F.last(F.when(F.col("is_signup"), F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("raw_signup_event_id"),
    )
    fresh = F.col("us") - F.col("raw_signup_us") <= _ASOF_TOL_US
    return enriched.filter(~F.col("is_signup")).select(
        "event_id",
        "user_id",
        F.col("us").alias("purchase_us"),
        F.when(fresh, F.col("raw_signup_us")).alias("signup_us"),
        F.when(fresh, F.col("raw_signup_event_id")).alias("signup_event_id"),
        (F.col("raw_signup_us").isNotNull() & ~fresh).alias("stale_dropped"),
    )


# --- q_affinity_pairs -------------------------------------------------------

_AFFINITY_MAX_BASKET = 64  # whale-basket cap: Σk² fan-out bound, both engines

_AFFINITY_ORACLE = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), ok AS (
  SELECT l_orderkey FROM items
  GROUP BY l_orderkey HAVING COUNT(*) <= {_AFFINITY_MAX_BASKET}
), kept AS (
  SELECT i.l_orderkey, i.l_partkey FROM items i JOIN ok USING (l_orderkey)
), pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_orders
  FROM kept a JOIN kept b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
)
SELECT part_a, part_b, n_orders
FROM pairs
WHERE n_orders >= 2
"""


@register("q_affinity_pairs", oracle=_AFFINITY_ORACLE)
def q_affinity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence mining: part pairs appearing together in
    ≥2 orders — the self-join pair-generation family (recommendations,
    co-citation, co-click graphs).

    The join key is the basket id, so pair fan-out is Σ k_i² over basket
    sizes — bounded when baskets are (TPC-H ~4-7 items), NOT O(n²). The
    100 TB hazard is a whale basket (one order with 10⁵ items → 10¹⁰
    pairs): baskets above {_AFFINITY_MAX_BASKET} distinct items are DROPPED
    before the pair explode — ENFORCED in both engines (size(parts) ≤ K here,
    HAVING COUNT(*) ≤ K in the oracle), the exact analogue of the dedup
    family's stop-shingle cap and q_graph_jaccard's top-8 adjacency cap.
    Distinct-items first so duplicate lineitems of the same part don't
    inflate counts. spread(l_orderkey) both parallelizes the local
    single-row-group scan AND pre-partitions on the basket key, so the
    collect_set aggregate needs no further shuffle.
    """
    li = spread(load(spark, sf_dir, "lineitem"), "l_orderkey")
    # In-row pair generation beats the orderkey self-join here (measured
    # 1.5s vs 1.8s warm, 2 shuffles vs 4): collect each basket once, emit
    # ordered pairs with a slice/transform HOF. The collect_set holds ONE
    # basket in executor memory — bounded by the whale-basket cap below.
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    ).filter(F.size("parts") <= _AFFINITY_MAX_BASKET)
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(parts, (x, i) -> "
                "transform(slice(parts, i + 2, size(parts)), "
                "y -> struct(x AS part_a, y AS part_b))))"
            )
        ).alias("p")
    ).select("p.part_a", "p.part_b")
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


# --- q_join_spatial ---------------------------------------------------------

_SPATIAL_EPS_XC = 50   # ε_x = 0.50 in value-cents
_SPATIAL_EPS_Y = 2     # ε_y = 2 user-id units

_SPATIAL_ORACLE = f"""
WITH pts AS (
  SELECT event_id AS pid,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS xc,
         user_id % 100 AS y
  FROM events WHERE event_type = 'purchase'
)
SELECT a.pid AS pid_a, b.pid AS pid_b,
       ABS(a.xc - b.xc) AS dx_cents,
       ABS(a.y - b.y) AS dy
FROM pts a JOIN pts b
  ON a.pid < b.pid
 AND ABS(a.xc - b.xc) <= {_SPATIAL_EPS_XC}
 AND ABS(a.y - b.y) <= {_SPATIAL_EPS_Y}
"""


@register("q_join_spatial", oracle=_SPATIAL_ORACLE)
def q_join_spatial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D proximity join (all point pairs within an L∞ ε-box): the spatial
    family — geo near-matching, embedding-grid blocking, sensor
    co-location — done the grid-bucket way, NOT as a quadratic theta join.

    Each point lands in one ε-sized grid cell; side A explodes to its 3×3
    neighbor cells, side B stays put, and the join is a plain EQUI join on
    the cell id (hash-partitionable!) followed by the exact distance
    filter. Candidate fan-out is bounded by cell occupancy — the oracle is
    the honest quadratic inequality join, proving the grid finds exactly
    the same pairs. Integer cents/ids keep every distance exact.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    pts = ev.select(
        F.col("event_id").alias("pid"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).alias("xc"),
        (F.col("user_id") % 100).alias("y"),
    )
    cell_x = F.floor(F.col("xc") / _SPATIAL_EPS_XC)
    cell_y = F.floor(F.col("y") / _SPATIAL_EPS_Y)
    b = pts.select(
        F.col("pid").alias("pid_b"),
        F.col("xc").alias("xc_b"),
        F.col("y").alias("y_b"),
        cell_x.alias("cx"),
        cell_y.alias("cy"),
    )
    offsets = F.expr(
        "explode(transform(sequence(0, 8), i -> struct(i div 3 - 1 AS ox, i % 3 - 1 AS oy)))"
    )
    a = pts.select(
        F.col("pid").alias("pid_a"), F.col("xc").alias("xc_a"), F.col("y").alias("y_a"),
        cell_x.alias("cxa"), cell_y.alias("cya"),
    ).select("*", offsets.alias("o")).select(
        "pid_a", "xc_a", "y_a",
        (F.col("cxa") + F.col("o.ox")).alias("cx"),
        (F.col("cya") + F.col("o.oy")).alias("cy"),
    )
    cand = a.join(b, ["cx", "cy"])
    return cand.filter(
        (F.col("pid_a") < F.col("pid_b"))
        & (F.abs(F.col("xc_a") - F.col("xc_b")) <= _SPATIAL_EPS_XC)
        & (F.abs(F.col("y_a") - F.col("y_b")) <= _SPATIAL_EPS_Y)
    ).select(
        "pid_a",
        "pid_b",
        F.abs(F.col("xc_a") - F.col("xc_b")).alias("dx_cents"),
        F.abs(F.col("y_a") - F.col("y_b")).alias("dy"),
    )


# --- q_join_fuzzy -----------------------------------------------------------

_FUZZY_MAX_DIST = 3

_FUZZY_ORACLE = f"""
SELECT a.p_type,
       levenshtein(a.p_name, b.p_name) AS dist,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM part a JOIN part b
  ON a.p_type = b.p_type AND a.p_size = b.p_size
 AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= {_FUZZY_MAX_DIST}
GROUP BY a.p_type, dist
"""


@register("q_join_fuzzy", oracle=_FUZZY_ORACLE)
def q_join_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (edit-distance) matching within blocks: near-identical part
    names (Levenshtein ≤ 3) among parts of the same (type, size) — the
    entity-resolution join behind catalog dedup and record linkage.

    Scale shape: NEVER a global O(n²) — the equi-join on the blocking key
    (type, size) is a hash join, and the quadratic edit-distance work is
    confined inside blocks of ~n/|blocks| rows (the classic blocking
    strategy; at 100 TB the blocking key graduates to phonetic/sorted-
    neighborhood keys, same plan shape). The canonical a<b orientation
    halves the pair space; both engines implement the identical unit-cost
    Levenshtein, so the distance histogram is exact.
    """
    part = load(spark, sf_dir, "part")
    # VALUE-SPACE rewrite (round-8 scale rehearsal): the naive blocked
    # self-join enumerates row pairs — quadratic once block sizes grow,
    # because the blocking key's cardinality (|type|x|size| ~ 900) is FIXED
    # while the table scales (measured exp~2 at sf1/sf3). But the DISTANCE
    # only depends on the NAME VALUES, and names are a bounded inventory
    # (first-word x second-word), so: collapse rows to (block, name, cnt)
    # multiplicities first, run the quadratic Levenshtein over DISTINCT
    # name pairs per block (value-pair space, constant in row count), and
    # recover the exact row-pair histogram from multiplicities — identical
    # result to the oracle's row self-join, row-LINEAR cost. Same-name
    # pairs are dist=0 with cnt-choose-2; cross-name pairs orient once by
    # name and contribute cnt_a*cnt_b (every row pair has exactly one
    # ka<kb orientation). The same two no-op prunes remain: length-delta
    # residual + bounded levenshtein early-exit (-1 -> dropped).
    grp = part.groupBy("p_type", "p_size", "p_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    same = grp.filter(F.col("cnt") >= 2).select(
        "p_type",
        F.lit(0).alias("dist"),
        (F.col("cnt") * (F.col("cnt") - 1) / 2).cast("bigint").alias("m"),
    )
    gb = grp.select(
        F.col("p_type").alias("tb"),
        F.col("p_size").alias("sb"),
        F.col("p_name").alias("nb"),
        F.col("cnt").alias("cnt_b"),
    )
    cross = (
        grp.join(
            gb,
            (F.col("p_type") == F.col("tb"))
            & (F.col("p_size") == F.col("sb"))
            & (F.col("p_name") < F.col("nb"))
            & (F.abs(F.length("p_name") - F.length("nb")) <= _FUZZY_MAX_DIST),
        )
        .select(
            "p_type",
            F.levenshtein("p_name", "nb", _FUZZY_MAX_DIST).alias("dist"),
            (F.col("cnt") * F.col("cnt_b")).alias("m"),
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= _FUZZY_MAX_DIST))
    )
    return (
        same.unionByName(cross)
        .groupBy("p_type", "dist")
        .agg(F.sum("m").cast("bigint").alias("n_pairs"))
    )


# --- q_join_bloom (portable Bloom-filter semi-join prefilter) ---------------

_BLOOM_BITS = 4096      # m: filter width in bits
_BLOOM_WORDS = 128      # m / 32 — 32-bit words keep every value positive
_BLOOM_K = 3            # hash probes per key
_BLOOM_MIN_PRICE = 490_000  # build side: customers with a whale order


_BLOOM_ORACLE = f"""
WITH members AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > {_BLOOM_MIN_PRICE}
), positions AS (
  SELECT o_custkey, seed,
         ('0x' || substr(sha256(seed || ':' || CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT
           % {_BLOOM_BITS} AS pos
  FROM members, (SELECT unnest(range(0, {_BLOOM_K})) AS seed) s(seed)
), words AS (
  SELECT pos // 32 AS word_idx, bit_or(1::BIGINT << (pos % 32)) AS word
  FROM positions GROUP BY word_idx
), cust_probes AS (
  SELECT c_custkey, s.seed,
         ('0x' || substr(sha256(s.seed || ':' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
           % {_BLOOM_BITS} AS pos
  FROM customer, (SELECT unnest(range(0, {_BLOOM_K})) AS seed) s
), cust_hits AS (
  SELECT c_custkey,
         MIN(CASE WHEN (COALESCE(w.word, 0) >> (pos % 32)) & 1 = 1
                  THEN 1 ELSE 0 END) AS all_hit
  FROM cust_probes LEFT JOIN words w ON w.word_idx = pos // 32
  GROUP BY c_custkey
)
SELECT h.c_custkey,
       h.all_hit = 1 AS bloom_hit,
       m.o_custkey IS NOT NULL AS is_member,
       (h.all_hit = 1) OR (m.o_custkey IS NULL) AS no_false_negative
FROM cust_hits h LEFT JOIN members m ON m.o_custkey = h.c_custkey
"""


@register("q_join_bloom", oracle=_BLOOM_ORACLE)
def q_join_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join prefilter with a PORTABLE filter and a
    no-false-negative CERTIFICATE: the distinct whale-order custkeys build a
    {_BLOOM_BITS}-bit / k={_BLOOM_K} Bloom filter (sha256-prefix positions, so
    Spark and DuckDB build bit-identical words), every customer row is tested
    against it, and the output carries (bloom_hit, is_member,
    no_false_negative) per customer — hash-matching proves the Bloom
    guarantee row by row: every true member hits, and the (expected) handful
    of false positives is identical on both engines because the hashes are.

    Scale shape: this is THE pattern for semi-joining a 100 TB probe side
    against a selective build side without shuffling the probe. The filter
    is a bit_or aggregate over (word_idx) — mergeable monoid state, built
    map-side, {_BLOOM_WORDS} words total — and ships to the probe side as a
    broadcast ≤{_BLOOM_WORDS}-row table; probing is a broadcast join + bit
    test, so the big table is never exchanged. (Spark's own runtime bloom
    pushdown does this invisibly for plain joins; this operator makes the
    filter explicit, portable, and certifiable.) The exact-membership arm
    exists only for the certificate — production drops it.
    """
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    members = (
        orders.filter(F.col("o_totalprice") > _BLOOM_MIN_PRICE)
        .select("o_custkey")
        .distinct()
    )
    seeds = F.sequence(F.lit(0), F.lit(_BLOOM_K - 1))
    positions = members.select(
        "o_custkey", F.explode(seeds).alias("seed")
    ).select(
        "o_custkey",
        F.expr(
            f"CAST(CONV(SUBSTRING(SHA2(CONCAT(CAST(seed AS STRING), ':', "
            f"CAST(o_custkey AS STRING)), 256), 1, 8), 16, 10) AS BIGINT) "
            f"% {_BLOOM_BITS}"
        ).alias("pos"),
    )
    words = positions.groupBy(
        F.expr("pos div 32").alias("word_idx")
    ).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))")
        ).alias("word")
    )
    cust_probes = cust.select(
        "c_custkey", F.explode(seeds).alias("seed")
    ).select(
        "c_custkey",
        F.expr(
            f"CAST(CONV(SUBSTRING(SHA2(CONCAT(CAST(seed AS STRING), ':', "
            f"CAST(c_custkey AS STRING)), 256), 1, 8), 16, 10) AS BIGINT) "
            f"% {_BLOOM_BITS}"
        ).alias("pos"),
    )
    cust_hits = (
        cust_probes.join(
            F.broadcast(words),
            F.expr("pos div 32") == F.col("word_idx"),
            "left",
        )
        .select(
            "c_custkey",
            F.expr(
                "CASE WHEN shiftright(COALESCE(word, CAST(0 AS BIGINT)), "
                "CAST(pos % 32 AS INT)) & 1 = 1 THEN 1 ELSE 0 END"
            ).alias("hit"),
        )
        .groupBy("c_custkey")
        .agg(F.min("hit").alias("all_hit"))
    )
    mem_flag = members.select(F.col("o_custkey").alias("m_key"))
    return cust_hits.join(
        F.broadcast(mem_flag), F.col("c_custkey") == F.col("m_key"), "left"
    ).select(
        "c_custkey",
        (F.col("all_hit") == 1).alias("bloom_hit"),
        F.col("m_key").isNotNull().alias("is_member"),
        ((F.col("all_hit") == 1) | F.col("m_key").isNull()).alias(
            "no_false_negative"
        ),
    )


# --- q_join_interval_overlap (interval × interval overlap self-join) --------

_IV_DAY_US = 86_400_000_000

_IV_OVERLAP_ORACLE = f"""
WITH iv AS (
  SELECT o.o_orderkey AS k, o.o_custkey AS c,
         epoch_us(o.o_orderdate) // {_IV_DAY_US} AS s,
         MAX(epoch_us(l.l_shipdate) // {_IV_DAY_US}) AS e
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_custkey, s
), pairs AS (
  SELECT a.c,
         least(a.e, b.e) - greatest(a.s, b.s) + 1 AS ov_days
  FROM iv a JOIN iv b
    ON a.c = b.c AND a.k < b.k AND a.s <= b.e AND b.s <= a.e
)
SELECT c AS o_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_overlap_pairs,
       CAST(SUM(ov_days) AS BIGINT) AS sum_overlap_days,
       CAST(MAX(ov_days) AS BIGINT) AS max_overlap_days
FROM pairs GROUP BY c
"""


@register("q_join_interval_overlap", oracle=_IV_OVERLAP_ORACLE)
def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval OVERLAP self-join: pairs of the same customer's
    order-fulfillment windows [orderdate, last shipdate] that overlap in
    time — "how often does this customer have concurrent open orders", the
    two-sided interval join that completes the temporal-join family
    (q_join_range = point-in-interval, q_join_pit = as-of versioned,
    q_intervals_active = global concurrency curve).

    Scale shape: the customer key is the natural BLOCKING key — the join is
    a plain equi hash join on c with the overlap condition as a residual
    predicate, so the quadratic work is confined to each customer's own
    order count (bounded fan-out), exactly like q_join_fuzzy's (type,size)
    blocks; no theta join, no BroadcastNestedLoop anywhere in the plan.
    When no such key exists, the q_join_spatial grid-bucket rewrite applies
    to the time axis instead. Interval endpoints are exact epoch days; the
    fulfillment window is the (orderkey) hash agg over lineitem run BEFORE
    the orders join (round 12, guide §2.3 — aggregate before you shuffle):
    the join input shrinks from |lineitem| to |orderkeys|, the aggregate's
    output partitioning feeds the join key directly, and the former
    post-join re-aggregate disappears (orderkey is unique in orders, so
    joining the collapsed window is the same relation).
    """
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.max(
            F.expr(f"unix_micros(CAST(l_shipdate AS TIMESTAMP)) div {_IV_DAY_US}")
        ).alias("e")
    )
    iv = (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("c"),
            F.expr(
                f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {_IV_DAY_US}"
            ).alias("s"),
            "e",
        )
        # one interval relation feeds both self-join sides (the fact join +
        # agg would otherwise run twice when ReuseExchange doesn't fire
        # across the alias subtrees)
        .localCheckpoint(eager=False)
    )
    a = iv.alias("a")
    b = iv.alias("b")
    pairs = a.join(
        b,
        (F.col("a.c") == F.col("b.c"))
        & (F.col("a.k") < F.col("b.k"))
        & (F.col("a.s") <= F.col("b.e"))
        & (F.col("b.s") <= F.col("a.e")),
    ).select(
        F.col("a.c").alias("c"),
        (
            F.least(F.col("a.e"), F.col("b.e"))
            - F.greatest(F.col("a.s"), F.col("b.s"))
            + 1
        ).alias("ov_days"),
    )
    return pairs.groupBy(F.col("c").alias("o_custkey")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_overlap_pairs"),
        F.sum("ov_days").cast("bigint").alias("sum_overlap_days"),
        F.max("ov_days").cast("bigint").alias("max_overlap_days"),
    )


# --- q_join_asof_nearest (nearest-in-time as-of, either direction) ----------

_ASOF_NEAREST_ORACLE = """
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS us FROM events
  WHERE event_type = 'purchase'
), s AS (
  SELECT user_id, epoch_us(ts) AS us FROM events
  WHERE event_type = 'signup'
), cand AS (
  SELECT p.event_id, p.user_id, p.us, s.us AS s_us,
         ABS(p.us - s.us) AS dist_us,
         ROW_NUMBER() OVER (
           PARTITION BY p.event_id ORDER BY ABS(p.us - s.us), s.us) AS rn
  FROM p JOIN s ON s.user_id = p.user_id
)
SELECT event_id, user_id, us,
       CAST(s_us AS BIGINT) AS matched_us,
       CAST(dist_us AS BIGINT) AS dist_us
FROM cand WHERE rn = 1
"""


@register("q_join_asof_nearest", oracle=_ASOF_NEAREST_ORACLE)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time as-of join (pandas merge_asof direction='nearest'):
    each purchase matched to the CLOSEST signup of the same user in either
    direction, ties to the earlier signup — completing the as-of family
    (backward `q_join_asof`, bounded `q_join_asof_tolerance`, versioned
    `q_join_pit`).

    Scale formulation vs oracle: the oracle is the quadratic-per-user
    argmin pair join; Spark is the union + ONE user shuffle + TWO frames
    over one sorted pass — a backward last(ignorenulls) (previous signup,
    signups sorting before purchases at equal µs so dist-0 matches land
    there) and a forward first(ignorenulls) (next strictly-later signup) —
    then a pure projection picks the closer side (tie → earlier = the
    backward candidate). O(n log n) per user, streaming-evaluable frames,
    no pair blowup at 100 TB.
    """
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "signup")
    )
    tagged = ev.select(
        "event_id",
        "user_id",
        F.col("ts_us").alias("us"),
        (F.col("event_type") == "signup").alias("is_signup"),
    )
    w_back = (
        Window.partitionBy("user_id")
        .orderBy(F.col("us"), F.col("is_signup").desc(), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy(F.col("us"), F.col("is_signup").desc(), F.col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    sig_us = F.when(F.col("is_signup"), F.col("us"))
    enriched = tagged.select(
        "event_id",
        "user_id",
        "us",
        "is_signup",
        F.last(sig_us, ignorenulls=True).over(w_back).alias("prev_us"),
        F.first(sig_us, ignorenulls=True).over(w_fwd).alias("next_us"),
    ).filter(~F.col("is_signup"))
    d_prev = F.col("us") - F.col("prev_us")
    d_next = F.col("next_us") - F.col("us")
    matched = F.when(
        F.col("prev_us").isNotNull()
        & (F.col("next_us").isNull() | (d_prev <= d_next)),
        F.col("prev_us"),
    ).otherwise(F.col("next_us"))
    return enriched.filter(
        F.col("prev_us").isNotNull() | F.col("next_us").isNotNull()
    ).select(
        "event_id",
        "user_id",
        "us",
        matched.cast("bigint").alias("matched_us"),
        F.abs(F.col("us") - matched).cast("bigint").alias("dist_us"),
    )


# --- q_spatial_hotspots ------------------------------------------------------

_HOT_CELL_XC = 50  # cell width in value-cents (same grid as q_join_spatial)
_HOT_CELL_Y = 2    # cell height in user-id units

_HOTSPOT_ORACLE = f"""
WITH pts AS (
  SELECT CAST(FLOOR(FLOOR(value * 100 + 0.5) / {_HOT_CELL_XC}) AS BIGINT) AS cx,
         CAST(FLOOR((user_id % 100) / {_HOT_CELL_Y}) AS BIGINT) AS cy
  FROM events WHERE event_type = 'purchase'
), cells AS (
  SELECT cx, cy, CAST(COUNT(*) AS BIGINT) AS n FROM pts GROUP BY cx, cy
), neighbors AS (
  SELECT c.cx, c.cy, c.n,
         CAST(SUM(o.n) AS BIGINT) AS smoothed
  FROM cells c
  JOIN cells o ON ABS(o.cx - c.cx) <= 1 AND ABS(o.cy - c.cy) <= 1
  GROUP BY c.cx, c.cy, c.n
)
SELECT cx, cy, n, smoothed
FROM neighbors
ORDER BY smoothed DESC, cx, cy
LIMIT 10
"""


@register("q_spatial_hotspots", oracle=_HOTSPOT_ORACLE)
def q_spatial_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-density hotspot detection: quantize points to cells, count per
    cell, smooth each cell with its 3×3 neighborhood sum (the box-kernel
    density that stops single-cell noise from winning), and report the
    top-10 hotspots — the spatial aggregation companion to
    q_join_spatial's pair join, and the same shape as geohash heat tiles.

    Plan: the neighborhood sum is NOT a 9-way self-join of the raw points —
    points collapse to cells FIRST (one hash agg), then the cell table
    (tiny relative to points) explodes ×9 neighbor offsets and equi-joins
    itself on the offset cell id, hash-partitionable like everything else.
    The oracle keeps the honest ABS-inequality join to prove the offset
    rewrite exact. Counts are integers end to end; the top-10 is
    TakeOrderedAndProject on the deterministic (smoothed, cx, cy) key.

    At 100 TB: the raw→cell aggregate is map-side combined (cell count ≪
    point count); the ×9 explode grows only the CELL table. Whale cells
    are data skew made visible — exactly what the hotspot report is for."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    pts = ev.select(
        F.floor(F.floor(F.col("value") * 100 + F.lit(0.5)) / _HOT_CELL_XC)
        .cast("bigint")
        .alias("cx"),
        F.floor((F.col("user_id") % 100) / _HOT_CELL_Y).cast("bigint").alias("cy"),
    )
    cells = pts.groupBy("cx", "cy").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    # explode each cell to the 9 neighbor slots it contributes to, then one
    # equi-join-free re-aggregation on the slot id
    contrib = cells.select(
        F.explode(
            F.expr(
                "transform(sequence(0, 8), i -> "
                "struct(cx + i div 3 - 1 AS tx, cy + i % 3 - 1 AS ty))"
            )
        ).alias("t"),
        "n",
    ).select(F.col("t.tx").alias("cx"), F.col("t.ty").alias("cy"), "n")
    smoothed = contrib.groupBy("cx", "cy").agg(
        F.sum("n").cast("bigint").alias("smoothed")
    )
    return (
        cells.join(smoothed, ["cx", "cy"])
        .select("cx", "cy", "n", "smoothed")
        .orderBy(F.desc("smoothed"), "cx", "cy")
        .limit(10)
    )


# --- q_orders_double_charge (duplicate-payment screen) -----------------------

_DC_WINDOW_DAYS = 7  # flag same-customer same-amount orders this close

_DOUBLE_CHARGE_ORACLE = f"""
WITH o AS (
  SELECT o_orderkey, o_custkey,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         epoch_us(o_orderdate) // 86400000000 AS day_idx
  FROM orders
), pairs AS (
  SELECT a.o_custkey,
         a.o_orderkey AS key_a, b.o_orderkey AS key_b,
         a.cents, b.day_idx - a.day_idx AS gap_days
  FROM o a JOIN o b
    ON a.o_custkey = b.o_custkey AND a.cents = b.cents
   AND a.o_orderkey < b.o_orderkey
  WHERE b.day_idx - a.day_idx BETWEEN -{_DC_WINDOW_DAYS} AND {_DC_WINDOW_DAYS}
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_suspect_pairs,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(SUM(cents) AS BIGINT) AS suspect_cents,
       CAST(SUM(CASE WHEN gap_days = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_same_day
FROM pairs
"""


@register("q_orders_double_charge", oracle=_DOUBLE_CHARGE_ORACLE)
def q_orders_double_charge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DUPLICATE-PAYMENT screen: pairs of orders by the SAME customer for
    the SAME amount within ±7 days — the ops-side fuzzy dedup every
    billing pipeline runs (retried charges, double submissions), which is
    exact dedup on a compound key PLUS a temporal band, not equality.

    Scale shape: the self-join keys on (custkey, cents) — a high-
    cardinality compound equi-key, so the join is a hash join whose
    per-bucket fan-out is the count of equal-amount orders per customer
    (tiny by construction), with the day-gap band as a residual filter;
    never a theta join. The canonical a<b orientation counts each pair
    once — the q_dedup_near_minhash pair discipline applied to facts.

    Parity: exact integer cents and epoch-day arithmetic end to end.
    """
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias("cents"),
        F.expr(
            "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000"
        ).alias("day_idx"),
    )
    a = o.alias("a")
    b = o.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.cents") == F.col("b.cents"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
        )
        .select(
            F.col("a.o_custkey").alias("o_custkey"),
            F.col("a.cents").alias("cents"),
            (F.col("b.day_idx") - F.col("a.day_idx")).alias("gap_days"),
        )
        .filter(F.col("gap_days").between(-_DC_WINDOW_DAYS, _DC_WINDOW_DAYS))
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suspect_pairs"),
        F.count_distinct("o_custkey").cast("bigint").alias("n_customers"),
        F.sum("cents").cast("bigint").alias("suspect_cents"),
        F.sum((F.col("gap_days") == 0).cast("int")).cast("bigint").alias("n_same_day"),
    )


# --- q_join_sorted_neighborhood ----------------------------------------------

_SNM_WINDOW = 3   # neighbors compared after each row in sort order
_SNM_MAX_DIST = 5


_SNM_ORACLE = f"""
WITH ranked AS (
  SELECT p_brand, p_name,
         ROW_NUMBER() OVER (
           PARTITION BY p_brand ORDER BY p_name, p_partkey
         ) AS rn
  FROM part
), pairs AS (
  SELECT a.p_brand, levenshtein(a.p_name, b.p_name) AS dist
  FROM ranked a JOIN ranked b
    ON b.p_brand = a.p_brand
   AND b.rn BETWEEN a.rn + 1 AND a.rn + {_SNM_WINDOW}
)
SELECT p_brand, dist, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs WHERE dist <= {_SNM_MAX_DIST}
GROUP BY p_brand, dist
"""


@register("q_join_sorted_neighborhood", oracle=_SNM_ORACLE)
def q_join_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood entity resolution: sort each brand's parts
    by name, compare every row only to its next W={_SNM_WINDOW} neighbors in
    sort order, histogram the edit distances — the OTHER classic ER blocking
    strategy next to key-blocking (q_join_fuzzy): where key blocks can miss
    near-duplicates that disagree on the blocking key, the sliding window
    catches anything lexicographically adjacent, at exactly W comparisons per
    row.

    Scale shape: linear, never quadratic — the candidate generator is
    explode(sequence(rn+1, rn+W)) followed by an EQUI-join on (mfgr, rn), so
    Spark plans a hash join on integer keys, not a range nested loop; the
    window that assigns rn partitions by brand (at 100 TB: by the
    multi-pass sort key of the standard SNM algorithm), so no global sort
    bottleneck. W·n candidate rows, one Levenshtein each.
    """
    part = load(spark, sf_dir, "part")
    ranked = part.select(
        "p_brand",
        "p_name",
        F.row_number()
        .over(Window.partitionBy("p_brand").orderBy("p_name", "p_partkey"))
        .alias("rn"),
    )
    probes = ranked.select(
        F.col("p_brand").alias("ba"),
        F.col("p_name").alias("na"),
        F.explode(
            F.sequence(F.col("rn") + 1, F.col("rn") + _SNM_WINDOW)
        ).alias("target_rn"),
    )
    pairs = probes.join(
        ranked,
        (F.col("p_brand") == F.col("ba")) & (F.col("rn") == F.col("target_rn")),
    ).select("p_brand", F.levenshtein("na", "p_name").alias("dist"))
    return (
        pairs.filter(F.col("dist") <= _SNM_MAX_DIST)
        .groupBy("p_brand", "dist")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )
