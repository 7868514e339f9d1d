"""Scan operators (SURVEY.md §2.1) — the storage read path.

Reference analog: ``genesapi/storage.py (upstream)`` iterates raw cube files
row-at-a-time; here the lake is Parquet and the scan is declarative, so
vectorized decode, column pruning and predicate pushdown come from the data
source V2 + Catalyst. ``q_scan_pruned``'s plan shows ``PushedFilters`` and a
2-column ``ReadSchema`` — verified in tests/test_plans.py.

Scale notes: at 100 TB these same plans prune partitions/row-groups via
min-max stats; nothing below materializes more than the aggregated result.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from genesapi_cli_spark.io import load, spread
from genesapi_cli_spark.registry import dec_sum, oracle_dec_sum, register

_SCAN_ORACLE = f"""
SELECT COUNT(*) AS n_rows, {oracle_dec_sum('l_quantity', 'sum_qty')}
FROM lineitem
"""


@register("q_scan_parquet", oracle=_SCAN_ORACLE)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan + global aggregate over lineitem. The agg collapses to a
    single row; the scan reads only the one referenced column (pruning)."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(F.count(F.lit(1)).alias("n_rows"), dec_sum("l_quantity", "sum_qty"))


_PRUNED_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS n
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
"""


@register("q_scan_pruned", oracle=_PRUNED_ORACLE)
def q_scan_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + predicate pushdown: only (o_orderstatus, o_orderpriority)
    are read, and the equality filter reaches the Parquet scan
    (``PushedFilters: [EqualTo(o_orderstatus,F)]`` — asserted in test_plans)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select("o_orderpriority", "o_orderstatus")
        .filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- q_profile_nulls --------------------------------------------------------

_PROFILE_ORACLE = """
SELECT 'o_orderkey' AS col, COUNT(*) AS n, COUNT(*) - COUNT(o_orderkey) AS n_null,
       COUNT(DISTINCT o_orderkey) AS n_distinct FROM orders
UNION ALL
SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
       COUNT(DISTINCT o_custkey) FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
       COUNT(DISTINCT o_orderstatus) FROM orders
UNION ALL
SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
       COUNT(DISTINCT o_orderpriority) FROM orders
"""


@register("q_profile_nulls", oracle=_PROFILE_ORACLE)
def q_profile_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (count / nulls / distinct per column, long format):
    the first query every pipeline runs against a new table, and the
    recurring data-quality heartbeat afterwards.

    Spark-first: ONE aggregate computes every per-column statistic in a
    single scan (count + count(col) + countDistinct(col) per column ride
    one Expand), then a stack() unpivots to long format — versus the
    oracle's honest N-scan UNION. At 100 TB: one pass, not one per column.
    spread() unlocks core parallelism for the ×(2·cols+1) Expand on the
    local single-row-group files; it no-ops on pre-split cluster inputs.
    """
    orders = spread(load(spark, sf_dir, "orders"))
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"null_{c}"))
        aggs.append(F.countDistinct(c).alias(f"dist_{c}"))
    wide = orders.agg(*aggs)
    stack = ", ".join(f"'{c}', null_{c}, dist_{c}" for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {stack}) AS (col, n_null, n_distinct)", "n"
    ).select("col", "n", "n_null", "n_distinct")


# --- q_quality_rules --------------------------------------------------------

_QUALITY_ORACLE = """
SELECT 'null_custkey' AS rule,
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
FROM orders
UNION ALL
SELECT 'discount_range',
       CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'orphan_lineitems',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
UNION ALL
SELECT 'dup_line_numbers',
       (SELECT CAST(COALESCE(SUM(c - 1), 0) AS BIGINT) FROM (
          SELECT COUNT(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber
        ) WHERE c > 1)
UNION ALL
SELECT 'negative_price',
       CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
"""


@register("q_quality_rules", oracle=_QUALITY_ORACLE)
def q_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based data-quality validation (the expectations/contract check a
    pipeline runs before publishing a table): null keys, out-of-range
    discounts, orphaned fact rows (referential integrity), duplicate
    (order, linenumber) identities, and non-positive prices — one row per
    rule with its violation count.

    Plan shape: ONE lineitem pass serves all four fact rules — a per-order
    aggregate (map-side combined, one Exchange on orderkey) carries the
    row-rule violation counts, the row count, and distinct (order, line)
    identities (dup excess = n_rows − n_distinct_linenumbers, exactly
    Σ(c−1) over duplicated identities); referential integrity falls out of
    the SAME relation by a left join to the order-key set (orphan rows =
    Σ n_rows where no parent matched), so the former four fact scans
    (row rules twice via the shared 1-row aggregate + anti-join + dup
    grouping) become one. The five counts leave one single-row relation,
    exploded into the (rule, n_violations) contract rows.
    """
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")

    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("disc_v"),
        F.sum(F.when(F.col("l_extendedprice") <= 0, 1).otherwise(0))
        .cast("bigint")
        .alias("price_v"),
        F.count_distinct("l_linenumber").cast("bigint").alias("n_ln"),
    )
    null_cust = orders.agg(
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("null_custkey")
    )
    fact = (
        per_order.join(
            orders.select("o_orderkey"),
            per_order.l_orderkey == F.col("o_orderkey"),
            "left",
        )
        .agg(
            F.sum("disc_v").cast("bigint").alias("discount_range"),
            F.sum(F.when(F.col("o_orderkey").isNull(), F.col("n_rows")).otherwise(0))
            .cast("bigint")
            .alias("orphan_lineitems"),
            F.sum(F.col("n_rows") - F.col("n_ln")).cast("bigint").alias("dup_line_numbers"),
            F.sum("price_v").cast("bigint").alias("negative_price"),
        )
        .crossJoin(F.broadcast(null_cust))
    )
    return fact.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(rule).alias("rule"),
                        F.col(rule).alias("n_violations"),
                    )
                    for rule in (
                        "null_custkey",
                        "discount_range",
                        "orphan_lineitems",
                        "dup_line_numbers",
                        "negative_price",
                    )
                ]
            )
        ).alias("e")
    ).select("e.rule", "e.n_violations")


# --- q_quality_freshness (cross-table freshness / staleness audit) -----------

_FRESH_DAY_US = 86_400_000_000

_FRESH_ORACLE = f"""
WITH per_table AS (
  SELECT 'orders' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(MAX(epoch_us(o_orderdate)) AS BIGINT) AS max_us
  FROM orders
  UNION ALL
  SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
         CAST(MAX(epoch_us(l_shipdate)) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'events', CAST(COUNT(*) AS BIGINT),
         CAST(MAX(epoch_us(ts)) AS BIGINT)
  FROM events
), anchor AS (
  SELECT CAST(MAX(max_us) AS BIGINT) AS global_max FROM per_table
)
SELECT p.tbl, p.n_rows, p.max_us,
       CAST((a.global_max - p.max_us) // {_FRESH_DAY_US} AS BIGINT)
         AS staleness_days
FROM per_table p CROSS JOIN anchor a
"""


@register("q_quality_freshness", oracle=_FRESH_ORACLE)
def q_quality_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table freshness audit: each time-bearing table's row count and
    latest timestamp, plus its staleness in whole days behind the freshest
    table — the "is the pipeline still loading" monitor that pages before
    any business metric silently flatlines (companion to q_profile_nulls'
    column-level and q_quality_rules' row-level checks: table-level is the
    third tier of a data-quality stack).

    Scale shape: one MAX/COUNT aggregate per table — map-side partials, a
    3-row union, a single-row broadcast anchor. On a partitioned lake the
    MAX(date) reads partition metadata, not data.
    """
    orders = load(spark, sf_dir, "orders").agg(
        F.lit("orders").alias("tbl"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.max(F.expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))"))
        .cast("bigint")
        .alias("max_us"),
    )
    lineitem = load(spark, sf_dir, "lineitem").agg(
        F.lit("lineitem").alias("tbl"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.max(F.expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))"))
        .cast("bigint")
        .alias("max_us"),
    )
    events = load(spark, sf_dir, "events").agg(
        F.lit("events").alias("tbl"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.max("ts_us").cast("bigint").alias("max_us"),
    )
    per_table = orders.unionByName(lineitem).unionByName(events)
    anchor = per_table.agg(F.max("max_us").cast("bigint").alias("global_max"))
    return per_table.crossJoin(F.broadcast(anchor)).select(
        "tbl",
        "n_rows",
        "max_us",
        F.expr(f"CAST((global_max - max_us) div {_FRESH_DAY_US} AS BIGINT)").alias(
            "staleness_days"
        ),
    )


# --- q_privacy_kanon ---------------------------------------------------------

_KANON_K = 5

_KANON_ORACLE = f"""
WITH qi AS (
  SELECT c_mktsegment AS segment,
         n_name AS nation,
         CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
         c_custkey
  FROM customer JOIN nation ON c_nationkey = n_nationkey
), grp AS (
  SELECT segment, nation, bal_band, CAST(COUNT(*) AS BIGINT) AS grp_size
  FROM qi GROUP BY segment, nation, bal_band
)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN grp_size < {_KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_small_groups,
       CAST(SUM(CASE WHEN grp_size < {_KANON_K} THEN grp_size ELSE 0 END) AS BIGINT)
         AS n_rows_at_risk,
       CAST(MIN(grp_size) AS BIGINT) AS min_group
FROM grp
GROUP BY segment
ORDER BY segment
"""


@register("q_privacy_kanon", oracle=_KANON_ORACLE)
def q_privacy_kanon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (segment, nation,
    account-balance band): a release is k-anonymous when every QI group
    holds ≥ k individuals; this reports, per segment, how many groups fall
    below k=5 and how many rows they expose — the table a data-governance
    review wants BEFORE an analytics extract ships, because "we dropped
    names" is not anonymization when the QI combination is unique.

    Plan: one hash aggregate to QI groups, one rollup over the group
    table; banding the continuous column (floor to $1000) is the standard
    generalization step that makes k-anonymity achievable at all. All
    counts integer-exact.

    At 100 TB the QI aggregate is the only data-sized step (map-side
    combined, low cardinality); suppression/generalization decisions then
    operate on the group table alone."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    qi = cust.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("n_name").alias("nation"),
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
    )
    grp = qi.groupBy("segment", "nation", "bal_band").agg(
        F.count(F.lit(1)).cast("bigint").alias("grp_size")
    )
    small = F.col("grp_size") < _KANON_K
    return (
        grp.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum(F.when(small, 1).otherwise(0)).cast("bigint").alias("n_small_groups"),
            F.sum(F.when(small, F.col("grp_size")).otherwise(0))
            .cast("bigint")
            .alias("n_rows_at_risk"),
            F.min("grp_size").cast("bigint").alias("min_group"),
        )
        .orderBy("segment")
    )


# --- q_quality_fk ------------------------------------------------------------

_FK_ORACLE = """
SELECT * FROM (
  SELECT 'orders.custkey->customer' AS fk_edge,
         CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_child,
         CAST((SELECT COUNT(*) FROM orders o
               WHERE NOT EXISTS (SELECT 1 FROM customer c
                                 WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
           AS n_orphans,
         CAST((SELECT COUNT(*) FROM customer c
               WHERE NOT EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_custkey = c.c_custkey)) AS BIGINT)
           AS n_childless_parents
  UNION ALL
  SELECT 'lineitem.orderkey->orders',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey)),
         (SELECT COUNT(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                            WHERE l.l_orderkey = o.o_orderkey))
  UNION ALL
  SELECT 'lineitem.partkey->part',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM part p
                            WHERE p.p_partkey = l.l_partkey)),
         (SELECT COUNT(*) FROM part p
          WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                            WHERE l.l_partkey = p.p_partkey))
  UNION ALL
  SELECT 'lineitem.suppkey->supplier',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM supplier s
                            WHERE s.s_suppkey = l.l_suppkey)),
         (SELECT COUNT(*) FROM supplier s
          WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                            WHERE l.l_suppkey = s.s_suppkey))
)
ORDER BY fk_edge
"""


@register("q_quality_fk", oracle=_FK_ORACLE)
def q_quality_fk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema's four FK edges:
    orphaned child rows (FK with no parent — corruption) and childless
    parents (dead dimension rows — usually fine, sometimes stale) per
    edge — the first report a warehouse health check produces, and the
    prerequisite for trusting every join in this registry.

    Plan: each direction is an ANTI join (never NOT IN — see
    q_sql_not_in_null for why) counting survivors; parent key sets
    broadcast where small. Four edges = one declarative plan of eight
    anti-join aggregates unioned into the audit table.

    At 100 TB: each anti join shuffles the child once on the FK (or
    broadcasts the parent keyset); the audit is embarrassingly
    edge-parallel."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    supplier = load(spark, sf_dir, "supplier")

    def edge(name, child, ckey, parent, pkey):
        # Round-12 replan (guide §2.3/§2.4): the former shape scanned the
        # child TWICE (bare count + anti-join probe) and the parent twice,
        # through two anti joins and three separate aggregates. Instead,
        # reduce both sides to (key, multiplicity) — partial map-side
        # aggregation shrinks the child to its distinct keys before any
        # exchange — and take ONE full-outer join on the key: orphans are
        # child keys with no parent row, childless parents are parent keys
        # with no child row, and n_child is the multiplicity sum. The two
        # groupBys leave both sides hash-partitioned on the join key, so
        # the join itself adds no exchange. Exact under any key
        # multiplicity on either side (multiplicities ride along).
        ck = child.groupBy(F.col(ckey).alias("k")).agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt")
        )
        pg = parent.groupBy(F.col(pkey).alias("pk")).agg(
            F.count(F.lit(1)).cast("bigint").alias("pcnt")
        )
        j = ck.join(pg, ck.k == pg.pk, "full")
        return j.agg(
            F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("n_child"),
            F.coalesce(
                F.sum(F.when(F.col("pk").isNull(), F.col("cnt"))), F.lit(0)
            )
            .cast("bigint")
            .alias("n_orphans"),
            F.coalesce(
                F.sum(F.when(F.col("k").isNull(), F.col("pcnt"))), F.lit(0)
            )
            .cast("bigint")
            .alias("n_childless_parents"),
        ).select(
            F.lit(name).alias("fk_edge"),
            "n_child",
            "n_orphans",
            "n_childless_parents",
        )

    rows = [
        edge("orders.custkey->customer", orders.select("o_custkey"), "o_custkey",
             customer.select("c_custkey"), "c_custkey"),
        edge("lineitem.orderkey->orders", li.select("l_orderkey"), "l_orderkey",
             orders.select("o_orderkey"), "o_orderkey"),
        edge("lineitem.partkey->part", li.select("l_partkey"), "l_partkey",
             part.select("p_partkey"), "p_partkey"),
        edge("lineitem.suppkey->supplier", li.select("l_suppkey"), "l_suppkey",
             supplier.select("s_suppkey"), "s_suppkey"),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("fk_edge")


# --- q_quality_uniqueness ----------------------------------------------------

_UNIQ_ORACLE = """
SELECT * FROM (
  SELECT 'customer.c_custkey' AS key_claim,
         CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS n_rows,
         CAST((SELECT COUNT(DISTINCT c_custkey) FROM customer) AS BIGINT)
           AS n_distinct,
         CAST((SELECT COUNT(*) FROM customer)
              - (SELECT COUNT(DISTINCT c_custkey) FROM customer) AS BIGINT)
           AS n_violations
  UNION ALL
  SELECT 'orders.o_orderkey',
         (SELECT COUNT(*) FROM orders),
         (SELECT COUNT(DISTINCT o_orderkey) FROM orders),
         (SELECT COUNT(*) FROM orders)
           - (SELECT COUNT(DISTINCT o_orderkey) FROM orders)
  UNION ALL
  SELECT 'lineitem.(orderkey,linenumber)',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber
                                FROM lineitem)),
         (SELECT COUNT(*) FROM lineitem)
           - (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber
                                    FROM lineitem))
  UNION ALL
  SELECT 'events.event_id',
         (SELECT COUNT(*) FROM events),
         (SELECT COUNT(DISTINCT event_id) FROM events),
         (SELECT COUNT(*) FROM events)
           - (SELECT COUNT(DISTINCT event_id) FROM events)
  UNION ALL
  SELECT 'documents.doc_id',
         (SELECT COUNT(*) FROM documents),
         (SELECT COUNT(DISTINCT doc_id) FROM documents),
         (SELECT COUNT(*) FROM documents)
           - (SELECT COUNT(DISTINCT doc_id) FROM documents)
)
ORDER BY key_claim
"""


@register("q_quality_uniqueness", oracle=_UNIQ_ORACLE)
def q_quality_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit: for every claimed key (single-column
    and the composite lineitem key), row count vs distinct count and the
    violation count — the OTHER half of warehouse constraint checking next
    to q_quality_fk (parquet enforces neither, so both audits run in the
    pipeline, not the storage layer).

    Plan: one two-phase distinct aggregate per claimed key, unioned into
    the audit table; the composite key distinct is a hash of both columns,
    never a concatenated string.

    At 100 TB: each distinct is the standard partial-aggregate expand —
    uniform keys by construction, no skew; audits are table-parallel."""
    tables = {
        "customer.c_custkey": (load(spark, sf_dir, "customer"), ["c_custkey"]),
        "orders.o_orderkey": (load(spark, sf_dir, "orders"), ["o_orderkey"]),
        "lineitem.(orderkey,linenumber)": (
            load(spark, sf_dir, "lineitem"),
            ["l_orderkey", "l_linenumber"],
        ),
        "events.event_id": (load(spark, sf_dir, "events"), ["event_id"]),
        "documents.doc_id": (load(spark, sf_dir, "documents"), ["doc_id"]),
    }
    rows = []
    for claim, (df, keys) in tables.items():
        agg = df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count_distinct(*[F.col(k) for k in keys])
            .cast("bigint")
            .alias("n_distinct"),
        ).select(
            F.lit(claim).alias("key_claim"),
            "n_rows",
            "n_distinct",
            (F.col("n_rows") - F.col("n_distinct")).cast("bigint").alias("n_violations"),
        )
        rows.append(agg)
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("key_claim")


# --- q_profile_columns -------------------------------------------------------

_PROFILE_COLS_ORACLE = """
WITH cols AS (
  SELECT 'o_orderstatus' AS col, o_orderstatus AS v FROM orders
  UNION ALL
  SELECT 'o_orderpriority', o_orderpriority FROM orders
  UNION ALL
  SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
), vc AS (
  SELECT col, v, CAST(COUNT(*) AS BIGINT) AS c FROM cols GROUP BY col, v
), tot AS (
  SELECT col, CAST(SUM(c) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         CAST(MAX(c) AS BIGINT) AS top_c,
         CAST(SUM(c * (FLOOR(LN(c) * 1000000 + 0.5))) AS BIGINT) AS s_clnc
  FROM vc GROUP BY col
)
SELECT col, n, n_distinct,
       FLOOR(CAST(top_c AS DOUBLE) / n * 10000 + 0.5) / 10000 AS top_share_r4,
       FLOOR((FLOOR(LN(CAST(n AS DOUBLE)) * 1000000 + 0.5) / 1000000.0
              - CAST(s_clnc AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0))
             * 10000 + 0.5) / 10000 AS entropy_r4
FROM tot
ORDER BY col
"""


@register("q_profile_columns", oracle=_PROFILE_COLS_ORACLE)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level distribution profile (the cardinality companion to
    q_profile_nulls): per column — total, distinct count, top-value share,
    and Shannon entropy of the value distribution. This is the profile a
    catalog/stats service maintains per column: entropy + top-share decide
    dictionary-vs-plain encoding, broadcastability, and whether a column
    can serve as a partition or salt key.

    Plan: the columns unpivot through one UNION of projections (3 narrow
    scans of the same table — at scale a single-scan stack() unpivot; the
    oracle mirrors the union form), then ONE (col, value) aggregate and a
    per-column rollup. Entropy uses the module-standard micro-snapped
    ln(c) integer sums (q_text_entropy's guard: counts repeat heavily, so
    snapping cannot straddle).

    At 100 TB: profile cost ≈ one scan per profiled column batch; the
    (col, value) aggregate inherits value skew — exactly what top_share
    measures."""
    orders = load(spark, sf_dir, "orders")
    cols = (
        orders.select(F.lit("o_orderstatus").alias("col"), F.col("o_orderstatus").alias("v"))
        .unionByName(
            orders.select(
                F.lit("o_orderpriority").alias("col"), F.col("o_orderpriority").alias("v")
            )
        )
        .unionByName(
            orders.select(
                F.lit("o_custkey").alias("col"),
                F.col("o_custkey").cast("string").alias("v"),
            )
        )
    )
    vc = cols.groupBy("col", "v").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    lnc_micro = F.floor(F.log(F.col("c").cast("double")) * 1000000 + F.lit(0.5))
    tot = vc.groupBy("col").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.max("c").cast("bigint").alias("top_c"),
        F.sum(F.col("c") * lnc_micro).cast("bigint").alias("s_clnc"),
    )
    return tot.select(
        "col",
        "n",
        "n_distinct",
        (
            F.floor(F.col("top_c").cast("double") / F.col("n") * 10000 + F.lit(0.5))
            / 10000
        ).alias("top_share_r4"),
        F.expr(
            "FLOOR((FLOOR(LN(CAST(n AS DOUBLE)) * 1000000 + 0.5) / 1000000.0"
            " - CAST(s_clnc AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0))"
            " * 10000 + 0.5) / 10000"
        ).alias("entropy_r4"),
    ).orderBy("col")


# --- q_scan_dpp (dynamic partition pruning certificate) ----------------------

_DPP_PATH = "/tmp/genesapi_spark/dpp_events"

_DPP_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(user_id) AS BIGINT) AS sum_users,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
       TRUE AS dpp_active
FROM events
WHERE length(event_type) = 8
"""


@register("q_scan_dpp", oracle=_DPP_ORACLE)
def q_scan_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC PARTITION PRUNING certificate — the star-schema scale
    feature: a fact table Hive-partitioned on event_type is joined to a
    dimension whose filter (length(event_type) = 8 → 'purchase') is NOT on
    the fact, so static pruning can't fire; Catalyst must inject the dim's
    matched keys as a runtime partition filter (``dynamicpruning``
    subquery on the fact scan) or the join reads every partition. At
    100 TB this is the difference between scanning one date/tenant
    partition and scanning the lake, on every dim-filtered star join.

    The certificate is measured, not asserted: ``dpp_active`` reads the
    prepared physical plan and is pinned TRUE by the oracle (losing DPP —
    a conf regression, a join too small to broadcast, a non-partition
    join key — fails the value hash); the data columns aggregate the
    join result and must match DuckDB filtering the original events, so
    the partitioned relayout and the pruned join are also value-proved.

    Plumbing notes: the dim derives from the original parquet (not the
    partitioned copy) so the pruning subquery cannot be collapsed into a
    static filter; partition values round-trip as strings through the
    Hive layout, which is lossless for this column.
    """
    from genesapi_cli_spark.io import session_nonce

    base = (
        f"{_DPP_PATH}_{os.path.basename(sf_dir.rstrip('/')).replace('.', '_')}"
        f"_{session_nonce(spark)}"
    )
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    ev.write.mode("overwrite").partitionBy("event_type").parquet(base)
    fact = spark.read.parquet(base)
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn("code", F.length("event_type"))
    )
    joined = fact.join(F.broadcast(dim.filter(F.col("code") == 8)), "event_type")
    dpp = "dynamicpruning" in (
        joined._jdf.queryExecution().executedPlan().toString()
    )
    return joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("user_id").cast("bigint").alias("sum_users"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
    ).withColumn("dpp_active", F.lit(dpp))


# --- q_privacy_ldiversity ----------------------------------------------------

_LDIV_L = 3  # require >= 3 distinct sensitive values per QI group

_LDIV_ORACLE = f"""
WITH qi AS (
  SELECT c_mktsegment AS segment,
         n_name AS nation,
         CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
         o_orderpriority AS sensitive
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN orders ON o_custkey = c_custkey
), grp AS (
  SELECT segment, nation, bal_band,
         CAST(COUNT(*) AS BIGINT) AS grp_size,
         CAST(COUNT(DISTINCT sensitive) AS BIGINT) AS l_div,
         CAST(MAX(cnt_top) AS BIGINT) AS top_cnt
  FROM (
    SELECT segment, nation, bal_band, sensitive,
           COUNT(*) OVER (PARTITION BY segment, nation, bal_band, sensitive)
             AS cnt_top
    FROM qi
  )
  GROUP BY segment, nation, bal_band
)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN l_div < {_LDIV_L} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low_diversity,
       CAST(SUM(CASE WHEN l_div < {_LDIV_L} THEN grp_size ELSE 0 END) AS BIGINT)
         AS n_rows_at_risk,
       CAST(MIN(l_div) AS BIGINT) AS min_l,
       CAST(SUM(CASE WHEN top_cnt * 2 > grp_size THEN 1 ELSE 0 END) AS BIGINT)
         AS n_homogeneity_prone
FROM grp
GROUP BY segment
ORDER BY segment
"""


@register("q_privacy_ldiversity", oracle=_LDIV_ORACLE)
def q_privacy_ldiversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-DIVERSITY audit — the attack k-anonymity misses: a QI group can
    be large (k-anonymous, q_privacy_kanon) yet leak the sensitive
    attribute outright when every member SHARES it (homogeneity attack).
    Per quasi-identifier group (segment, nation, balance band) over the
    customer⋈orders release, this reports how many distinct sensitive
    values (order priority) each group carries, flags groups below
    l = {_LDIV_L}, and counts groups where one sensitive value covers a
    strict majority — the probabilistic-inference precursor even when
    l is met. Rolled up per segment like the k-anonymity report so the
    two audits read side by side.

    Scale shape: NO window and no distinct machinery — the fact side is
    reduced before any wide shuffle by a map-side-combined per-(customer,
    sensitive) count (orders collapse to ≤5 narrow rows per customer), and
    the per-(QI, sensitive) counts then stack into the group profile with
    a second hash aggregate: grp_size = Σ cnt, l_div = COUNT(*), top_cnt =
    MAX(cnt). The former Exchange+Sort+Window over the full release (plus
    Catalyst's count_distinct expansion) becomes two ordinary aggregates.
    The nation dim is broadcast; the fact scan is the only large input.
    """
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    per_cs = orders.groupBy("o_custkey", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    qi_counts = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(per_cs, per_cs.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("n_name").alias("nation"),
            F.expr("CAST(FLOOR(c_acctbal / 1000) AS BIGINT)").alias("bal_band"),
            F.col("o_orderpriority").alias("sensitive"),
        )
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    grp = qi_counts.groupBy("segment", "nation", "bal_band").agg(
        F.sum("cnt").cast("bigint").alias("grp_size"),
        F.count(F.lit(1)).cast("bigint").alias("l_div"),
        F.max("cnt").cast("bigint").alias("top_cnt"),
    )
    return (
        grp.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum((F.col("l_div") < _LDIV_L).cast("int"))
            .cast("bigint")
            .alias("n_low_diversity"),
            F.sum(F.when(F.col("l_div") < _LDIV_L, F.col("grp_size")).otherwise(0))
            .cast("bigint")
            .alias("n_rows_at_risk"),
            F.min("l_div").cast("bigint").alias("min_l"),
            F.sum((F.col("top_cnt") * 2 > F.col("grp_size")).cast("int"))
            .cast("bigint")
            .alias("n_homogeneity_prone"),
        )
        .orderBy("segment")
    )


# --- q_privacy_tcloseness ------------------------------------------------------

#: EMD threshold t: a QI group whose ordered-EMD to the global sensitive
#: distribution exceeds 1/5 is flagged (the classic t = 0.2 audit point).
_TCLOSE_NUM, _TCLOSE_DEN = 1, 5

_TCLOSE_ORACLE = f"""
WITH qi AS (
  SELECT c_mktsegment AS segment,
         n_name AS nation,
         CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
         CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS r
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN orders ON o_custkey = c_custkey
), grp AS (
  SELECT segment, nation, bal_band,
         CAST(COUNT(*) AS BIGINT) AS g,
         CAST(SUM(CASE WHEN r <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN r <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
         CAST(SUM(CASE WHEN r <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
         CAST(SUM(CASE WHEN r <= 4 THEN 1 ELSE 0 END) AS BIGINT) AS c4
  FROM qi GROUP BY segment, nation, bal_band
), gall AS (
  SELECT CAST(SUM(g) AS BIGINT) AS n,
         CAST(SUM(c1) AS BIGINT) AS g1, CAST(SUM(c2) AS BIGINT) AS g2,
         CAST(SUM(c3) AS BIGINT) AS g3, CAST(SUM(c4) AS BIGINT) AS g4
  FROM grp
), emd AS (
  SELECT segment, g,
         ABS(c1 * n - g1 * g) + ABS(c2 * n - g2 * g)
           + ABS(c3 * n - g3 * g) + ABS(c4 * n - g4 * g) AS d,
         4 * g * n AS denom
  FROM grp CROSS JOIN gall
)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN d * {_TCLOSE_DEN} > denom * {_TCLOSE_NUM}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_above_t,
       CAST(SUM(CASE WHEN d * {_TCLOSE_DEN} > denom * {_TCLOSE_NUM}
                THEN g ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
       CAST(MAX((20000 * d + denom) // (2 * denom)) AS DOUBLE) / 10000
         AS max_emd_r4
FROM emd
GROUP BY segment
ORDER BY segment
"""


@register("q_privacy_tcloseness", oracle=_TCLOSE_ORACLE)
def q_privacy_tcloseness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-CLOSENESS audit — the attack l-diversity misses: a QI group can
    carry l distinct sensitive values yet still leak when its DISTRIBUTION
    over them diverges from the global one (skewness attack: "3 distinct
    priorities, but 95% URGENT" tells the adversary plenty). Per QI group
    (segment, nation, balance band — same release as q_privacy_kanon /
    q_privacy_ldiversity, so the three audits read as a ladder), this
    measures the Earth Mover's Distance between the group's and the global
    distribution of the ORDERED sensitive attribute (order priority rank
    1..5; ordered EMD = mean |cumulative difference|) and flags groups
    beyond t = 1/5.

    Exactness: EMD is evaluated entirely in int64 cross-multiples —
    D = Σ_{{i<5}} |cum_i·N − G_i·g| over the 4 cut points, the threshold as
    5·D > 4·g·N, and the reported max EMD rounded to 4 decimals by integer
    division — so the oracle matches bit-for-bit with no float tolerance.
    Operand bound: cum_i·N ≤ g·N ≈ 5e12 at sf1 (documented: at ≥1e9 release
    rows switch the cross-multiples to DOUBLE — the audit is a report, not
    an invoice).

    Scale shape: the fact side is REDUCED BEFORE THE SHUFFLE — a map-side-
    combined per-customer aggregate collapses orders to 5 counters per
    customer (guide: aggregate before you shuffle), so the custkey join
    moves one narrow row per customer instead of one per order; the QI
    aggregate then just sums counters. The global distribution is a 1-row
    broadcast re-aggregated FROM the group relation (no second fact scan),
    and the rollup is per-segment. The nation dim is broadcast.
    """
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    r = F.substring("o_orderpriority", 1, 1).cast("bigint")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("g"),
        *[
            F.sum((r <= i).cast("int")).cast("bigint").alias(f"c{i}")
            for i in range(1, 5)
        ],
    )
    grp = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(per_cust, per_cust.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("n_name").alias("nation"),
            F.expr("CAST(FLOOR(c_acctbal / 1000) AS BIGINT)").alias("bal_band"),
        )
        .agg(
            F.sum("g").cast("bigint").alias("g"),
            *[F.sum(f"c{i}").cast("bigint").alias(f"c{i}") for i in range(1, 5)],
        )
        .localCheckpoint(eager=False)
    )
    glob = grp.agg(
        F.sum("g").cast("bigint").alias("n"),
        *[F.sum(f"c{i}").cast("bigint").alias(f"g{i}") for i in range(1, 5)],
    )
    emd = grp.crossJoin(F.broadcast(glob)).select(
        "segment",
        "g",
        sum(
            (F.abs(F.col(f"c{i}") * F.col("n") - F.col(f"g{i}") * F.col("g")))
            for i in range(1, 5)
        ).alias("d"),
        (F.lit(4) * F.col("g") * F.col("n")).alias("denom"),
    )
    above = F.col("d") * _TCLOSE_DEN > F.col("denom") * _TCLOSE_NUM
    return (
        emd.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum(above.cast("int")).cast("bigint").alias("n_above_t"),
            F.sum(F.when(above, F.col("g")).otherwise(0))
            .cast("bigint")
            .alias("n_rows_at_risk"),
            (
                F.max(
                    F.expr("(20000 * d + denom) DIV (2 * denom)")
                ).cast("double")
                / 10000
            ).alias("max_emd_r4"),
        )
        .orderBy("segment")
    )


# --- q_quality_psi (population-stability drift certificate) -------------------

_PSI_ORACLE = """
WITH ev AS (
  SELECT event_type,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
         epoch_us(ts) AS t_us
  FROM events
), mid AS (
  SELECT (MIN(t_us) + MAX(t_us)) // 2 AS mid_us FROM ev
), spans AS (
  SELECT event_type, MIN(cents) AS mn_c, MAX(cents) AS mx_c
  FROM ev GROUP BY event_type
), binned AS (
  SELECT e.event_type,
         (e.cents - s.mn_c) * 10 // (s.mx_c - s.mn_c + 1) AS bin,
         CASE WHEN e.t_us <= m.mid_us THEN 1 ELSE 0 END AS is_ref
  FROM ev e JOIN spans s USING (event_type) CROSS JOIN mid m
), bc AS (
  SELECT event_type, bin,
         CAST(SUM(is_ref) AS BIGINT) AS c_ref,
         CAST(SUM(1 - is_ref) AS BIGINT) AS c_cur
  FROM binned GROUP BY event_type, bin
), tot AS (
  SELECT event_type, bin, c_ref, c_cur,
         SUM(c_ref) OVER (PARTITION BY event_type) AS n_ref,
         SUM(c_cur) OVER (PARTITION BY event_type) AS n_cur
  FROM bc
), sh AS (
  SELECT event_type, n_ref, n_cur,
         (2 * c_ref * 1000000 + n_ref) // (2 * n_ref) AS s_ref,
         (2 * c_cur * 1000000 + n_cur) // (2 * n_cur) AS s_cur
  FROM tot
), terms AS (
  SELECT event_type, n_ref, n_cur,
         (s_ref - s_cur)
           * (CAST(FLOOR(LN(CAST(GREATEST(s_ref, 1) AS DOUBLE)) * 1000000 + 0.5)
                   AS BIGINT)
              - CAST(FLOOR(LN(CAST(GREATEST(s_cur, 1) AS DOUBLE)) * 1000000 + 0.5)
                     AS BIGINT)) AS term
  FROM sh
)
SELECT event_type,
       CAST(MAX(n_ref) AS BIGINT) AS n_ref,
       CAST(MAX(n_cur) AS BIGINT) AS n_cur,
       CAST((2 * SUM(term) + 100000000) // 200000000 AS DOUBLE) / 10000 AS psi_r4,
       ((2 * SUM(term) + 100000000) // 200000000) >= 1000 AS drifted
FROM terms
GROUP BY event_type
ORDER BY event_type
"""


@register("q_quality_psi", oracle=_PSI_ORACLE)
def q_quality_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POPULATION STABILITY INDEX drift monitor — the industry-standard
    binned drift score every feature-store / model-monitoring pipeline
    computes: per event_type, the value distribution of the FIRST half of
    the time range (reference) is compared to the SECOND half (current)
    over 10 equal-width bins, PSI = Σ_bins (p_i − q_i)·ln(p_i/q_i), with
    the conventional read: < 0.1 stable, ≥ 0.1 drifting (the pinned flag).
    Complements q_text_kl_drift (token drift) and q_events_ks (two-sample
    CDF distance) with the fixed-bin mergeable form monitoring jobs
    actually ship.

    Exactness (cross-engine bit-match with ln in play): shares are snapped
    to integer MICRO-shares s = round(c·1e6/n) by integer division, ln is
    taken only of those integers and micro-snapped (the q_text_entropy
    idiom), so each bin's term is the int64 product (s_p−s_q)·Δln_micro ≤
    1.4e13 — SCALE-FREE bounds (shares, not counts), no overflow at any
    corpus size — and the final PSI rounds to 4 decimals by integer
    division. Zero-count bins take the s_eff = max(s,1) Laplace floor on
    the ln side only.

    Scale shape: TWO column-pruned fact scans, nothing materialized — one
    per-type stats aggregate carries the value spans AND the per-type time
    extrema (the global midpoint folds out of those extrema, so the former
    separate 1-row pass is free), broadcast back onto the binning scan
    that feeds the (type, bin) hash aggregate with map-side combine (the
    mergeable sketch: 10 counters per type per period). The previous shape
    localCheckpointed the whole projected fact relation to serve three
    consumers — a full materialization that two direct scans beat at any
    scale. At 100 TB the per-type daily PSI is the same plan with a date
    bucket added to the group key.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
        F.col("ts_us").alias("t_us"),
    )
    stats = (
        ev.groupBy("event_type")
        .agg(
            F.min("cents").alias("mn_c"),
            F.max("cents").alias("mx_c"),
            F.min("t_us").alias("mn_t"),
            F.max("t_us").alias("mx_t"),
        )
        .localCheckpoint(eager=False)  # |types| rows; feeds spans AND mid
    )
    mid = stats.agg(
        ((F.min("mn_t") + F.max("mx_t")) / 2).cast("bigint").alias("mid_us")
    )
    binned = (
        ev.join(F.broadcast(stats.select("event_type", "mn_c", "mx_c")), "event_type")
        .crossJoin(F.broadcast(mid))
        .select(
            "event_type",
            F.expr("(cents - mn_c) * 10 DIV (mx_c - mn_c + 1)").alias("bin"),
            (F.col("t_us") <= F.col("mid_us")).cast("int").alias("is_ref"),
        )
    )
    bc = binned.groupBy("event_type", "bin").agg(
        F.sum("is_ref").cast("bigint").alias("c_ref"),
        F.sum(F.lit(1) - F.col("is_ref")).cast("bigint").alias("c_cur"),
    )
    w = Window.partitionBy("event_type")
    snap = lambda c: F.floor(  # noqa: E731 — the module-standard ln snap
        F.log(F.greatest(c, F.lit(1)).cast("double")) * 1000000 + F.lit(0.5)
    ).cast("bigint")
    sh = bc.select(
        "event_type",
        F.sum("c_ref").over(w).alias("n_ref"),
        F.sum("c_cur").over(w).alias("n_cur"),
        F.expr(
            "(2 * c_ref * 1000000 + SUM(c_ref) OVER (PARTITION BY event_type))"
            " DIV (2 * SUM(c_ref) OVER (PARTITION BY event_type))"
        ).alias("s_ref"),
        F.expr(
            "(2 * c_cur * 1000000 + SUM(c_cur) OVER (PARTITION BY event_type))"
            " DIV (2 * SUM(c_cur) OVER (PARTITION BY event_type))"
        ).alias("s_cur"),
    )
    terms = sh.select(
        "event_type",
        "n_ref",
        "n_cur",
        (
            (F.col("s_ref") - F.col("s_cur"))
            * (snap(F.col("s_ref")) - snap(F.col("s_cur")))
        ).alias("term"),
    )
    r4i = F.expr("(2 * SUM(term) + 100000000) DIV 200000000")
    return (
        terms.groupBy("event_type")
        .agg(
            F.max("n_ref").cast("bigint").alias("n_ref"),
            F.max("n_cur").cast("bigint").alias("n_cur"),
            (r4i.cast("double") / 10000).alias("psi_r4"),
            (r4i >= 1000).alias("drifted"),
        )
        .orderBy("event_type")
    )


# --- q_privacy_dp_counts ----------------------------------------------------

_DP_ORACLE = """
WITH g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_true
  FROM events GROUP BY event_type
), u AS (
  SELECT event_type, n_true,
         (CAST(('0x' || substr(sha256(event_type || '|dp'), 1, 8))::BIGINT
               % 1000000 AS DOUBLE) + 0.5) / 1000000 - 0.5 AS uni
  FROM g
)
SELECT event_type, n_true,
       FLOOR((CASE WHEN uni < 0 THEN 1.0 ELSE -1.0 END)
             * LN(1 - 2 * abs(uni)) * 10000 + 0.5) / 10000 AS noise_r,
       CAST(n_true AS DOUBLE)
         + FLOOR((CASE WHEN uni < 0 THEN 1.0 ELSE -1.0 END)
                 * LN(1 - 2 * abs(uni)) * 10000 + 0.5) / 10000 AS noisy
FROM u
"""


@register("q_privacy_dp_counts", oracle=_DP_ORACLE)
def q_privacy_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy mechanism plumbing: per-group counts with
    Laplace(1/ε) noise at ε=1 via inverse-CDF sampling — noise =
    -sign(u)·ln(1-2|u|) for u uniform in (-1/2, 1/2) — completing the
    privacy ladder (k-anonymity → l-diversity → t-closeness → DP release).
    The uniform draw is SEEDED from a salted hash of the group key, so the
    release is a pure function of the data: reproducible across engines,
    runs, and partition layouts (true DP would use a fresh secret seed per
    release; the mechanism shape, calibration, and plumbing are identical).
    The true count rides along as the utility-error certificate of this
    mechanism test harness — a production release would drop it.

    Parity: the hash→uniform map is exact integer arithmetic (60-bit sha256
    prefix mod 1e6, +0.5 symmetrizer); the single LN is last-ulp-rounded by
    r4 before adding to the exact count.

    Scale shape: one hash aggregate + per-row scalar math on the tiny group
    relation. DP releases over 100 TB cost exactly the underlying GROUP BY.
    """
    ev = load(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("n_true"))
    hv = F.conv(
        F.substring(F.sha2(F.concat(F.col("event_type"), F.lit("|dp")), 256), 1, 8),
        16,
        10,
    ).cast("long")
    uni = ((hv % 1000000).cast("double") + F.lit(0.5)) / 1000000 - F.lit(0.5)
    noise = (
        F.when(uni < 0, F.lit(1.0)).otherwise(F.lit(-1.0))
        * F.log(F.lit(1) - 2 * F.abs(uni))
    )
    noise_r = F.floor(noise * 10000 + F.lit(0.5)) / 10000
    return g.select(
        "event_type",
        "n_true",
        noise_r.alias("noise_r"),
        (F.col("n_true").cast("double") + noise_r).alias("noisy"),
    )


# --- q_profile_join_cardinality ---------------------------------------------

_JOINCARD_ORACLE = """
WITH h1 AS (
  SELECT o_custkey % 64 AS b, CAST(COUNT(*) AS BIGINT) AS c1,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS d1
  FROM orders GROUP BY b
), h2 AS (
  SELECT c_custkey % 64 AS b, CAST(COUNT(*) AS BIGINT) AS c2,
         CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS d2
  FROM customer WHERE c_mktsegment = 'BUILDING' GROUP BY b
), est AS (
  SELECT CAST(SUM((c1 * c2) // (CASE WHEN d1 > d2 THEN d1 ELSE d2 END))
              AS BIGINT) AS est_rows,
         CAST(COUNT(*) AS BIGINT) AS n_buckets
  FROM h1 JOIN h2 USING (b)
), act AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS actual_rows
  FROM orders o JOIN customer c
    ON o.o_custkey = c.c_custkey AND c.c_mktsegment = 'BUILDING'
)
SELECT e.n_buckets, e.est_rows, a.actual_rows,
       CAST((CASE WHEN e.est_rows > a.actual_rows
                  THEN e.est_rows - a.actual_rows
                  ELSE a.actual_rows - e.est_rows END) * 1000000
            // a.actual_rows AS BIGINT) AS abs_err_micro
FROM est e CROSS JOIN act a
"""


@register("q_profile_join_cardinality", oracle=_JOINCARD_ORACLE)
def q_profile_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-based join-cardinality estimation — the query-optimizer
    statistic, surfaced as a data-profiling certificate: estimate
    |orders ⋈ customer(BUILDING)| from 64-bucket equi-hash histograms of
    each side under the per-bucket uniformity assumption
    (Σ_b c1·c2 / max(d1, d2) — the textbook formula Catalyst/CBO uses),
    then measure it against the true join count. Pipelines run this to
    decide broadcast-vs-shuffle and to validate that collected stats are
    fresh enough to trust.

    Exactness: all counts are integers; the estimator divides positive
    integers (``div`` == ``//``), and the error is an absolute integer
    micro-ratio — bit-exact across engines.

    Scale shape: each histogram is one hash aggregate (64 groups); the
    estimate joins two 64-row relations. The actual-count join is the
    expensive branch by design — it is the ground truth the certificate
    exists to compare against (and the thing you would NOT run at 100 TB;
    the histogram side costs one aggregate per table).
    """
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    h1 = orders.groupBy((F.col("o_custkey") % 64).alias("b")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c1"),
        F.countDistinct("o_custkey").cast("bigint").alias("d1"),
    )
    h2 = cust.groupBy((F.col("c_custkey") % 64).alias("b")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c2"),
        F.countDistinct("c_custkey").cast("bigint").alias("d2"),
    )
    est = (
        h1.join(h2, "b")
        .agg(
            F.expr(
                "cast(sum((c1 * c2) div (case when d1 > d2 then d1 else d2 end))"
                " as bigint)"
            ).alias("est_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        )
    )
    act = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("actual_rows"))
    )
    return (
        est.crossJoin(F.broadcast(act)).select(
            "n_buckets",
            "est_rows",
            "actual_rows",
            F.expr(
                "cast((case when est_rows > actual_rows"
                " then est_rows - actual_rows"
                " else actual_rows - est_rows end) * 1000000"
                " div actual_rows as bigint)"
            ).alias("abs_err_micro"),
        )
    )


# --- q_privacy_generalize -----------------------------------------------------

_GEN_K = 50  # minimum group size a released key must reach


_GENERALIZE_ORACLE = f"""
WITH nat AS (
  SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_nat
  FROM customer GROUP BY c_nationkey
), reg AS (
  SELECT n.n_regionkey AS rk, r.r_name AS region_name,
         CAST(SUM(nat.n_nat) AS BIGINT) AS n_reg
  FROM nat JOIN nation n ON n.n_nationkey = nat.nk
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY n.n_regionkey, r.r_name
), tot AS (
  SELECT CAST(SUM(n_nat) AS BIGINT) AS n_all FROM nat
)
SELECT nat.nk AS nationkey, nat.n_nat AS n,
       CASE WHEN nat.n_nat >= {_GEN_K} THEN 'nation'
            WHEN reg.n_reg >= {_GEN_K} THEN 'region'
            ELSE 'all' END AS level,
       CASE WHEN nat.n_nat >= {_GEN_K} THEN CAST(nat.nk AS VARCHAR)
            WHEN reg.n_reg >= {_GEN_K} THEN reg.region_name
            ELSE '*' END AS released_key,
       CASE WHEN nat.n_nat >= {_GEN_K} THEN nat.n_nat
            WHEN reg.n_reg >= {_GEN_K} THEN reg.n_reg
            ELSE tot.n_all END AS released_group_size
FROM nat
JOIN nation n ON n.n_nationkey = nat.nk
JOIN reg ON reg.rk = n.n_regionkey, tot
"""


@register("q_privacy_generalize", oracle=_GENERALIZE_ORACLE)
def q_privacy_generalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalization-hierarchy k-anonymization (the Mondrani/Datafly move
    q_privacy_kanon only audits): for every nation, walk the QI hierarchy
    nation → region → '*' and release the FIRST level whose group reaches
    k={_GEN_K} individuals, reporting the chosen level, the released key, and
    the group size the release actually provides. Small nations coarsen to
    their region; small regions suppress entirely — minimal information loss
    subject to the k floor, per group.

    Scale shape: three aggregates over progressively coarser keys (nation,
    region, global), each with map-side combine, composed with broadcast
    joins on the tiny dimension tables; the level decision is a stateless
    CASE projection. At 100 TB the hierarchy deepens (zip → city → state →
    country) but stays a chain of shrinking aggregates — no per-row
    iteration, no data-dependent recursion.
    """
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk2"), F.col("n_regionkey").alias("rk2")
    )
    region = load(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("rk3"), F.col("r_name").alias("region_name")
    )
    nat = cust.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    reg = (
        nat.join(F.broadcast(nation), F.col("nationkey") == F.col("nk2"))
        .join(F.broadcast(region), F.col("rk2") == F.col("rk3"))
        .groupBy("rk2", "region_name")
        .agg(F.sum("n").cast("bigint").alias("n_reg"))
    )
    tot = nat.agg(F.sum("n").cast("bigint").alias("n_all"))
    joined = (
        nat.join(F.broadcast(nation), F.col("nationkey") == F.col("nk2"))
        .join(F.broadcast(reg), "rk2")
        .crossJoin(F.broadcast(tot))
    )
    at_nation = F.col("n") >= _GEN_K
    at_region = F.col("n_reg") >= _GEN_K
    return joined.select(
        "nationkey",
        "n",
        F.when(at_nation, "nation")
        .when(at_region, "region")
        .otherwise("all")
        .alias("level"),
        F.when(at_nation, F.col("nationkey").cast("string"))
        .when(at_region, F.col("region_name"))
        .otherwise("*")
        .alias("released_key"),
        F.when(at_nation, F.col("n"))
        .when(at_region, F.col("n_reg"))
        .otherwise(F.col("n_all"))
        .cast("bigint")
        .alias("released_group_size"),
    )


# --- q_privacy_synth_marginals --------------------------------------------------

_SYNTH_ORACLE = """
WITH real_ AS (
  SELECT c_mktsegment AS segment, c_nationkey AS nationkey,
         CAST(COUNT(*) AS BIGINT) AS n_real
  FROM customer GROUP BY segment, nationkey
), rm AS (
  SELECT segment, CAST(SUM(n_real) AS BIGINT) AS row_m FROM real_
  GROUP BY segment
), cm AS (
  SELECT nationkey, CAST(SUM(n_real) AS BIGINT) AS col_m FROM real_
  GROUP BY nationkey
), tot AS (
  SELECT CAST(SUM(n_real) AS BIGINT) AS n FROM real_
), synth AS (
  SELECT rm.segment, cm.nationkey,
         CAST(FLOOR(CAST(rm.row_m AS DOUBLE) * cm.col_m / tot.n + 0.5)
              AS BIGINT) AS n_synth
  FROM rm CROSS JOIN cm CROSS JOIN tot
)
SELECT s.segment,
       CAST(SUM(s.n_synth) AS BIGINT) AS synth_row_total,
       MAX(rm.row_m) AS real_row_total,
       CAST(SUM(ABS(s.n_synth - COALESCE(r.n_real, 0))) AS BIGINT)
         AS l1_cell_error
FROM synth s
JOIN rm ON rm.segment = s.segment
LEFT JOIN real_ r
  ON r.segment = s.segment AND r.nationkey = s.nationkey
GROUP BY s.segment
"""


@register("q_privacy_synth_marginals", oracle=_SYNTH_ORACLE)
def q_privacy_synth_marginals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marginal-preserving synthetic contingency table (the independence
    baseline of privacy-preserving synthesis, one IPF round): release
    synth(seg, nation) = round(row_marginal · col_marginal / N) instead of
    the real cell counts — individuals are never released, only the two
    1-way marginals the synthesizer fits. The certificate reports, per
    segment, how far the synthetic row total drifts from the real marginal
    (rounding residue only) and the L1 cell error — the utility-vs-privacy
    number a release review reads next to q_privacy_kanon.

    Parity: marginals are exact integers; each synthetic cell is ONE
    round-half-up of an exact-integer ratio — identical on both engines.

    Scale shape: two marginal aggregates + a |segments|×|nations| broadcast
    cross of the tiny marginal relations; the real table is scanned once.
    At 100 TB synthesis fits higher-order marginals the same way — shrinking
    aggregates crossed back, never row-level generation on the driver.
    """
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nationkey"),
    )
    real = cust.groupBy("segment", "nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_real")
    )
    rm = real.groupBy("segment").agg(F.sum("n_real").cast("bigint").alias("row_m"))
    cm = real.groupBy("nationkey").agg(
        F.sum("n_real").cast("bigint").alias("col_m")
    )
    tot = real.agg(F.sum("n_real").cast("bigint").alias("n"))
    synth = (
        rm.crossJoin(F.broadcast(cm))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("segment").alias("s_segment"),
            F.col("nationkey").alias("s_nationkey"),
            "row_m",
            F.floor(
                F.col("row_m").cast("double") * F.col("col_m") / F.col("n")
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("n_synth"),
        )
    )
    return (
        synth.join(
            real,
            (F.col("s_segment") == F.col("segment"))
            & (F.col("s_nationkey") == F.col("nationkey")),
            "left",
        )
        .groupBy(F.col("s_segment").alias("segment"))
        .agg(
            F.sum("n_synth").cast("bigint").alias("synth_row_total"),
            F.max("row_m").cast("bigint").alias("real_row_total"),
            F.sum(F.abs(F.col("n_synth") - F.coalesce(F.col("n_real"), F.lit(0))))
            .cast("bigint")
            .alias("l1_cell_error"),
        )
    )


# --- q_agg_raking ---------------------------------------------------------------

_RAKE_ORACLE = """
WITH cell AS (
  SELECT c_mktsegment AS seg, c_nationkey % 5 AS ng,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM customer GROUP BY seg, ng
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nn,
         CAST(COUNT(DISTINCT seg) AS BIGINT) AS ks,
         CAST(COUNT(DISTINCT ng) AS BIGINT) AS kn
  FROM cell
), r1 AS (
  -- round 1: scale rows so every segment marginal hits the uniform target
  SELECT seg, ng, n,
         CAST(FLOOR(n * (CAST(nn AS DOUBLE) / ks)
                    / SUM(n) OVER (PARTITION BY seg) * 1000000 + 0.5)
              AS BIGINT) AS w1_micro
  FROM cell, tot
), r2 AS (
  -- round 2: scale columns so every nation-group marginal hits its target
  SELECT seg, ng, n,
         CAST(FLOOR(w1_micro * (CAST(nn AS DOUBLE) / kn)
                    / (SUM(w1_micro) OVER (PARTITION BY ng) / 1000000.0)
                    / 1000000.0 * 1000000 + 0.5) AS BIGINT) AS w2_micro
  FROM r1, tot
), seg_err AS (
  SELECT seg,
         ABS(SUM(w2_micro) - (SELECT CAST(FLOOR(CAST(nn AS DOUBLE) / ks
                                              * 1000000 + 0.5) AS BIGINT)
                              FROM tot)) AS err
  FROM r2 GROUP BY seg
)
SELECT CAST((SELECT COUNT(*) FROM cell) AS BIGINT) AS n_cells,
       CAST((SELECT MAX(err) FROM seg_err) AS BIGINT) AS max_seg_err_micro,
       CAST(SUM(w2_micro) AS BIGINT) AS total_weight_micro,
       CAST(SUM(n) AS BIGINT) AS n_customers
FROM r2
"""


@register("q_agg_raking", oracle=_RAKE_ORACLE)
def q_agg_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survey raking (iterative proportional fitting, 2 unrolled rounds):
    adjust the (segment × nation-group) cell weights so both marginals
    approach uniform targets — row-scale then column-scale, the weighting
    step every survey/calibration pipeline runs when the sample's mix
    disagrees with the population's. Round 2's residual segment-marginal
    error is the convergence certificate (raking converges geometrically;
    one more round per remaining digit).

    Parity: cell counts are exact integers; each round's scale factor is a
    ratio of exact values and the resulting weight SNAPS to integer micros
    before the next round consumes it — both engines iterate identical
    integers, the q_sim_mmr discipline applied to IPF.

    Scale shape: cells aggregate once (map-side combined); each raking round
    is one window-sum over the tiny cell relation (|segments|×|groups| rows)
    — at 100 TB with high-cardinality margins the windows become joins
    against marginal tables, same algebra.
    """
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg"),
        (F.col("c_nationkey") % 5).alias("ng"),
    )
    cell = cust.groupBy("seg", "ng").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = cell.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.countDistinct("seg").cast("bigint").alias("ks"),
        F.countDistinct("ng").cast("bigint").alias("kn"),
    )
    ws = Window.partitionBy("seg")
    wn = Window.partitionBy("ng")
    r1 = cell.crossJoin(F.broadcast(tot)).select(
        "seg",
        "ng",
        "n",
        "nn",
        "ks",
        "kn",
        F.floor(
            F.col("n")
            * (F.col("nn").cast("double") / F.col("ks"))
            / F.sum("n").over(ws)
            * 1000000
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("w1_micro"),
    )
    r2 = r1.select(
        "seg",
        "ng",
        "n",
        "nn",
        "ks",
        F.floor(
            F.col("w1_micro")
            * (F.col("nn").cast("double") / F.col("kn"))
            / (F.sum("w1_micro").over(wn) / 1000000.0)
            / 1000000.0
            * 1000000
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("w2_micro"),
    )
    target = F.floor(
        F.col("nn").cast("double") / F.col("ks") * 1000000 + F.lit(0.5)
    ).cast("bigint")
    # Per-segment residual as ONE MORE window over the seg partitioning the
    # rounds already shuffle on, then a single global reduction — the old
    # three-branch formulation (seg_err agg + summary agg + crossJoin)
    # recomputed the whole scan→window chain once per branch.
    with_err = r2.select(
        "n",
        "w2_micro",
        F.abs(F.sum("w2_micro").over(ws) - target).alias("seg_err"),
    )
    return with_err.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.max("seg_err").cast("bigint").alias("max_seg_err_micro"),
        F.sum("w2_micro").cast("bigint").alias("total_weight_micro"),
        F.sum("n").cast("bigint").alias("n_customers"),
    ).select("n_cells", "max_seg_err_micro", "total_weight_micro", "n_customers")


# --- q_scan_skew_profile ---------------------------------------------------------

#: a key is flagged for salting when its hottest value carries more than
#: this multiple of the uniform per-key share
_SKEW_FLAG_FACTOR = 4

_SKEW_ORACLE = f"""
WITH longk AS (
  SELECT 'l_orderkey' AS key_col, l_orderkey AS key_val FROM lineitem
  UNION ALL
  SELECT 'l_partkey', l_partkey FROM lineitem
  UNION ALL
  SELECT 'l_suppkey', l_suppkey FROM lineitem
), per_val AS (
  SELECT key_col, key_val, CAST(COUNT(*) AS BIGINT) AS c
  FROM longk GROUP BY key_col, key_val
)
SELECT key_col,
       CAST(SUM(c) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(MAX(c) AS BIGINT) AS max_key_rows,
       CAST(FLOOR(CAST(MAX(c) AS DOUBLE) * COUNT(*) / SUM(c)
                  * 1000000 + 0.5) AS BIGINT) AS skew_factor_micro,
       MAX(c) * COUNT(*) > {_SKEW_FLAG_FACTOR} * SUM(c) AS needs_salting
FROM per_val
GROUP BY key_col
ORDER BY key_col
"""


@register("q_scan_skew_profile", oracle=_SKEW_ORACLE)
def q_scan_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile of the fact table — the pre-flight diagnostic
    that decides WHICH keys get the q_join_skew_salted treatment before a
    100 TB run: per candidate shuffle key, the row count, distinct count,
    hottest-key row count, and the skew factor (hottest key's share as a
    multiple of the uniform share; > 4x flags the key for salting or AQE
    skew-join). This is the measured counterpart to the skew REMEDIES the
    repo already ships (q_join_skew_salted, q_agg_salted) — remedies
    without a detector get applied to the wrong keys.

    Parity: pure integer counting; the skew factor is one micro-snapped
    double from three exact bigints; the flag compares integers
    cross-multiplied (no ratio).

    Scale shape: one in-row stack of the key columns (no extra scans — a
    single pass reads all three), one (key, value) hash aggregate with
    map-side combine — the same relation a shuffle would build anyway —
    and a 3-row rollup. At 100 TB this runs as the cheap profiling pass
    ahead of a join campaign, or incrementally per partition."""
    li = load(spark, sf_dir, "lineitem")
    # Tag keys with a TINYINT, not their name string: the per-value
    # aggregate's group key and shuffle rows carry the tag 180M times at
    # sf10 (stack triples the fact), and an int tag cuts those bytes ~40%
    # vs a repeated string — names re-attach to the 3-ROW rollup at the
    # end, where they are free (round-8 sf10 rehearsal).
    longk = li.selectExpr(
        "stack(3, CAST(1 AS TINYINT), l_orderkey, CAST(2 AS TINYINT),"
        " l_partkey, CAST(3 AS TINYINT), l_suppkey) AS (key_tag, key_val)"
    )
    per_val = longk.groupBy("key_tag", "key_val").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    key_names = F.array(
        F.lit("l_orderkey"), F.lit("l_partkey"), F.lit("l_suppkey")
    )
    return (
        per_val.groupBy("key_tag")
        .agg(
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            F.max("c").cast("bigint").alias("max_key_rows"),
            F.floor(
                F.max("c").cast("double")
                * F.count(F.lit(1))
                / F.sum("c")
                * 1000000
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("skew_factor_micro"),
            (
                F.max("c") * F.count(F.lit(1))
                > _SKEW_FLAG_FACTOR * F.sum("c")
            ).alias("needs_salting"),
        )
        .select(
            F.element_at(key_names, F.col("key_tag").cast("int")).alias(
                "key_col"
            ),
            "n_rows",
            "n_distinct",
            "max_key_rows",
            "skew_factor_micro",
            "needs_salting",
        )
        .orderBy("key_col")
    )
