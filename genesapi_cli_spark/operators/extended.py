"""Extended relational surface: subqueries, unpivot, distribution windows,
exact percentiles, ordered string aggregation, deterministic sampling.

These close out the long tail of query shapes a reference user would expect
from a general engine (SURVEY.md §2 conventions apply: aliased columns,
r4 rounding, tie-free ordering). Each is idiomatic Catalyst surface — the
subquery forms specifically exercise Spark's subquery decorrelation rather
than hand-written join rewrites.

Scale notes:
- scalar/correlated subqueries decorrelate to broadcast/shuffle joins in the
  physical plan (verify with .explain: no iterative execution exists).
- the hash-sample is the 100 TB sampling pattern: a deterministic pure-column
  predicate (sha256 prefix mod k) that pushes into the scan, samples the SAME
  rows on every engine and every run, and needs no global state — unlike
  TABLESAMPLE, which is engine- and run-dependent.
- string_agg materializes per-group lists: bounded by group cardinality
  (regions×nations here); at scale cap list length or pre-aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from genesapi_cli_spark.io import load, spread
from genesapi_cli_spark.registry import DEC, oracle_r4, r4, register

# --- q_subquery_scalar ------------------------------------------------------

_SUBQ_SCALAR_ORACLE = """
SELECT o_orderstatus,
       COUNT(*) AS n_above_avg,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,7))) AS DOUBLE) AS sum_above
FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
GROUP BY o_orderstatus
"""


@register("q_subquery_scalar", oracle=_SUBQ_SCALAR_ORACLE)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: orders above the global average price.
    Written as SQL so Catalyst's scalar-subquery planning (subquery → 1-row
    broadcast) is what executes — not a hand-rolled crossJoin."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               COUNT(*) AS n_above_avg,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,7))) AS DOUBLE) AS sum_above
        FROM v_orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM v_orders)
        GROUP BY o_orderstatus
        """
    )


# --- q_subquery_correlated --------------------------------------------------

_SUBQ_CORR_ORACLE = """
SELECT c_nationkey, COUNT(*) AS n_rich
FROM customer c
WHERE c_acctbal > (
  SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey
)
GROUP BY c_nationkey
"""


@register("q_subquery_correlated", oracle=_SUBQ_CORR_ORACLE)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: customers above their nation's average
    balance. Catalyst decorrelates this to an aggregate + equi-join — there
    is no per-row re-execution (check .explain: one shuffle on nationkey)."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        SELECT c_nationkey, COUNT(*) AS n_rich
        FROM v_customer c
        WHERE c_acctbal > (
          SELECT AVG(c2.c_acctbal) FROM v_customer c2
          WHERE c2.c_nationkey = c.c_nationkey
        )
        GROUP BY c_nationkey
        """
    )


# --- q_unpivot --------------------------------------------------------------

_UNPIVOT_ORACLE = """
WITH wide AS (
  SELECT l_returnflag,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,7))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,7))) AS DOUBLE) AS sum_price,
         CAST(SUM(CAST(l_discount AS DECIMAL(18,7))) AS DOUBLE) AS sum_disc
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, measure, value FROM (
  SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM wide
  UNION ALL
  SELECT l_returnflag, 'sum_price', sum_price FROM wide
  UNION ALL
  SELECT l_returnflag, 'sum_disc', sum_disc FROM wide
)
"""


@register("q_unpivot", oracle=_UNPIVOT_ORACLE)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (the inverse of q_genesis_pivot, i.e. the EAV shape
    GENESIS facts natively have): per-returnflag measure columns melted to
    (key, measure, value) rows via DataFrame.unpivot.

    spread(): the local single-row-group parquet would otherwise run the
    three decimal-sum partials on ONE core; one small shuffle parallelizes
    the heavy aggregate (no-op on pre-split cluster inputs)."""
    li = spread(load(spark, sf_dir, "lineitem"), "l_orderkey")
    wide = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,7)")).cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,7)")).cast("double").alias("sum_price"),
        F.sum(F.col("l_discount").cast("decimal(18,7)")).cast("double").alias("sum_disc"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "sum_disc"],
        variableColumnName="measure",
        valueColumnName="value",
    )


# --- q_window_ntile ---------------------------------------------------------

_NTILE_ORACLE = f"""
WITH w AS (
  SELECT c_nationkey, c_custkey,
         NTILE(4) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) AS quartile,
         PERCENT_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) AS pr,
         CUME_DIST() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) AS cd
  FROM customer
)
SELECT c_nationkey, quartile,
       COUNT(*) AS n,
       MIN(c_custkey) AS min_key,
       {oracle_r4('MAX(pr)', 'max_pr')},
       {oracle_r4('MAX(cd)', 'max_cd')}
FROM w
GROUP BY c_nationkey, quartile
"""


@register("q_window_ntile", oracle=_NTILE_ORACLE)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — ntile/percent_rank/cume_dist over a
    tie-free ordering (acctbal, custkey), rolled up per (nation, quartile).
    percent_rank and cume_dist are exact integer ratios → identical doubles
    across engines; r4 is belt-and-braces."""
    cust = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    t = cust.select(
        "c_nationkey",
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return t.groupBy("c_nationkey", "quartile").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("c_custkey").alias("min_key"),
        r4(F.max("pr"), "max_pr"),
        r4(F.max("cd"), "max_cd"),
    )


# --- q_agg_percentile -------------------------------------------------------

_PCTL_ORACLE = f"""
SELECT c_nationkey,
       {oracle_r4('quantile_cont(c_acctbal, 0.25)', 'p25')},
       {oracle_r4('quantile_cont(c_acctbal, 0.5)', 'p50')},
       {oracle_r4('quantile_cont(c_acctbal, 0.9)', 'p90')}
FROM customer
GROUP BY c_nationkey
"""


@register("q_agg_percentile", oracle=_PCTL_ORACLE)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per nation (Spark `percentile` ↔
    DuckDB `quantile_cont`, both linear interpolation on the sorted values;
    r4 absorbs last-ulp interpolation differences). The exact form sorts per
    group; the 100 TB path swaps in percentile_approx (t-digest sketch,
    mergeable, single pass) — same query shape."""
    cust = load(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey").agg(
        r4(F.percentile("c_acctbal", F.lit(0.25)), "p25"),
        r4(F.percentile("c_acctbal", F.lit(0.5)), "p50"),
        r4(F.percentile("c_acctbal", F.lit(0.9)), "p90"),
    )


# --- q_agg_string_agg -------------------------------------------------------

_STRAGG_ORACLE = """
SELECT n_regionkey,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       COUNT(*) AS n_nations
FROM nation
GROUP BY n_regionkey
"""


@register("q_agg_string_agg", oracle=_STRAGG_ORACLE)
def q_agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG): sorted collect_list joined with
    a separator — deterministic because the list is sorted before joining
    (plain collect_list order is partition-dependent)."""
    nation = load(spark, sf_dir, "nation")
    return nation.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
        F.count(F.lit(1)).alias("n_nations"),
    )


# --- q_sample_hash ----------------------------------------------------------

_SAMPLE_ORACLE = """
SELECT o_orderstatus,
       COUNT(*) AS n_sampled,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,7))) AS DOUBLE) AS sum_sampled
FROM orders
WHERE ('0x' || substr(sha256(o_orderkey::VARCHAR), 1, 8))::BIGINT % 10 = 0
GROUP BY o_orderstatus
"""


@register("q_sample_hash", oracle=_SAMPLE_ORACLE)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% hash sample of orders (sha256(key) prefix mod 10):
    the reproducible sampling primitive for pipeline debugging at 100 TB —
    a pure column predicate, identical rows on every engine/run/partition
    layout, unlike TABLESAMPLE."""
    orders = load(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(F.sha2(F.col("o_orderkey").cast("string"), 256), 1, 8), 16, 10
    ).cast("long")
    return (
        orders.filter(h % 10 == 0)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(F.col("o_totalprice").cast("decimal(18,7)")).cast("double").alias("sum_sampled"),
        )
    )


# --- q_merge_upsert ---------------------------------------------------------

_MERGE_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, 0 AS version FROM orders
), updates AS (
  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 1.1 AS o_totalprice,
         1 AS version
  FROM orders WHERE o_orderkey % 100 = 0
), merged AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY version DESC) AS rn
  FROM (SELECT * FROM base UNION ALL SELECT * FROM updates)
)
SELECT o_orderstatus,
       COUNT(*) AS n_rows,
       CAST(SUM(version) AS BIGINT) AS n_updated,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,7))) AS DOUBLE) AS total
FROM merged WHERE rn = 1
GROUP BY o_orderstatus
"""


@register("q_merge_upsert", oracle=_MERGE_ORACLE)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-style MERGE/upsert without a table format: union base + updates,
    keep the highest-version row per key (row_number over version desc).
    This is the reference's idempotent-replay semantics (ES upsert keyed by
    fact_id, upstream serialize.py) as a pure relational transform; on a
    lake it is the rewrite under Delta/Iceberg MERGE INTO. One shuffle on
    the key; updates side is generated here but would be the CDC feed."""
    orders = load(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey", "o_orderstatus", "o_totalprice", F.lit(0).alias("version")
    )
    updates = orders.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
        F.lit(1).alias("version"),
    )
    merged = base.unionByName(updates)
    w = Window.partitionBy("o_orderkey").orderBy(F.col("version").desc())
    latest = merged.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return latest.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("version").alias("n_updated"),
        F.sum(F.col("o_totalprice").cast("decimal(18,7)")).cast("double").alias("total"),
    )


# --- q_agg_salted -----------------------------------------------------------

N_SALTS = 8

_SALTED_ORACLE = """
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,7))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY l_returnflag
"""


@register("q_agg_salted", oracle=_SALTED_ORACLE)
def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation of a LOW-CARDINALITY/skewed key
    (l_returnflag has 3 values — every row of a 100 TB table lands on 3
    reducers without salting): stage 1 aggregates by (key, salt) spreading
    each hot key over N_SALTS reducers, stage 2 merges the partials by key.
    Result is identical to the direct groupBy (the oracle IS the direct
    form); decimal partials keep the float sum order-independent. The salt
    is a deterministic hash of a unique column, not rand(), so reruns and
    retried tasks agree."""
    li = load(spark, sf_dir, "lineitem")
    salt = F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(N_SALTS))
    stage1 = (
        li.withColumn("salt", salt)
        .groupBy("l_returnflag", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("l_quantity").cast("decimal(18,7)")).alias("pq"),
        )
    )
    return stage1.groupBy("l_returnflag").agg(
        F.sum("pn").alias("n_rows"),
        F.sum("pq").cast("double").alias("sum_qty"),
    )


# --- q_sample_stratified ----------------------------------------------------

_STRAT_ORACLE = """
WITH keyed AS (
  SELECT l_returnflag, l_extendedprice,
         CAST(('0x' || substr(sha256(CAST(l_orderkey AS VARCHAR) || '-' ||
                                      CAST(l_linenumber AS VARCHAR)), 1, 8)) AS BIGINT)
           % 100 AS h
  FROM lineitem
)
SELECT l_returnflag,
       COUNT(*) AS n_sampled,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,7))) AS DOUBLE) AS sum_price
FROM keyed
WHERE h < CASE l_returnflag WHEN 'A' THEN 10 WHEN 'N' THEN 2 ELSE 5 END
GROUP BY l_returnflag
"""


@register("q_sample_stratified", oracle=_STRAT_ORACLE)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-stratum rates (A 10%, N 2%,
    R 5%) via a sha256-prefix hash predicate — the downsample-by-class
    primitive of a training-data pipeline (e.g. rebalancing languages or
    sources) at 100 TB.

    Pure column predicate: no TABLESAMPLE (engine/run dependent), no global
    state, pushes past the scan, and picks the SAME rows on every engine and
    partition layout. The per-stratum rate is one CASE expression, so adding
    strata never adds passes over the data. spread() parallelizes the sha256
    projection on local single-row-group files; no-op on pre-split inputs.
    """
    li = spread(load(spark, sf_dir, "lineitem"))
    h = F.conv(
        F.substring(
            F.sha2(
                F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber")), 256
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long") % 100
    rate = (
        F.when(F.col("l_returnflag") == "A", 10)
        .when(F.col("l_returnflag") == "N", 2)
        .otherwise(5)
    )
    return (
        li.filter(h < rate)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,7)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


# --- q_cte_recursive --------------------------------------------------------

_RCTE_ORACLE = """
WITH RECURSIVE h AS (
  SELECT c_custkey AS k, CAST(0 AS INT) AS depth
  FROM customer WHERE c_custkey < 10
  UNION ALL
  SELECT c.c_custkey, h.depth + 1
  FROM customer c JOIN h ON c.c_custkey // 10 = h.k
  WHERE c.c_custkey >= 10
)
SELECT depth, COUNT(*) AS n_nodes, CAST(SUM(k) AS BIGINT) AS sum_keys
FROM h GROUP BY depth
"""


@register("q_cte_recursive", oracle=_RCTE_ORACLE)
def q_cte_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE hierarchy walk (Spark 4.x WITH RECURSIVE): customers
    form a decimal tree (parent = custkey div 10, roots < 10 — the same
    prefix-hierarchy shape as GENESIS AGS region codes, 2→5→8 digits,
    cf. q_genesis_region_rollup); the walk labels every node with its depth.

    Spark's recursive CTE executes as iterated joins with a per-step
    UnionLoop — each iteration is a distributed hash join against the full
    table, so the pattern scales to hierarchy tables that connected-
    components driver loops (q_dedup_clusters) would need many rounds for.
    Depth is bounded by key length (~log10 N), so the loop terminates in
    a handful of iterations regardless of row count. The recursion ROW
    limit is a safety valve against non-terminating recursions, not a
    scale bound — the walk legitimately materializes every customer once
    (round-11 sf10 rehearsal: 1.5M rows tripped the 1M default), so the
    raised limit lives in session.RUNTIME_CONFS as declared policy (set
    idempotently by ensure_runtime_confs, not mutated here); termination
    stays guaranteed by the depth structure.
    """
    from ..session import ensure_runtime_confs

    ensure_runtime_confs(spark)
    load(spark, sf_dir, "customer").createOrReplaceTempView("rcte_customer")
    return spark.sql(
        """
        WITH RECURSIVE h AS (
          SELECT c_custkey AS k, CAST(0 AS INT) AS depth
          FROM rcte_customer WHERE c_custkey < 10
          UNION ALL
          SELECT c.c_custkey, h.depth + 1
          FROM rcte_customer c JOIN h ON c.c_custkey div 10 = h.k
          WHERE c.c_custkey >= 10
        )
        SELECT depth, COUNT(*) AS n_nodes, CAST(SUM(k) AS BIGINT) AS sum_keys
        FROM h GROUP BY depth
        """
    )


# --- q_cdc_apply ------------------------------------------------------------

_CDC_ORACLE = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 100
                          ELSE o_totalprice END AS DECIMAL(18,7))) AS DOUBLE)
         AS sum_price
FROM orders
WHERE o_orderkey % 20 <> 0
GROUP BY o_orderstatus
"""


@register("q_cdc_apply", oracle=_CDC_ORACLE)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog apply: a base snapshot (v0 inserts) + an update wave
    (v1: +100 on every 5th key) + a delete wave (v2: every 20th key) collapse
    to current state by keep-latest-version-per-key, dropping rows whose
    latest op is a delete. This extends q_merge_upsert (upserts only) with
    the full insert/update/DELETE op vocabulary of a real CDC feed
    (Debezium-style), which the reference's idempotent ES indexing
    (id = fact_id upsert, upstream genesapi indexing) only approximates.

    One shuffle: union is free (no exchange), the row_number window on
    o_orderkey is the only repartition, and the final tiny agg reuses
    map-side combine. The ORACLE is the declarative final state (filter +
    CASE) — the differential check proves the mechanical changelog replay
    equals the semantic result.
    """
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base = orders.select(
        "o_orderkey", "o_orderstatus", "o_totalprice",
        F.lit(0).alias("version"), F.lit("I").alias("op"),
    )
    upd = orders.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey", "o_orderstatus",
        (F.col("o_totalprice") + 100).alias("o_totalprice"),
        F.lit(1).alias("version"), F.lit("U").alias("op"),
    )
    dele = orders.filter(F.col("o_orderkey") % 20 == 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice",
        F.lit(2).alias("version"), F.lit("D").alias("op"),
    )
    log = base.unionByName(upd).unionByName(dele)
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("version"))
    current = (
        log.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
    )
    return current.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("sum_price"),
    )


# --- q_events_funnel --------------------------------------------------------

_FUNNEL_ORACLE = """
WITH staged AS (
  SELECT user_id, t1,
         MIN(CASE WHEN event_type = 'click' AND us > t1 THEN us END) OVER (PARTITION BY user_id) AS t2
  FROM (
    SELECT user_id, event_type, epoch_us(ts) AS us,
           MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) OVER (PARTITION BY user_id) AS t1
    FROM events
  )
), staged3 AS (
  SELECT user_id, t1, t2,
         MIN(CASE WHEN event_type = 'purchase' AND us > t2 THEN us END) OVER (PARTITION BY user_id) AS t3
  FROM (
    SELECT s.user_id, s.t1, s.t2, e.event_type, epoch_us(e.ts) AS us
    FROM (SELECT DISTINCT user_id, t1, t2 FROM staged) s
    JOIN events e USING (user_id)
  )
), per_user AS (
  SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
  FROM staged3 GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       COUNT(t1) AS n_view,
       COUNT(t2) AS n_view_click,
       COUNT(t3) AS n_view_click_purchase,
       CAST(MIN(t3 - t1) AS BIGINT) AS min_funnel_us,
       CAST(MAX(t3 - t1) AS BIGINT) AS max_funnel_us
FROM per_user
"""


@register("q_events_funnel", oracle=_FUNNEL_ORACLE)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis (view → click-after-view → purchase-after-
    click): the sequential-pattern query of product analytics, with strict
    event-time ordering between stages (a click BEFORE the first view does
    not count).

    Spark-first shape: three stacked unordered windows over the SAME
    partitioning (user_id) — stage k's threshold time feeds stage k+1's
    conditional MIN — so Catalyst plans ONE Exchange+Sort feeding three
    Window execs, then a single final aggregate to one row. No self-joins:
    the per-stage "first event after T" never rescans events, which is the
    difference between 1 shuffle and 3 at 100 TB. Skew note: partition
    cardinality = users, uniform here; a whale user would be AQE-split.
    """
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts_us")
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts_us"))).over(w)
    s1 = ev.withColumn("t1", t1)
    t2 = F.min(
        F.when((F.col("event_type") == "click") & (F.col("ts_us") > F.col("t1")), F.col("ts_us"))
    ).over(w)
    s2 = s1.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts_us") > F.col("t2")), F.col("ts_us")
        )
    ).over(w)
    s3 = s2.withColumn("t3", t3)
    per_user = s3.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t1").alias("n_view"),
        F.count("t2").alias("n_view_click"),
        F.count("t3").alias("n_view_click_purchase"),
        F.min(F.col("t3") - F.col("t1")).cast("bigint").alias("min_funnel_us"),
        F.max(F.col("t3") - F.col("t1")).cast("bigint").alias("max_funnel_us"),
    )


# --- q_pack_sequences -------------------------------------------------------

PACK_BUDGET = 2048  # context-window token budget per bin


def pack_assignments(docs: DataFrame) -> DataFrame:
    """Per-doc packing relation (source, doc_id, n_tokens, bin_id):
    bin_id = exclusive-prefix-sum(tokens) div budget per source ordered by
    doc_id. Shared by q_pack_sequences (rollup) and the streaming
    pack-on-ingest twin's batch ground truth (streaming/stateful.py
    pack_stream — the pytest pins stream ≡ this relation exactly)."""
    n_tokens = (
        F.length("text") - F.length(F.regexp_replace(F.col("text"), " ", "")) + 1
    )
    toks = docs.select("doc_id", "source", n_tokens.alias("n_tokens"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bin_id = F.floor(
        (F.sum("n_tokens").over(w) - F.col("n_tokens")) / PACK_BUDGET
    ).cast("bigint")
    return toks.withColumn("bin_id", bin_id)


_PACK_ORACLE = """
WITH toks AS (
  SELECT doc_id, source,
         length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
  FROM documents
), packed AS (
  SELECT source, doc_id, n_tokens,
         CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - n_tokens) / 2048) AS BIGINT) AS bin_id
  FROM toks
)
SELECT source,
       COUNT(DISTINCT bin_id) AS n_bins,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(MAX(n_tokens) AS BIGINT) AS max_doc_tokens
FROM packed
GROUP BY source
"""


@register("q_pack_sequences", oracle=_PACK_ORACLE)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LLM pretraining: assign documents to fixed-budget
    context bins (2048 whitespace tokens) by contiguous fill — bin_id =
    exclusive-prefix-sum(tokens) div budget — the deterministic packing used
    to build training batches without padding waste.

    Packing is PER SOURCE (partitionBy source, order doc_id): each stream
    packs independently, so the running sum parallelizes across sources
    instead of one global serial scan — at 100 TB you pack per
    (source, shard) exactly like this, never with one global cumsum. The
    window and final aggregate share the source partitioning → one shuffle
    total. Integer token counts make the prefix sum exact on both engines.
    """
    docs = load(spark, sf_dir, "documents")
    packed = pack_assignments(docs)
    return packed.groupBy("source").agg(
        F.countDistinct("bin_id").alias("n_bins"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.max("n_tokens").cast("bigint").alias("max_doc_tokens"),
    )


# --- q_pack_efficiency --------------------------------------------------------

_PACK_EFF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source,
         length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
  FROM documents
), packed AS (
  SELECT source, doc_id, n_tokens,
         CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - n_tokens) / {PACK_BUDGET}) AS BIGINT) AS bin_id
  FROM toks
), bins AS (
  SELECT source, bin_id, CAST(SUM(n_tokens) AS BIGINT) AS fill,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM packed GROUP BY source, bin_id
), mx AS (
  SELECT source, MAX(bin_id) AS last_bin FROM bins GROUP BY source
)
SELECT b.source,
       CAST(COUNT(*) AS BIGINT) AS n_bins,
       CAST(SUM(b.n_docs) AS BIGINT) AS n_docs,
       CAST(SUM(b.fill) AS BIGINT) AS total_tokens,
       CAST(MAX(b.fill) AS BIGINT) AS max_fill,
       CAST(SUM(CASE WHEN b.fill > {PACK_BUDGET} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_overfull,
       {oracle_r4(
           f"CAST(SUM(CASE WHEN b.bin_id < m.last_bin THEN b.fill ELSE NULL END)"
           f" AS DOUBLE) / (NULLIF(MAX(m.last_bin), 0) * {PACK_BUDGET}.0)",
           'closed_fill_r4',
       )}
FROM bins b JOIN mx m USING (source)
GROUP BY b.source
"""


@register("q_pack_efficiency", oracle=_PACK_EFF_ORACLE)
def q_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency certificate — the report that tunes PACK_BUDGET
    before a training run: per source, the bin count, total/max fill, how
    many bins OVERFLOW the budget (a document longer than the context
    window straddles bins under contiguous fill — those need truncation or
    a long-doc route), and the mean fill ratio of CLOSED bins (the last,
    still-open bin is excluded so the ratio measures packing quality, not
    corpus-end truncation). closed_fill_r4 near 1.0 says contiguous fill
    wastes almost nothing at this budget; a low value says documents are
    large relative to the budget and best-fit reordering would pay.

    Plan shape: pack_assignments' one window (per-source prefix sum), then
    two hash aggregates (bin fills -> per-source report) that reuse the
    window's source partitioning — one shuffle total, same as
    q_pack_sequences. All ratios divide exact integers; the mean crosses
    engines as one double division."""
    docs = load(spark, sf_dir, "documents")
    bins = (
        pack_assignments(docs)
        .groupBy("source", "bin_id")
        .agg(
            F.sum("n_tokens").cast("bigint").alias("fill"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        )
    )
    w_last = Window.partitionBy("source")
    bins = bins.withColumn("last_bin", F.max("bin_id").over(w_last))
    return bins.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("fill").cast("bigint").alias("total_tokens"),
        F.max("fill").cast("bigint").alias("max_fill"),
        F.sum(F.when(F.col("fill") > PACK_BUDGET, 1).otherwise(0))
        .cast("bigint")
        .alias("n_overfull"),
        r4(
            F.sum(F.when(F.col("bin_id") < F.col("last_bin"), F.col("fill")))
            .cast("double")
            / (
                F.nullif(F.max("last_bin"), F.lit(0)).cast("double")
                * F.lit(float(PACK_BUDGET))
            ),
            "closed_fill_r4",
        ),
    )


# --- q_sample_weighted ------------------------------------------------------

_WSAMPLE_K = 25

_WSAMPLE_ORACLE = f"""
WITH pri AS (
  SELECT doc_id, source, n_chars,
         -LN((('0x' || substr(sha256(doc_id::VARCHAR), 1, 8))::BIGINT + 1.0)
             / 4294967296.0) / n_chars AS priority
  FROM documents
), ranked AS (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY priority DESC, doc_id) AS rk
  FROM pri
)
SELECT doc_id, source, n_chars, rk
FROM ranked WHERE rk <= {_WSAMPLE_K}
"""


@register("q_sample_weighted", oracle=_WSAMPLE_ORACLE)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-Res):
    top-k per source by priority -ln(u)/w, u = deterministic hash-uniform,
    w = doc length — the quality/length-weighted subset selection of corpus
    curation, reproducible across engines, runs, and partitionings (unlike
    rand()-based TABLESAMPLE, which cannot be replayed or audited).

    One pass + one top-k window per source (partial ranking; no global
    sort). The priority stays an internal ordering key only — output columns
    are all integers, so engine libm ulp drift in ln() cannot surface (a
    rank flip would need two priorities within ~1e-16 — measure-zero).
    At 100 TB: same plan, with the window's rank pushed down by
    WindowGroupLimit (top-k early pruning in each partition).
    """
    docs = load(spark, sf_dir, "documents")
    h32 = F.conv(F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 8), 16, 10).cast(
        "long"
    )
    u = (h32 + F.lit(1.0)) / F.lit(4294967296.0)
    pri = docs.select(
        "doc_id", "source", "n_chars", (-F.log(u) / F.col("n_chars")).alias("priority")
    )
    w = Window.partitionBy("source").orderBy(F.col("priority").desc(), F.col("doc_id"))
    return (
        pri.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _WSAMPLE_K)
        .select("doc_id", "source", "n_chars", "rk")
    )


# --- q_incremental_agg_merge ------------------------------------------------

_INC_AGG_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100
         AS total_price,
       MIN(o_orderkey) AS min_key,
       MAX(o_orderkey) AS max_key
FROM orders
GROUP BY o_orderpriority
"""


@register("q_incremental_agg_merge", oracle=_INC_AGG_ORACLE)
def q_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance: yesterday's aggregate
    STATE (count/sum/min/max per group) merges with today's DELTA partials
    into the new state — never re-scanning history. The oracle is the full
    recompute over base ∪ delta, proving the merge algebra is lossless;
    at 100 TB this is the difference between an O(delta) nightly update and
    an O(total) rescan (and it is exactly Spark's own partial-aggregation
    contract, applied at the pipeline level: every column here is an
    algebraic/commutative monoid — decomposable aggregates only; a median
    would need the full data or a mergeable sketch like q_agg_sketch_merge).

    Exact cents keep the merged sum bit-equal to the recompute regardless of
    which partial it transited.
    """
    orders = load(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents.cast("decimal(27,0)")).alias("sum_cents"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )

    # yesterday's state and today's delta (disjoint halves of the key space)
    state = partial(orders.filter(F.col("o_orderkey") % 2 == 0))
    delta = partial(orders.filter(F.col("o_orderkey") % 2 == 1))

    merged = state.unionByName(delta).groupBy("o_orderpriority").agg(
        F.sum("n_orders").cast("bigint").alias("n_orders"),
        (F.sum("sum_cents").cast("double") / 100).alias("total_price"),
        F.min("min_key").alias("min_key"),
        F.max("max_key").alias("max_key"),
    )
    return merged


# --- q_train_test_split ------------------------------------------------------

_SPLIT_ORACLE = """
WITH s AS (
  SELECT lang, n_chars,
         CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val' ELSE 'test' END AS split
  FROM (
    SELECT lang, n_chars,
           ('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS h
    FROM documents
  )
)
SELECT lang, split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars
FROM s GROUP BY lang, split
"""


@register("q_train_test_split", oracle=_SPLIT_ORACLE)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split of the corpus — the
    dataset-versioning primitive of a training pipeline: membership is a
    pure function of the document id (sha256 mod 100), so the split is
    reproducible across runs, engines, partitionings, AND incremental
    appends (new docs land in a split without reshuffling old ones — the
    property a rand()-based split fundamentally lacks). Disjointness and
    exhaustiveness hold by construction (one CASE over one hash).

    Plan: a stateless projection + one small rollup per (lang, split) —
    the corpus is scanned once and never shuffled before the aggregate.
    """
    docs = load(spark, sf_dir, "documents")
    h = (
        F.conv(F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(h < 80, F.lit("train")).when(h < 90, F.lit("val")).otherwise(F.lit("test"))
    )
    return (
        docs.select("lang", "n_chars", split.alias("split"))
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
    )


# --- q_skyline (Pareto frontier / skyline query) ----------------------------

_SKYLINE_ORACLE = """
WITH p AS (
  SELECT p_partkey,
         CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents,
         CAST(p_size AS BIGINT) AS p_size
  FROM part
)
SELECT a.p_partkey, a.price_cents, a.p_size
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.price_cents <= a.price_cents AND b.p_size <= a.p_size
    AND (b.price_cents < a.price_cents OR b.p_size < a.p_size)
)
"""


@register("q_skyline", oracle=_SKYLINE_ORACLE)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of parts minimizing (price, size): a
    part survives iff no other part is ≤ on both dimensions and < on at
    least one — the "best tradeoff" query behind product/plan pickers.

    Differential value: the oracle is the textbook QUADRATIC NOT EXISTS
    formulation; the Spark plan is the linear sweep — so the hash match
    proves the sweep's dominance algebra (ties on both axes survive, ties
    on one axis dominated by the strictly-better row) exactly.

    Scale shape: facts collapse to one row per distinct price first (one
    hash-agg shuffle keyed on price — map-side combine does the heavy
    lifting), the strict-predecessor running minimum runs over DISTINCT
    PRICES only (a tiny single-partition window, bounded by price
    cardinality, NOT row count), and survivors re-join the base as a
    broadcast (the frontier of an n-row set is tiny in practice). No
    O(n²) stage anywhere at any scale.
    """
    p = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.expr("CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT)").alias(
            "price_cents"
        ),
        F.col("p_size").cast("bigint").alias("p_size"),
    )
    per_price = p.groupBy("price_cents").agg(F.min("p_size").alias("min_size"))
    w = Window.orderBy("price_cents").rowsBetween(Window.unboundedPreceding, -1)
    frontier_prices = (
        per_price.withColumn("prior_min", F.min("min_size").over(w))
        .filter(F.col("prior_min").isNull() | (F.col("min_size") < F.col("prior_min")))
        .select(
            F.col("price_cents").alias("f_price_cents"),
            F.col("min_size").alias("f_min_size"),
        )
    )
    return p.join(
        F.broadcast(frontier_prices),
        on=(F.col("price_cents") == F.col("f_price_cents"))
        & (F.col("p_size") == F.col("f_min_size")),
    ).select("p_partkey", "price_cents", "p_size")


# --- q_sql_not_in_null (tri-valued NOT IN semantics certificate) ------------

#: the certificate body — one shared SQL text run by BOTH engines (Spark on
#: temp views, DuckDB on its parquet views), pinning the dialect corner that
#: silently empties queries in production: NOT IN against a set containing
#: a single NULL is never TRUE for any row.
_NOT_IN_SQL = """
WITH build AS (
  SELECT CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_custkey END AS k
  FROM orders WHERE o_totalprice > 450000
)
SELECT
  CAST((SELECT COUNT(*) FROM build) AS BIGINT) AS n_build,
  CAST((SELECT COUNT(*) FROM build WHERE k IS NULL) AS BIGINT) AS n_build_null,
  CAST((SELECT COUNT(*) FROM customer
        WHERE c_custkey IN (SELECT k FROM build)) AS BIGINT) AS n_in,
  CAST((SELECT COUNT(*) FROM customer
        WHERE c_custkey NOT IN (SELECT k FROM build)) AS BIGINT) AS n_not_in,
  CAST((SELECT COUNT(*) FROM customer
        WHERE c_custkey NOT IN (SELECT k FROM build WHERE k IS NOT NULL))
       AS BIGINT) AS n_not_in_nonnull
"""


@register("q_sql_not_in_null", oracle=_NOT_IN_SQL)
def q_sql_not_in_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tri-valued NOT IN certificate: the build set deliberately contains
    NULL keys, and the output proves BOTH engines agree that (a) IN ignores
    the NULLs (matches still found), (b) NOT IN against a NULL-bearing set
    is empty — every row's predicate is UNKNOWN, the classic silent
    production bug — and (c) stripping NULLs restores the expected
    complement. One row, five counters, the SAME SQL text on both engines
    (Spark over temp views ≡ DuckDB over parquet views), so this pins the
    engine dialect itself, not a DataFrame translation of it.

    Scale shape: Spark plans NOT IN as a null-aware anti join
    (BroadcastNestedLoopJoin when the build side broadcasts) — correct but
    the expensive shape at scale; the docstring-level guidance this query
    encodes is "write NOT EXISTS (or strip NULLs explicitly) so the
    planner can use a plain anti hash join". The certificate keeps the
    build side tiny so the BNLJ is broadcast-bounded.
    """
    for t in ("orders", "customer"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_NOT_IN_SQL)


# --- q_abc_classification (ABC inventory / revenue classification) ----------

_ABC_A_BP = 8000   # A: first 80% of cumulative revenue
_ABC_B_BP = 9500   # B: next 15%


_ABC_ORACLE = f"""
WITH rev AS (
  SELECT l_partkey,
         CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM lineitem GROUP BY l_partkey
), ranked AS (
  SELECT l_partkey, cents,
         CAST(SUM(cents) OVER (ORDER BY cents DESC, l_partkey) AS BIGINT)
           AS cum_cents,
         CAST(SUM(cents) OVER () AS BIGINT) AS tot_cents
  FROM rev
), classed AS (
  SELECT l_partkey, cents, cum_cents, tot_cents,
         CASE WHEN cum_cents::HUGEINT * 10000 <= {_ABC_A_BP} * tot_cents::HUGEINT THEN 'A'
              WHEN cum_cents::HUGEINT * 10000 <= {_ABC_B_BP} * tot_cents::HUGEINT THEN 'B'
              ELSE 'C' END AS abc_class
  FROM ranked
)
SELECT abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(cents) AS BIGINT) AS class_cents,
       CAST(MIN(cents) AS BIGINT) AS min_cents,
       FLOOR(CAST(SUM(cents) AS DOUBLE) / MIN(tot_cents) * 10000 + 0.5) / 10000
         AS revenue_share_r4
FROM classed GROUP BY abc_class
"""


@register("q_abc_classification", oracle=_ABC_ORACLE)
def q_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by revenue, classed A/B/C
    at the 80%/95% cumulative-share cuts — the warehouse-ops standard for
    "which 20% of SKUs carry 80% of the business" (the operational cousin
    of q_agg_concentration's decile shares and q_agg_lorenz's curve).

    Parity: class boundaries are exact INTEGER cross-multiplied predicates
    on cumulative cents (cum·10⁴ ≤ bp·total — no float share ever decides a
    class), with a tie-broken ranking (cents DESC, partkey); only the
    reported share is a snapped double. The cross-multiply runs 128-bit
    (Spark decimal(38,0), DuckDB HUGEINT): total cents at SF 10⁵ ≈ 6e15,
    ×10⁴ passes int64 — the q_events_bot_screen span-overflow class.

    Scale shape: one (partkey) hash agg collapses the facts; the cumulative
    window runs over the part-level table ordered by revenue — a single
    range-partitioned sort at scale (Spark plans a global Sort + running
    window; ~10⁵-10⁷ parts, not fact rows); the final class rollup is a
    3-row aggregate.
    """
    rev = (
        load(spark, sf_dir, "lineitem")
        .select(
            "l_partkey",
            F.expr("CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)").alias("c"),
        )
        .groupBy("l_partkey")
        .agg(F.sum("c").cast("bigint").alias("cents"))
    )
    w_cum = Window.orderBy(F.col("cents").desc(), F.col("l_partkey")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy()
    ranked = rev.select(
        "l_partkey",
        "cents",
        F.sum("cents").over(w_cum).cast("bigint").alias("cum_cents"),
        F.sum("cents").over(w_all).cast("bigint").alias("tot_cents"),
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")
    classed = ranked.withColumn(
        "abc_class",
        F.when(
            d38("cum_cents") * 10000 <= _ABC_A_BP * d38("tot_cents"), "A"
        )
        .when(d38("cum_cents") * 10000 <= _ABC_B_BP * d38("tot_cents"), "B")
        .otherwise("C"),
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum("cents").cast("bigint").alias("class_cents"),
        F.min("cents").cast("bigint").alias("min_cents"),
        F.expr(
            "FLOOR(CAST(SUM(cents) AS DOUBLE) / MIN(tot_cents) * 10000 + 0.5) / 10000"
        ).alias("revenue_share_r4"),
    )


# --- q_sample_balanced -------------------------------------------------------

_BALANCED_ORACLE = """
WITH counts AS (
  SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
), floor_n AS (
  SELECT MIN(n) AS min_n FROM counts
), ranked AS (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY sha256(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(doc_id) AS BIGINT) AS keep_checksum
FROM ranked CROSS JOIN floor_n
WHERE rk <= min_n
GROUP BY lang
ORDER BY lang
"""


@register("q_sample_balanced", oracle=_BALANCED_ORACLE)
def q_sample_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: every language keeps exactly
    min-class-count documents, chosen by a deterministic hash ranking (NOT
    head-of-table order, which correlates with crawl time) — the standard
    rebalance step before training a classifier on skewed labels. The
    per-lang keep-set is certified by its doc_id checksum, so the oracle
    proves WHICH rows were kept, not just how many.

    Parity engineering: the rank key is the sha256 hex string of the
    doc_id (portable across engines, lexicographic on both), tie-broken
    by doc_id; the class floor derives from the same relation and joins
    back as one broadcast row.

    Scale shape: one count aggregate + one per-class window sort. The
    window partitions by class, so skew follows class skew — for a
    whale class, rank-then-filter is replaced at scale by a two-pass
    threshold-on-hash (sample the hash distribution, cut at the
    min_n-th quantile) without changing semantics materially; the
    deterministic variant here is the certifiable one."""
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    floor_n = counts.agg(F.min("n").alias("min_n"))
    w = Window.partitionBy("lang").orderBy(
        F.sha2(F.col("doc_id").cast("string"), 256), "doc_id"
    )
    ranked = docs.select("lang", "doc_id", F.row_number().over(w).alias("rk"))
    return (
        ranked.join(F.broadcast(floor_n))
        .filter(F.col("rk") <= F.col("min_n"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.sum("doc_id").cast("bigint").alias("keep_checksum"),
        )
        .orderBy("lang")
    )


# --- q_sql_intdiv (integer division / modulo portability certificate) --------

#: shared certificate SQL — run verbatim by BOTH engines. Probes signed
#: operands through the TWO integer-division idioms that ARE portable:
#: `%` (both engines: remainder takes the DIVIDEND's sign) and the explicit
#: floor-division spelling CAST(FLOOR(a/b AS DOUBLE-division) AS BIGINT).
#: The non-portable spellings are deliberately absent: Spark's `a div b`
#: truncates toward zero while DuckDB's `a // b` floors (they differ on
#: every negative non-exact quotient), and CAST(double AS BIGINT) truncates
#: in Spark but rounds-to-nearest in DuckDB.
_INTDIV_SQL = """
WITH v AS (
  SELECT o_custkey - 750 AS a FROM orders
)
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(CASE WHEN a < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative,
  CAST(SUM(a % 7) AS BIGINT) AS sum_mod,
  CAST(MIN(a % 7) AS BIGINT) AS min_mod,
  CAST(MAX(a % 7) AS BIGINT) AS max_mod,
  CAST(SUM(CAST(FLOOR(CAST(a AS DOUBLE) / 7) AS BIGINT)) AS BIGINT) AS sum_fdiv,
  CAST(SUM(a % 7 + 7 * CAST(FLOOR(CAST(a AS DOUBLE) / 7) AS BIGINT) - a)
       AS BIGINT) AS identity_residual
FROM v
"""


@register("q_sql_intdiv", oracle=_INTDIV_SQL)
def q_sql_intdiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed integer division/modulo portability certificate: the SAME SQL
    text runs on both engines over mixed-sign operands and pins (a) `%`
    remainder semantics (dividend-signed on both — min_mod = −6 proves
    negative remainders occur), (b) the explicit FLOOR-division spelling as
    the portable floor-div idiom, and (c) the Euclidean identity
    a = 7·fdiv(a) + (a mod 7) holds ONLY when mod and div agree in
    convention — identity_residual ≠ 0 certifies that `%` pairs with
    TRUNCATING division, i.e. mixing `%` with the floor-div idiom on
    negatives is a real bug this certificate makes visible.

    Why it exists: every salting/bucketing/sharding expression in this repo
    (`q_agg_salted`, `q_join_skew_salted`, `q_sample_hash`, …) leans on
    `%`-of-hash — nonnegative by construction, where the conventions
    coincide. This query pins the corner where they DON'T, so the next
    bucketing expression over a signed key gets written with intent. The
    non-portable spellings (`div`, `//`, CAST(double AS BIGINT)) are
    documented in the module comment and deliberately excluded — Spark
    truncates where DuckDB rounds/floors."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_INTDIV_SQL)


# --- q_abc_xyz (demand-variability classification) ---------------------------

_XYZ_ORACLE = """
WITH monthly AS (
  SELECT l_partkey,
         CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT) AS ym,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem GROUP BY l_partkey, ym
), stats AS (
  SELECT l_partkey,
         CAST(COUNT(*) AS BIGINT) AS n_months,
         CAST(SUM(q) AS BIGINT) AS s1,
         CAST(SUM(q * q) AS BIGINT) AS s2
  FROM monthly GROUP BY l_partkey
), classed AS (
  SELECT l_partkey, n_months,
         CASE
           WHEN n_months < 3 THEN 'Z'
           WHEN (s2 * n_months - s1 * s1) * 4 < s1 * s1 THEN 'X'
           WHEN (s2 * n_months - s1 * s1) * 1 < s1 * s1 THEN 'Y'
           ELSE 'Z'
         END AS xyz_class
  FROM stats
)
SELECT xyz_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(n_months) AS BIGINT) AS total_part_months
FROM classed
GROUP BY xyz_class
ORDER BY xyz_class
"""


@register("q_abc_xyz", oracle=_XYZ_ORACLE)
def q_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ demand-variability classification (the companion axis to
    q_abc_classification's value-concentration ABC): per part, the
    coefficient of variation of monthly demand sorts parts into X (steady,
    CV < 0.5), Y (fluctuating, CV < 1) and Z (erratic or too sparse) — the
    ABC×XYZ matrix is how inventory planners pick forecasting models and
    safety stock per segment.

    Parity engineering: the CV cuts are fully integer cross-multiplied —
    CV² < c ⇔ (n·Σq² − (Σq)²)·(1/c) < (Σq)² with c ∈ {1/4, 1} — population
    variance over exact integer monthly sums, so no float exists anywhere
    in the classification. Months are integer year·12+month keys.

    Scale shape: two chained hash aggregates (part-month, then part), both
    map-side combined, then a 3-group rollup."""
    li = load(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        "l_partkey",
        (F.year("l_shipdate") * 12 + F.month("l_shipdate"))
        .cast("bigint")
        .alias("ym"),
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("q"))
    stats = monthly.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        F.sum("q").cast("bigint").alias("s1"),
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("s2"),
    )
    var_num = F.col("s2") * F.col("n_months") - F.col("s1") * F.col("s1")
    mean_sq = F.col("s1") * F.col("s1")
    classed = stats.select(
        "n_months",
        F.when(F.col("n_months") < 3, "Z")
        .when(var_num * 4 < mean_sq, "X")
        .when(var_num * 1 < mean_sq, "Y")
        .otherwise("Z")
        .alias("xyz_class"),
    )
    return (
        classed.groupBy("xyz_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("n_months").cast("bigint").alias("total_part_months"),
        )
        .orderBy("xyz_class")
    )


# --- q_sql_aggregate_nulls (NULL-semantics aggregate certificate) ------------

#: shared certificate SQL — run verbatim by BOTH engines (Spark temp views ≡
#: DuckDB parquet views). Pins the NULL rules every aggregate pipeline
#: silently depends on: aggregates IGNORE NULLs (not treat-as-zero),
#: all-NULL groups yield NULL sums but 0 counts, COUNT(col) ≠ COUNT(*),
#: and AVG divides by the NON-NULL count only.
_AGG_NULLS_SQL = """
WITH v AS (
  SELECT o_orderkey,
         CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END AS p
  FROM orders WHERE o_orderkey % 100 < 10
)
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COUNT(p) AS BIGINT) AS n_nonnull,
  CAST(SUM(CASE WHEN p IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
  CAST(SUM(CAST(FLOOR(p * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
  FLOOR(CAST(SUM(CAST(FLOOR(p * 100 + 0.5) AS BIGINT)) AS DOUBLE)
        / COUNT(p) * 10000 + 0.5) / 10000 AS avg_nonnull_r4,
  CAST((SELECT SUM(CAST(1 AS BIGINT)) FROM v WHERE FALSE) AS BIGINT)
    AS sum_empty,
  CAST((SELECT COUNT(*) FROM v WHERE FALSE) AS BIGINT) AS count_empty
FROM v
"""


@register("q_sql_aggregate_nulls", oracle=_AGG_NULLS_SQL)
def q_sql_aggregate_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate NULL-semantics certificate (companion to q_sql_not_in_null
    and q_sql_intdiv): ONE shared SQL text proves both engines agree that
    aggregates skip NULLs rather than nulling out or zero-filling —
    COUNT(col) counts non-NULLs while COUNT(*) counts rows, SUM over the
    filtered-empty relation is NULL (not 0) while COUNT over it is 0, and
    the honest mean divides by COUNT(col). Every decayed-score, weighted
    mean, and rollup in this registry leans on these rules; this row makes
    them an explicit, hash-checked contract instead of folklore."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_AGG_NULLS_SQL)


# --- q_impute_group_median ---------------------------------------------------

_IMPUTE_ORACLE = """
WITH base AS (
  SELECT event_id, event_type,
         CASE WHEN event_id % 7 = 0 THEN NULL
              ELSE CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END AS cents
  FROM events
), med AS (
  SELECT event_type,
         CAST(r.cents AS BIGINT) AS med_cents
  FROM (
    SELECT event_type, cents,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents, event_id)
             AS rk,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM base WHERE cents IS NOT NULL
  ) r
  WHERE r.rk = (r.n + 1) // 2
)
SELECT b.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN b.cents IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_imputed,
       CAST(MAX(m.med_cents) AS BIGINT) AS med_cents,
       CAST(SUM(COALESCE(b.cents, m.med_cents)) AS BIGINT) AS sum_imputed_cents
FROM base b JOIN med m ON m.event_type = b.event_type
GROUP BY b.event_type
ORDER BY b.event_type
"""


@register("q_impute_group_median", oracle=_IMPUTE_ORACLE)
def q_impute_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-median imputation: NULLs (simulated on a deterministic 1-in-7
    slice) are filled with their group's exact lower median, and the audit
    reports imputed counts and the post-imputation checksum per group —
    the cross-sectional missing-value fill (median, not mean: robust to
    the heavy tail) next to the time-series fills (q_window_locf forward,
    q_window_gap_fill calendar).

    Parity engineering: the median is exact rank selection over integer
    cents — rk = (n+1)/2 against a (cents, event_id) deterministic order —
    equal values make any tie order equivalent; the imputed checksum is an
    exact integer sum.

    Scale shape: one per-group window for the rank (skew follows group
    sizes), a ~5-row median table broadcast back onto the fact, one final
    rollup riding the same grouping."""
    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        "event_type",
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(
            F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)")
        ).alias("cents"),
    )
    nn = base.filter(F.col("cents").isNotNull())
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wn = Window.partitionBy("event_type")
    med = (
        nn.select(
            "event_type",
            "cents",
            F.row_number().over(w).alias("rk"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .filter(F.col("rk") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("cents").alias("med_cents"))
    )
    return (
        base.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.when(F.col("cents").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_imputed"),
            F.max("med_cents").cast("bigint").alias("med_cents"),
            F.sum(F.coalesce("cents", "med_cents")).cast("bigint").alias(
                "sum_imputed_cents"
            ),
        )
        .orderBy("event_type")
    )


# --- q_abc_migration ---------------------------------------------------------

_ABC_MIG_SQL_PERIOD = """
  SELECT l_partkey,
         CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{lo}' AND l_shipdate < TIMESTAMP '{hi}'
  GROUP BY l_partkey
"""

_ABC_MIG_ORACLE = f"""
WITH rev1 AS ({_ABC_MIG_SQL_PERIOD.format(lo='1996-01-01 00:00:00', hi='1997-01-01 00:00:00')}),
rev2 AS ({_ABC_MIG_SQL_PERIOD.format(lo='1997-01-01 00:00:00', hi='1998-01-01 00:00:00')}),
c1 AS (
  SELECT l_partkey,
         CASE WHEN cum::HUGEINT * 10000 <= 8000 * tot::HUGEINT THEN 'A'
              WHEN cum::HUGEINT * 10000 <= 9500 * tot::HUGEINT THEN 'B' ELSE 'C' END AS cls
  FROM (SELECT l_partkey, cents,
               SUM(cents) OVER (ORDER BY cents DESC, l_partkey
                                ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(cents) OVER () AS tot
        FROM rev1)
), c2 AS (
  SELECT l_partkey,
         CASE WHEN cum::HUGEINT * 10000 <= 8000 * tot::HUGEINT THEN 'A'
              WHEN cum::HUGEINT * 10000 <= 9500 * tot::HUGEINT THEN 'B' ELSE 'C' END AS cls
  FROM (SELECT l_partkey, cents,
               SUM(cents) OVER (ORDER BY cents DESC, l_partkey
                                ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(cents) OVER () AS tot
        FROM rev2)
)
SELECT COALESCE(c1.cls, '-') AS class_from,
       COALESCE(c2.cls, '-') AS class_to,
       CAST(COUNT(*) AS BIGINT) AS n_parts
FROM c1 FULL JOIN c2 USING (l_partkey)
GROUP BY class_from, class_to
ORDER BY class_from, class_to
"""


@register("q_abc_migration", oracle=_ABC_MIG_ORACLE)
def q_abc_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC class-migration matrix: every part's revenue class (A/B/C, by
    cumulative 80/95% cuts) computed independently for two consecutive
    years, FULL-joined into the year-over-year transition matrix —
    including parts that entered ('-'→X) or left (X→'-') the assortment.
    Class churn is the signal inventory planners act on (an A→C slide
    means a dying product; C→A means yesterday's safety stock is today's
    stock-out).

    Parity engineering: both classifications reuse q_abc_classification's
    integer cross-multiplied cumulative cuts (cum·10⁴ ≤ bp·tot) over exact
    cents with the deterministic (cents DESC, partkey) rank order; the
    matrix is a FULL outer join on partkey with '-' for absences.

    Scale shape: ONE fact pass — both years' part revenues come from one
    conditional aggregate over the two-year scan window (guide §2.3), so
    the FULL outer matrix join of the per-period classifications
    disappears: a part absent from a period carries a NULL conditional sum,
    which IS the '-' class. Each period's 80/95% ranking is then a window
    over the single part-level relation ordered with its period's
    (cents DESC, partkey) key, NULLS LAST keeping absent parts out of the
    cumulative sum (they contribute neither to cum nor tot, exactly as the
    per-period aggregates did). Per-period ranking stays one window over
    the part-level aggregate (parts ≪ line items)."""
    li = load(spark, sf_dir, "lineitem")
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    mid = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    cents = F.expr("CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)")
    in_p1 = F.col("l_shipdate") < mid
    rev = (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.when(in_p1, cents)).cast("bigint").alias("cents1"),
            F.sum(F.when(~in_p1, cents)).cast("bigint").alias("cents2"),
        )
    )

    def classify(col: str) -> F.Column:
        # Identical cut algebra to the two-relation version: among parts
        # PRESENT in the period (non-null conditional sum; desc ordering is
        # NULLS LAST so absent parts trail and never perturb cum), rank by
        # (cents DESC, partkey) and cross-multiply in 128-bit decimal —
        # yearly total cents ×10⁴ passes int64 at SF 10⁵, the bot_screen
        # overflow class.
        w_cum = Window.orderBy(F.desc(col), "l_partkey").rowsBetween(
            Window.unboundedPreceding, 0
        )
        w_tot = Window.partitionBy()
        cum38 = F.sum(col).over(w_cum).cast("decimal(38,0)")
        tot38 = F.sum(col).over(w_tot).cast("decimal(38,0)")
        return (
            F.when(F.col(col).isNull(), "-")
            .when(cum38 * 10000 <= 8000 * tot38, "A")
            .when(cum38 * 10000 <= 9500 * tot38, "B")
            .otherwise("C")
        )

    return (
        rev.select(
            classify("cents1").alias("class_from"),
            classify("cents2").alias("class_to"),
        )
        .groupBy("class_from", "class_to")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
        .orderBy("class_from", "class_to")
    )


# --- q_sql_order_nulls (NULL ordering placement certificate) -----------------

#: shared certificate SQL — run verbatim by BOTH engines. The engines'
#: DEFAULTS differ (Spark: NULLS FIRST on ASC; DuckDB: NULLS LAST), so
#: every ORDER BY here pins placement EXPLICITLY — the portable idiom this
#: certificate exists to enforce. The probe ranks a nullable column both
#: ways and fingerprints the head/tail of each ordering.
_ORDER_NULLS_SQL = """
WITH v AS (
  SELECT o_orderkey,
         CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END AS p
  FROM orders WHERE o_orderkey % 50 = 0
), nf AS (
  SELECT o_orderkey, ROW_NUMBER() OVER (ORDER BY p ASC NULLS FIRST, o_orderkey)
           AS rk
  FROM v
), nl AS (
  SELECT o_orderkey, ROW_NUMBER() OVER (ORDER BY p ASC NULLS LAST, o_orderkey)
           AS rk
  FROM v
)
SELECT
  CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_rows,
  CAST((SELECT COUNT(*) FROM v WHERE p IS NULL) AS BIGINT) AS n_null,
  CAST((SELECT SUM(o_orderkey) FROM nf
        WHERE rk <= (SELECT COUNT(*) FROM v WHERE p IS NULL)) AS BIGINT)
    AS head_keys_nulls_first,
  CAST((SELECT SUM(o_orderkey) FROM nl
        WHERE rk > (SELECT COUNT(*) FROM v)
                 - (SELECT COUNT(*) FROM v WHERE p IS NULL)) AS BIGINT)
    AS tail_keys_nulls_last
"""


@register("q_sql_order_nulls", oracle=_ORDER_NULLS_SQL)
def q_sql_order_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL ordering-placement certificate (third of the dialect trio with
    q_sql_not_in_null / q_sql_intdiv): Spark defaults to NULLS FIRST on
    ascending sorts, DuckDB to NULLS LAST — an unpinned ORDER BY over a
    nullable key silently reorders between engines (and flips window
    frames built on it). This shared SQL pins placement explicitly both
    ways and proves the NULL block occupies exactly the head (NULLS
    FIRST) / tail (NULLS LAST) by checksumming the keys in those rank
    bands — equal checksums on both engines certify the explicit idiom is
    portable, which is why every ORDER BY over nullable keys in this repo
    writes its placement out."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_ORDER_NULLS_SQL)


# --- q_sql_like_escape (LIKE wildcard/escape certificate) --------------------

#: shared certificate SQL — run verbatim by BOTH engines. Pins the LIKE
#: corners that corrupt filters silently: `_` matches exactly one char, `%`
#: any run, and matching a LITERAL underscore/percent requires an ESCAPE
#: clause (the default escape being backslash is NOT portable-safe — the
#: explicit ESCAPE '#' form is the pinned idiom).
_LIKE_SQL = """
WITH v AS (
  SELECT o_orderpriority AS s FROM orders WHERE o_orderkey % 20 = 0
)
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(CASE WHEN s LIKE '1%' THEN 1 ELSE 0 END) AS BIGINT) AS n_pfx1,
  CAST(SUM(CASE WHEN s LIKE '_-HIGH' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_one_char_high,
  CAST(SUM(CASE WHEN s LIKE '%URGENT' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_sfx_urgent,
  CAST(SUM(CASE WHEN s LIKE '%#_%' ESCAPE '#' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_literal_underscore,
  CAST(SUM(CASE WHEN s LIKE '4-NOT_SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_underscore_as_wildcard
FROM v
"""


@register("q_sql_like_escape", oracle=_LIKE_SQL)
def q_sql_like_escape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE wildcard/escape certificate (dialect family with
    q_sql_not_in_null / q_sql_intdiv / q_sql_order_nulls /
    q_sql_aggregate_nulls): one shared SQL text proves both engines agree
    that `_` is a single-character wildcard (so '4-NOT_SPECIFIED' matches
    the SPACE in '4-NOT SPECIFIED' — the classic silent-filter bug this
    row makes visible: n_underscore_as_wildcard counts rows a naive
    "literal" pattern was never meant to match), that matching a literal
    underscore needs an explicit ESCAPE clause, and that prefix/suffix
    `%` anchors behave identically. Pattern-pushdown note: Spark compiles
    the prefix form to a pushed StartsWith filter — certified semantics
    AND scan-level pruning from the same idiom."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_LIKE_SQL)


# --- q_sql_window_frames (RANGE-vs-ROWS peer semantics certificate) ----------

#: Shared SQL text (Spark + DuckDB): running sums over a key with TIES,
#: once per frame mode. RANGE ... CURRENT ROW includes ALL peers of the
#: current order key (the SQL-standard "logical" frame); ROWS ... CURRENT
#: ROW cuts mid-peer-group and is only deterministic with a full tiebreak
#: in the ORDER BY.
_WINDOW_FRAMES_SQL = """
WITH v AS (
  SELECT o_custkey % 50 AS grp,
         o_orderkey % 13 AS k,
         o_orderkey AS id,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
), framed AS (
  SELECT grp, k, id, cents,
         SUM(cents) OVER (PARTITION BY grp ORDER BY k, id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS s_rows,
         SUM(cents) OVER (PARTITION BY grp ORDER BY k
                          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS s_range
  FROM v
)
SELECT grp,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN s_range <> s_rows THEN 1 ELSE 0 END) AS BIGINT)
         AS n_divergent,
       CAST(SUM(s_range - s_rows) AS BIGINT) AS peer_lookahead_cents,
       CAST(MAX(s_range - s_rows) AS BIGINT) AS max_lookahead_cents
FROM framed
GROUP BY grp
"""


@register("q_sql_window_frames", oracle=_WINDOW_FRAMES_SQL)
def q_sql_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-vs-ROWS window-frame portability certificate: the SAME SQL
    text runs on both engines over an order key with heavy TIES and pins
    the divergence between the two frame modes — RANGE ... CURRENT ROW
    includes every PEER of the current key (SQL-standard logical frame,
    so a running sum "jumps" to the end of each tie group), while
    ROWS ... CURRENT ROW cuts mid-peer-group and is only well-defined
    because the ORDER BY carries a full (k, id) tiebreak.

    n_divergent > 0 certifies the two frames genuinely differ on this
    data (every non-last peer of a tie group diverges) and
    peer_lookahead_cents measures by how much; both engines agreeing on
    the exact divergence mass proves peer handling AND default-frame
    behavior match. Why it exists: every running-sum in this repo
    (drawdown, VWAP, gap-fill, interval islands) picks one of these
    frames deliberately — this pins the corner where sloppiness silently
    changes results (the default frame when ORDER BY is present IS
    RANGE ... CURRENT ROW, a classic source of tie-group bugs).

    Integer cents end to end; deterministic under the full tiebreak.
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_WINDOW_FRAMES_SQL)


# --- q_sample_bottomk -------------------------------------------------------

_BOTTOMK_ORACLE = """
WITH h AS (
  SELECT source, doc_id,
         ('0x' || substr(sha256(CAST(doc_id AS VARCHAR) || '|smp'), 1, 8))::BIGINT
           AS hv
  FROM documents
), ranked AS (
  SELECT source, doc_id, hv,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv, doc_id)
           AS smp_rank,
         COUNT(*) OVER (PARTITION BY source) AS n_group
  FROM h
)
SELECT source, doc_id, smp_rank, n_group
FROM ranked WHERE smp_rank <= 8
"""


@register("q_sample_bottomk", oracle=_BOTTOMK_ORACLE)
def q_sample_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size uniform sample per group via bottom-k-by-hash — the
    distributed 'reservoir': rank every doc by a salted content-key hash
    and keep the k=8 smallest per source. Unlike the Bernoulli hash sample
    (q_sample_hash) the output size is EXACTLY k per group, and unlike a
    true reservoir the result is a pure function of the key set — same rows
    on every engine, run, partition layout, and under additions it changes
    by at most the displaced elements (the mergeable bottom-k sketch).
    n_group rides along as the denominator certificate.

    Scale shape: one window shuffle keyed by source. At 100 TB the
    refinement is a per-partition bottom-k (partial top-k pushdown, which
    Spark's TakeOrderedAndProject applies globally and AQE applies
    per-group) so only k rows per partition per group reach the shuffle —
    the sketch merges associatively.
    """
    docs = load(spark, sf_dir, "documents")
    hv = F.conv(
        F.substring(
            F.sha2(F.concat(F.col("doc_id").cast("string"), F.lit("|smp")), 256),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("source").orderBy("hv", "doc_id")
    return (
        docs.select("source", "doc_id", hv.alias("hv"))
        .withColumn("smp_rank", F.row_number().over(w))
        .withColumn("n_group", F.count(F.lit(1)).over(Window.partitionBy("source")))
        .filter(F.col("smp_rank") <= 8)
        .select("source", "doc_id", "smp_rank", "n_group")
    )


# --- q_sql_quantified (ALL / ANY subquery comparisons) -----------------------

_QUANT_SQL = """
WITH brand_prices AS (
  SELECT p_brand, p_retailprice FROM part
), above_all AS (
  SELECT p.p_partkey, p.p_brand, p.p_retailprice
  FROM part p
  WHERE p.p_retailprice > (
    SELECT MAX(b.p_retailprice) FROM brand_prices b
    WHERE b.p_brand <> p.p_brand
  ) - 0.01
), below_any AS (
  SELECT p.p_partkey
  FROM part p
  WHERE p.p_size < (
    SELECT MIN(p2.p_size) + 3 FROM part p2 WHERE p2.p_type = p.p_type
  )
)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM above_all) AS n_above_all,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM below_any) AS n_below_any,
  (SELECT MIN(p_partkey) FROM above_all) AS first_above_all
"""


@register("q_sql_quantified", oracle=_QUANT_SQL)
def q_sql_quantified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified subquery comparisons — `> ALL (...)` / `< ANY (...)` in
    their decorrelated form: parts pricier (within a cent) than EVERY part
    of any other brand, and parts smaller than some near-minimum size of
    their own type. The relational planner lesson: ALL/ANY never needs a
    per-row subquery — `> ALL S` is `> MAX(S)` and `< ANY S` is
    `< MIN(S)+slack`, i.e. ONE aggregate joined back (here the
    anti-self-group twist: 'every OTHER brand' becomes the global
    two-top-values trick so a brand's own max doesn't mask it).

    Plan: compute the global top-2 brand maxima once (1-row broadcast),
    compare each part against the max EXCLUDING its own brand — O(n) + a
    broadcast, where the naive correlated form is O(n·brands). The ANY
    side is a per-type MIN aggregate broadcast-joined back on type. Output
    is a 1-row certificate (counts + first qualifying key) so the oracle
    pins both rewrites.

    Scale: both rewrites are map-side comparisons against broadcast
    aggregates — no shuffle of the fact side at all beyond the dim-sized
    aggregates themselves."""
    part = load(spark, sf_dir, "part")
    # top-2 distinct brand maxima: max price over all brands, and max price
    # over brands OTHER than the leader (covers the leader's own exclusion).
    brand_max = part.groupBy("p_brand").agg(
        F.max("p_retailprice").alias("bmax")
    )
    w = Window.orderBy(F.desc("bmax"), "p_brand")
    top2 = (
        brand_max.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .groupBy()
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("bmax"))).alias("max1"),
            F.max(F.when(F.col("rn") == 1, F.col("p_brand"))).alias("brand1"),
            F.max(F.when(F.col("rn") == 2, F.col("bmax"))).alias("max2"),
        )
    )
    above_all = (
        part.crossJoin(F.broadcast(top2))
        .filter(
            F.col("p_retailprice")
            > F.when(F.col("p_brand") == F.col("brand1"), F.col("max2")).otherwise(
                F.col("max1")
            )
            - 0.01
        )
        .select("p_partkey")
    )
    type_min = part.groupBy("p_type").agg(F.min("p_size").alias("tmin"))
    below_any = (
        part.join(F.broadcast(type_min), "p_type")
        .filter(F.col("p_size") < F.col("tmin") + 3)
        .select("p_partkey")
    )
    a = above_all.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_above_all"),
        F.min("p_partkey").alias("first_above_all"),
    )
    b = below_any.agg(F.count(F.lit(1)).cast("bigint").alias("n_below_any"))
    return a.crossJoin(F.broadcast(b)).select(
        "n_above_all", "n_below_any", "first_above_all"
    )


# --- q_corpus_shard_assign --------------------------------------------------

_SHARDS_N = 16

_SHARD_ORACLE = f"""
WITH assigned AS (
  SELECT doc_id, source, n_chars,
         ('0x' || substr(sha256(doc_id::VARCHAR), 1, 8))::BIGINT % {_SHARDS_N}
           AS shard
  FROM documents
), per_shard AS (
  SELECT shard,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
  FROM assigned GROUP BY shard
), totals AS (
  SELECT CAST(SUM(total_chars) AS DOUBLE) / {_SHARDS_N} AS ideal_chars
  FROM per_shard
)
SELECT shard, n_docs, total_chars, n_sources,
       FLOOR(total_chars / ideal_chars * 10000 + 0.5) / 10000 AS balance_r
FROM per_shard CROSS JOIN totals
"""


@register("q_corpus_shard_assign", oracle=_SHARD_ORACLE)
def q_corpus_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment with a balance certificate:
    every document goes to sha256(doc_id) mod 16 — the reproducible,
    engine/run/partition-layout-independent sharding a training pipeline
    needs so that shard N is THE SAME shard on every rebuild (resumable
    preprocessing, per-shard caching, blame-able data bugs). The output
    certifies the assignment is usable: per-shard doc/char counts, source
    diversity, and each shard's size as a snapped ratio of the ideal
    equal-char split (hash sharding balances doc COUNTS; the char ratio
    shows the residual length skew a size-aware packer would fix —
    q_pack_sequences is that next stage).

    Plan: one projection (sha256 + mod — whole-stage codegen), one 16-group
    map-side-combined aggregate, a broadcast 1-row ideal. At 100 TB this
    predicate IS the writer's partitionBy expression; nothing here scales
    with anything but the shard count."""
    docs = load(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 8), 16, 10)
        .cast("long")
        % _SHARDS_N
    )
    per_shard = (
        docs.select(shard.alias("shard"), "source", "n_chars")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
        )
    )
    totals = per_shard.agg(
        (F.sum("total_chars").cast("double") / _SHARDS_N).alias("ideal_chars")
    )
    return per_shard.crossJoin(F.broadcast(totals)).select(
        "shard",
        "n_docs",
        "total_chars",
        "n_sources",
        (
            F.floor(F.col("total_chars") / F.col("ideal_chars") * 10000 + F.lit(0.5))
            / 10000
        ).alias("balance_r"),
    )


# --- q_privacy_pseudonym ------------------------------------------------------

_PSEUDO_SALT = "corpus-v1"  # rotate per release; same literal on both engines


_PSEUDO_ORACLE = f"""
WITH tok AS (
  SELECT c_custkey, c_nationkey,
         substr(sha256('{_PSEUDO_SALT}|' || CAST(c_custkey AS VARCHAR)), 1, 16)
           AS ptoken
  FROM customer
), o AS (
  SELECT o_custkey,
         substr(sha256('{_PSEUDO_SALT}|' || CAST(o_custkey AS VARCHAR)), 1, 16)
           AS ptoken
  FROM orders
)
SELECT c_nationkey AS nationkey,
       CAST(COUNT(DISTINCT tok.c_custkey) AS BIGINT) AS n_customers,
       CAST(COUNT(DISTINCT tok.ptoken) AS BIGINT) AS n_tokens,
       CAST(COUNT(o.ptoken) AS BIGINT) AS n_orders_via_token
FROM tok LEFT JOIN o ON o.ptoken = tok.ptoken
GROUP BY c_nationkey
"""


@register("q_privacy_pseudonym", oracle=_PSEUDO_ORACLE)
def q_privacy_pseudonym(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted-hash pseudonymization with a referential-integrity certificate:
    replace the customer key with substr(sha256(salt|key),16) in BOTH the
    entity table and the fact table, then prove the pseudonymized join still
    works — per nation, distinct tokens must equal distinct customers (no
    collisions collapsed two people) and the order count routed THROUGH the
    token join must equal the plaintext-key count. This is the de-identified-
    release pattern (GDPR pseudonymization): analysts join on tokens, the
    salt stays in the vault, rotating it unlinks releases.

    Scale shape: the token is a stateless projection on both scans (no
    shuffle added); the certificate join keys on the token exactly as the
    released lake would, so the plan IS the production access path — hash
    join on 16-hex-char strings, aggregate by nation. COUNT(DISTINCT key)
    vs COUNT(DISTINCT token) ride one Expand aggregate.
    """
    tok_expr = lambda key: F.substring(  # noqa: E731
        F.sha2(F.concat(F.lit(_PSEUDO_SALT + "|"), F.col(key).cast("string")), 256),
        1,
        16,
    )
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", tok_expr("c_custkey").alias("ptoken")
    )
    orders = load(spark, sf_dir, "orders").select(
        tok_expr("o_custkey").alias("optoken")
    )
    return (
        cust.join(orders, F.col("optoken") == F.col("ptoken"), "left")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.countDistinct("c_custkey").cast("bigint").alias("n_customers"),
            F.countDistinct("ptoken").cast("bigint").alias("n_tokens"),
            F.count("optoken").cast("bigint").alias("n_orders_via_token"),
        )
    )


# --- q_feature_binning --------------------------------------------------------

_BIN_CENTS = "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"
_N_BINS = 10


_BINNING_ORACLE = f"""
WITH base AS (
  SELECT c_mktsegment AS segment, {_BIN_CENTS} AS cents, o_orderkey
  FROM orders JOIN customer ON o_custkey = c_custkey
), binned AS (
  SELECT segment, cents,
         NTILE({_N_BINS}) OVER (
           PARTITION BY segment ORDER BY cents, o_orderkey
         ) AS bin
  FROM base
)
SELECT segment, bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(cents) AS lo_cents,
       MAX(cents) AS hi_cents
FROM binned GROUP BY segment, bin
"""


@register("q_feature_binning", oracle=_BINNING_ORACLE)
def q_feature_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency quantile binning (the feature-engineering
    discretizer): order value in integer cents NTILE'd into {_N_BINS}
    per-segment bins, reporting each bin's population and [lo, hi] edge
    certificate — the exact-rank counterpart to approxQuantile-based
    bucketizers, deterministic because ties break on the order key.

    Scale shape: the window partitions by segment so the rank sort
    parallelizes across groups (equal-frequency binning at 100 TB always
    bins per (feature, cohort) shard or samples edges; a single global
    NTILE would serialize — same reasoning as q_pack_sequences). One
    shuffle shared by the window and the rollup. All values are exact
    integer cents.
    """
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", F.expr(_BIN_CENTS).alias("cents")
    )
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    base = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    w = Window.partitionBy("segment").orderBy("cents", "o_orderkey")
    return (
        base.select("segment", "cents", F.ntile(_N_BINS).over(w).alias("bin"))
        .groupBy("segment", "bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
    )


# --- q_sample_neyman ----------------------------------------------------------

_NEYMAN_BUDGET = 1000  # total sample size to allocate across strata


_NEYMAN_ORACLE = f"""
WITH base AS (
  SELECT c_mktsegment AS segment, {_BIN_CENTS} AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
), st AS (
  SELECT segment,
         CAST(COUNT(*) AS BIGINT) AS n_h,
         CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
         CAST(SUM(CAST(cents AS DECIMAL(38,0)) * cents) AS DECIMAL(38,0)) AS s2
  FROM base GROUP BY segment
), sd AS (
  -- stddev in DOLLARS, 4-decimal snapped: keeps w_h = N_h * s_h inside the
  -- exact decimal(18,7) range (N_h ~ 1e6, s_h ~ 1e4 at SF100)
  SELECT segment, n_h,
         FLOOR(SQRT(CAST(n_h * s2 - s1 * s1 AS DOUBLE)
                    / (CAST(n_h AS DOUBLE) * (n_h - 1))) / 100
               * 10000 + 0.5) / 10000 AS s_r4
  FROM st
), wsum AS (
  SELECT CAST(SUM(CAST(n_h * s_r4 AS DECIMAL(18,7))) AS DOUBLE) AS w_total
  FROM sd
), alloc AS (
  SELECT segment, n_h, s_r4,
         CAST(FLOOR({_NEYMAN_BUDGET} * (n_h * s_r4) / w_total) AS BIGINT)
           AS n_floor,
         FLOOR(({_NEYMAN_BUDGET} * (n_h * s_r4) / w_total
                - FLOOR({_NEYMAN_BUDGET} * (n_h * s_r4) / w_total))
               * 1000000 + 0.5) AS frac_micro
  FROM sd, wsum
), leftover AS (
  SELECT CAST({_NEYMAN_BUDGET} - SUM(n_floor) AS BIGINT) AS extra FROM alloc
), ranked AS (
  SELECT segment, n_h, s_r4, n_floor, frac_micro,
         ROW_NUMBER() OVER (ORDER BY frac_micro DESC, segment) AS rr
  FROM alloc
)
SELECT segment, n_h, s_r4,
       CAST(n_floor + CASE WHEN rr <= extra THEN 1 ELSE 0 END AS BIGINT)
         AS n_alloc
FROM ranked, leftover
"""


@register("q_sample_neyman", oracle=_NEYMAN_ORACLE)
def q_sample_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation: split a fixed budget of
    {_NEYMAN_BUDGET} samples across customer segments proportionally to
    N_h·σ_h (big AND volatile strata get more), with largest-remainder
    rounding so the allocation sums exactly to the budget — the
    survey-statistics answer to "how many rows from each stratum", the rung
    above q_sample_stratified's fixed fractions.

    Exactness: per-stratum moment sums run in decimal(38,0) (cents² sums
    reach ~1e21 at SF100 — far beyond bigint, comfortably inside 38 digits);
    σ converts to dollars and snaps to 4 decimals so every weight N_h·σ_h is
    exact in decimal(18,7); remainders snap to micros before the
    largest-remainder ranking, segment-name tie-break.

    Scale shape: one segment-keyed aggregate with map-side combine collapses
    the fact table to |strata| rows; everything after runs on that tiny
    relation (broadcast total, 5-row window). The allocation row set IS the
    sampler's config table at 100 TB.
    """
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", F.expr(_BIN_CENTS).alias("cents")
    )
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    base = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    st = base.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_h"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s1"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias("s2"),
    )
    s_r4 = (
        F.floor(
            F.sqrt(
                (F.col("n_h") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
                    "double"
                )
                / (F.col("n_h").cast("double") * (F.col("n_h") - 1))
            )
            / 100
            * 10000
            + F.lit(0.5)
        )
        / 10000
    )
    sd = st.select("segment", "n_h", s_r4.alias("s_r4"))
    wsum = sd.agg(
        F.sum((F.col("n_h") * F.col("s_r4")).cast(DEC))
        .cast("double")
        .alias("w_total")
    )
    share = F.lit(_NEYMAN_BUDGET) * (F.col("n_h") * F.col("s_r4")) / F.col("w_total")
    alloc = sd.crossJoin(F.broadcast(wsum)).select(
        "segment",
        "n_h",
        "s_r4",
        F.floor(share).cast("bigint").alias("n_floor"),
        F.floor((share - F.floor(share)) * 1000000 + F.lit(0.5)).alias(
            "frac_micro"
        ),
    )
    leftover = alloc.agg(
        (F.lit(_NEYMAN_BUDGET) - F.sum("n_floor")).cast("bigint").alias("extra")
    )
    ranked = alloc.select(
        "segment",
        "n_h",
        "s_r4",
        "n_floor",
        F.row_number()
        .over(Window.orderBy(F.desc("frac_micro"), "segment"))
        .alias("rr"),
    )
    return ranked.crossJoin(F.broadcast(leftover)).select(
        "segment",
        "n_h",
        "s_r4",
        (
            F.col("n_floor")
            + F.when(F.col("rr") <= F.col("extra"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_alloc"),
    )


# --- q_quality_checksum ---------------------------------------------------------

_CKSUM_ORACLE = """
WITH rows_ AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         ('0x' || substr(sha256(
            CAST(o_orderkey AS VARCHAR) || '|' ||
            CAST(o_custkey AS VARCHAR) || '|' ||
            CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR)
            || '|' || CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
          ), 1, 15))::BIGINT AS h
  FROM orders
)
SELECT month,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(bit_xor(h) AS BIGINT) AS xor_fold,
       CAST(SUM(CAST(h AS DECIMAL(38,0))) AS VARCHAR) AS sum_fold
FROM rows_ GROUP BY month
"""


@register("q_quality_checksum", oracle=_CKSUM_ORACLE)
def q_quality_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table checksum — the migration/replication equality
    certificate: per month, a canonical row string (key fields joined with
    '|', money as integer cents, dates ISO) hashes through sha256 to a 60-bit
    integer, folded two ways — XOR (order- and overflow-free; any single
    changed row flips it) and an exact decimal(38,0) SUM (catches the
    XOR-blind case of an even number of identical corruptions). Two lakes
    agree on every (month, n_rows, xor_fold, sum_fold) row ⟺ the table
    migrated losslessly — without ever shipping the rows.

    Scale shape: stateless projection (hash) + one month-keyed aggregate with
    map-side combine; both folds are mergeable, so per-partition partials
    compose across 100 TB and across engines (this oracle IS the cross-engine
    run). The sum fold is emitted as a string because exact 38-digit integers
    exceed every engine-portable numeric wire type.
    """
    orders = load(spark, sf_dir, "orders")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").cast("string"),
        F.col("o_orderdate").cast("date").cast("string"),
    )
    h = F.conv(F.substring(F.sha2(canon, 256), 1, 15), 16, 10).cast("bigint")
    return (
        orders.select(F.trunc("o_orderdate", "month").alias("month"), h.alias("h"))
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.expr("bit_xor(h)").cast("bigint").alias("xor_fold"),
            F.sum(F.col("h").cast("decimal(38,0)")).cast("string").alias("sum_fold"),
        )
    )


# --- q_feature_woe --------------------------------------------------------------

_WOE_ORACLE = """
WITH base AS (
  SELECT c_mktsegment AS segment,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad
  FROM orders JOIN customer ON o_custkey = c_custkey
), seg AS (
  SELECT segment,
         CAST(SUM(1 - bad) AS BIGINT) AS n_good,
         CAST(SUM(bad) AS BIGINT) AS n_bad
  FROM base GROUP BY segment
), tot AS (
  SELECT CAST(SUM(n_good) AS BIGINT) AS tg, CAST(SUM(n_bad) AS BIGINT) AS tb
  FROM seg
), woe AS (
  SELECT segment, n_good, n_bad,
         CAST(FLOOR(LN((CAST(n_good AS DOUBLE) / tg)
                       / (CAST(n_bad AS DOUBLE) / tb))
                    * 1000000 + 0.5) AS BIGINT) AS woe_micro,
         CAST(n_good AS DOUBLE) / tg - CAST(n_bad AS DOUBLE) / tb AS dpct
  FROM seg, tot
)
SELECT segment, n_good, n_bad, woe_micro,
       CAST(FLOOR(dpct * (woe_micro / 1000000.0) * 1000000 + 0.5) AS BIGINT)
         AS iv_micro
FROM woe
"""


@register("q_feature_woe", oracle=_WOE_ORACLE)
def q_feature_woe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight of Evidence + Information Value per category — the credit-
    scoring feature screen: for each customer segment, WoE = ln(share of
    goods / share of bads) against the binary target "order finalized"
    (o_orderstatus = 'F'), and the segment's IV contribution
    (p_good − p_bad)·WoE. IV sums over segments rank features for model
    inclusion (the classic <0.02 useless / >0.3 strong bands); WoE is the
    monotone encoding scorecards use directly.

    Parity: good/bad shares are ratios of exact integers; ln snaps to micros
    BEFORE the IV product, and the product snaps again — both engines
    multiply identical snapped integers.

    Scale shape: one conditional-sum aggregate per segment (single scan,
    map-side combine), totals fan back broadcast; at 100 TB the same plan
    runs per (feature, bin) over hundreds of candidate features in one
    grouping-sets pass.
    """
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("bad"),
    )
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    seg = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("segment")
        .agg(
            F.sum(1 - F.col("bad")).cast("bigint").alias("n_good"),
            F.sum("bad").cast("bigint").alias("n_bad"),
        )
    )
    tot = seg.agg(
        F.sum("n_good").cast("bigint").alias("tg"),
        F.sum("n_bad").cast("bigint").alias("tb"),
    )
    pg = F.col("n_good").cast("double") / F.col("tg")
    pb = F.col("n_bad").cast("double") / F.col("tb")
    woe_micro = F.floor(F.log(pg / pb) * 1000000 + F.lit(0.5)).cast("bigint")
    w = seg.crossJoin(F.broadcast(tot)).select(
        "segment",
        "n_good",
        "n_bad",
        woe_micro.alias("woe_micro"),
        (pg - pb).alias("dpct"),
    )
    return w.select(
        "segment",
        "n_good",
        "n_bad",
        "woe_micro",
        F.floor(
            F.col("dpct") * (F.col("woe_micro") / 1000000.0) * 1000000
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("iv_micro"),
    )


# --- q_feature_target_encode -------------------------------------------------

_TE_PRIOR_M = 20  # pseudo-observations of the global rate in the smoothed encoding


_TE_ORACLE = f"""
WITH base AS (
  SELECT c_mktsegment AS seg,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders JOIN customer ON o_custkey = c_custkey
), cell AS (
  SELECT seg, y, CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM base GROUP BY seg, y
), segstat AS (
  SELECT seg, y, n_rows,
         CAST(SUM(n_rows) OVER (PARTITION BY seg) AS BIGINT) AS n_g,
         CAST(SUM(y * n_rows) OVER (PARTITION BY seg) AS BIGINT) AS s_g,
         CAST(SUM(n_rows) OVER () AS BIGINT) AS n_all,
         CAST(SUM(y * n_rows) OVER () AS BIGINT) AS s_all
  FROM cell
)
SELECT seg, CAST(y AS BIGINT) AS y, n_rows,
       CAST(s_g - y AS BIGINT) AS loo_num,
       CAST(n_g - 1 AS BIGINT) AS loo_den,
       FLOOR(CAST(s_g - y AS DOUBLE) / (n_g - 1) * 10000 + 0.5) / 10000
         AS loo_rate_r4,
       FLOOR((CAST(s_g - y AS DOUBLE)
              + {_TE_PRIOR_M} * (CAST(s_all AS DOUBLE) / n_all))
             / (n_g - 1 + {_TE_PRIOR_M}) * 10000 + 0.5) / 10000
         AS smooth_rate_r4
FROM segstat
"""


@register("q_feature_target_encode", oracle=_TE_ORACLE)
def q_feature_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of market segment against order
    outcome (finalized vs not) — the standard high-cardinality categorical
    encoder for gradient-boosting features, built the only way that is
    leakage-safe: each row's own label is excluded from its category rate,
    and a prior of m = 20 pseudo-observations of the global rate shrinks
    small categories toward the mean.

    The key observation that makes this a 100 TB operator: within a
    (category, label) cell the LOO encoding is CONSTANT — (s_g − y)/(n_g − 1)
    depends only on the cell — so the encoder never touches rows. The query
    emits the (segment, y) ENCODER TABLE (counts + exact integer
    numerator/denominator + r4-snapped plain and smoothed rates); training
    joins it back broadcast. The naive per-row formulation shuffles the fact
    table; this one is two hash aggregates over |segments|·2 cells.

    Parity: n/s per segment and globally are exact bigints from one window
    over the tiny cell relation; both rates are single double expressions of
    identical integers (the prior literal m = 20 is shared), snapped r4.
    """
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("seg")
    )
    cell = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("seg", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )
    wseg = Window.partitionBy("seg")
    wall = Window.partitionBy()
    segstat = cell.select(
        "seg",
        "y",
        "n_rows",
        F.sum("n_rows").over(wseg).cast("bigint").alias("n_g"),
        F.sum(F.col("y") * F.col("n_rows")).over(wseg).cast("bigint").alias("s_g"),
        F.sum("n_rows").over(wall).cast("bigint").alias("n_all"),
        F.sum(F.col("y") * F.col("n_rows")).over(wall).cast("bigint").alias("s_all"),
    )
    loo_num = (F.col("s_g") - F.col("y")).cast("bigint")
    loo_den = (F.col("n_g") - 1).cast("bigint")
    loo_rate = loo_num.cast("double") / (F.col("n_g") - 1)
    smooth = (
        loo_num.cast("double")
        + _TE_PRIOR_M * (F.col("s_all").cast("double") / F.col("n_all"))
    ) / (F.col("n_g") - 1 + _TE_PRIOR_M)
    return segstat.select(
        "seg",
        F.col("y").cast("bigint").alias("y"),
        "n_rows",
        loo_num.alias("loo_num"),
        loo_den.alias("loo_den"),
        (F.floor(loo_rate * 10000 + F.lit(0.5)) / 10000).alias("loo_rate_r4"),
        (F.floor(smooth * 10000 + F.lit(0.5)) / 10000).alias("smooth_rate_r4"),
    )


# --- q_sample_systematic -------------------------------------------------------

_SYS_INTERVAL = 37  # take every 37th row of the hash-ordered frame


_SYS_ORACLE = f"""
WITH o AS (
  SELECT c_mktsegment AS seg,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         ('0x' || substr(sha256(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT
           AS hkey,
         o_orderkey
  FROM orders JOIN customer ON o_custkey = c_custkey
), ranked AS (
  SELECT seg, cents,
         row_number() OVER (PARTITION BY seg ORDER BY hkey, o_orderkey) AS rn
  FROM o
)
SELECT seg,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN rn % {_SYS_INTERVAL} = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sampled,
       CAST((COUNT(*) + {_SYS_INTERVAL - 1}) // {_SYS_INTERVAL} AS BIGINT)
         AS expected,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(SUM(CASE WHEN rn % {_SYS_INTERVAL} = 1 THEN cents ELSE 0 END)
            AS BIGINT) AS sampled_cents,
       FLOOR(CAST(SUM(CASE WHEN rn % {_SYS_INTERVAL} = 1 THEN cents ELSE 0 END)
                  AS DOUBLE) * {_SYS_INTERVAL} / SUM(cents) * 10000 + 0.5)
         / 10000 AS spend_ratio_r4
FROM ranked
GROUP BY seg
"""


@register("q_sample_systematic", oracle=_SYS_ORACLE)
def q_sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic sampling per stratum — order each segment's orders by a
    deterministic 60-bit hash (a reproducible 'random' shuffle), then take
    every 37th row. Survey statistics' second classic design next to
    q_sample_stratified (Bernoulli-by-hash): systematic draws give BOUNDED
    sample size per stratum (⌈n/37⌉ exactly — no binomial variance), which
    is what capacity-planned downstream stages (labeling budgets, eval
    sets) actually need. The certificate emits per stratum the achieved
    vs expected count and the spend-representativeness ratio (sampled
    spend × 37 / total spend ≈ 1 when the draw is unbiased).

    Parity: hash order is the shared sha256-prefix bigint with key
    tie-break; counts/cents exact; the only float is the final snapped
    ratio. Scale shape: one window per stratum (at 100 TB: the rank comes
    from a per-partition scan count when the frame is hash-bucketed —
    or keep hash-Bernoulli sampling, whose rate certificate is
    q_sample_hash; the point of THIS query is the fixed-size guarantee).
    """
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("seg")
    )
    o = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        "seg",
        "cents",
        "o_orderkey",
        F.conv(F.substring(F.sha2(F.col("o_orderkey").cast("string"), 256), 1, 15), 16, 10)
        .cast("bigint")
        .alias("hkey"),
    )
    w = Window.partitionBy("seg").orderBy("hkey", "o_orderkey")
    ranked = o.select("seg", "cents", F.row_number().over(w).alias("rn"))
    sampled = F.col("rn") % _SYS_INTERVAL == 1
    s_cnt = F.sum(F.when(sampled, 1).otherwise(0))
    s_cents = F.sum(F.when(sampled, F.col("cents")).otherwise(0))
    return ranked.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        s_cnt.cast("bigint").alias("n_sampled"),
        F.floor((F.count(F.lit(1)) + _SYS_INTERVAL - 1) / _SYS_INTERVAL)
        .cast("bigint")
        .alias("expected"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        s_cents.cast("bigint").alias("sampled_cents"),
        (
            F.floor(
                s_cents.cast("double")
                * _SYS_INTERVAL
                / F.sum("cents")
                * 10000
                + F.lit(0.5)
            )
            / 10000
        ).alias("spend_ratio_r4"),
    )


# --- q_feature_auc ----------------------------------------------------------

_AUC_ORACLE = """
WITH feat AS (
  SELECT o.o_orderkey,
         CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS label,
         CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS f_price_cents,
         l.n_lines, l.qty_units
  FROM orders o
  JOIN (SELECT l_orderkey,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_units
        FROM lineitem GROUP BY l_orderkey) l
    ON o.o_orderkey = l.l_orderkey
), long AS (
  SELECT 'f_price_cents' AS feature, f_price_cents AS v, label FROM feat
  UNION ALL
  SELECT 'f_n_lines' AS feature, n_lines AS v, label FROM feat
  UNION ALL
  SELECT 'f_qty_units' AS feature, qty_units AS v, label FROM feat
), vals AS (
  SELECT feature, v,
         CAST(SUM(label) AS BIGINT) AS n1_v,
         CAST(COUNT(*) AS BIGINT) AS t
  FROM long GROUP BY feature, v
), ranked AS (
  SELECT feature, v, n1_v, t,
         COALESCE(SUM(t) OVER (
           PARTITION BY feature
           ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cum_before
  FROM vals
), agg AS (
  SELECT feature,
         CAST(SUM(n1_v) AS BIGINT) AS n_pos,
         CAST(SUM(t - n1_v) AS BIGINT) AS n_neg,
         CAST(SUM(n1_v * (2 * cum_before + t + 1)) AS BIGINT) AS r1_x2
  FROM ranked GROUP BY feature
  HAVING SUM(n1_v) > 0 AND SUM(t - n1_v) > 0
)
SELECT feature, n_pos, n_neg,
       CAST(FLOOR(CAST(r1_x2 - n_pos * (n_pos + 1) AS DOUBLE)
                  / (2.0 * n_pos * n_neg) * 1000000 + 0.5) AS BIGINT)
         AS auc_micro,
       CAST(FLOOR((CAST(r1_x2 - n_pos * (n_pos + 1) AS DOUBLE)
                   / (2.0 * n_pos * n_neg) * 2 - 1) * 1000000 + 0.5) AS BIGINT)
         AS gini_micro
FROM agg
"""


@register("q_feature_auc", oracle=_AUC_ORACLE)
def q_feature_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-feature ROC AUC against a binary target — the single-feature
    discrimination screen every tabular-ML feature store runs before
    training (and the leakage detector: AUC ≈ 1 means the feature IS the
    label). AUC equals the Mann-Whitney U statistic normalized by
    n_pos·n_neg, so ranks are never assigned row-by-row: the statistic
    collapses to the VALUE DISTRIBUTION per feature — per distinct value:
    positive count and total count — and one cumulative window over
    DISTINCT values gives the tie-averaged positive rank sum as an exact
    integer, 2·R₁ = Σ_v n1ᵥ·(2·cum_before(v) + tᵥ + 1) (same machinery as
    q_events_mannwhitney, reused for the ML metric). Gini = 2·AUC − 1.

    Scale shape: one lineitem aggregate (map-side combined), one join to
    orders on the shared orderkey, a 3-way unpivot into (feature, value)
    rows, then a groupBy on (feature, value) whose output is |features| ×
    |distinct values| — tiny — and a window over that tiny relation. At
    1000 features the unpivot widens but the plan is unchanged; no per-row
    ranking ever happens. Exact: counts and 2·R₁ are bigints; the single
    double division is the identical IEEE sequence on both engines.
    """
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("qty_units"),
    )
    feat = orders.join(per_order, orders.o_orderkey == per_order.l_orderkey).select(
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("label"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("f_price_cents"),
        "n_lines",
        "qty_units",
    )
    long = feat.selectExpr(
        "stack(3, 'f_price_cents', f_price_cents,"
        " 'f_n_lines', n_lines, 'f_qty_units', qty_units) AS (feature, v)",
        "label",
    )
    vals = long.groupBy("feature", "v").agg(
        F.sum("label").cast("bigint").alias("n1_v"),
        F.count(F.lit(1)).cast("bigint").alias("t"),
    )
    w = (
        Window.partitionBy("feature")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = vals.withColumn(
        "cum_before", F.coalesce(F.sum("t").over(w), F.lit(0))
    )
    agg = ranked.groupBy("feature").agg(
        F.sum("n1_v").cast("bigint").alias("n_pos"),
        F.sum(F.col("t") - F.col("n1_v")).cast("bigint").alias("n_neg"),
        F.sum(
            F.col("n1_v") * (2 * F.col("cum_before") + F.col("t") + 1)
        )
        .cast("bigint")
        .alias("r1_x2"),
    ).filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
    # Degenerate-class guard: a feature partition whose labels are all 0 or
    # all 1 has AUC undefined (0/0); DuckDB's FLOOR('nan'/'inf') casts and
    # Spark's floor(NaN)→null diverge, so both engines drop the row instead.
    auc = (
        (F.col("r1_x2") - F.col("n_pos") * (F.col("n_pos") + 1)).cast("double")
        / (2.0 * F.col("n_pos") * F.col("n_neg"))
    )
    return agg.select(
        "feature",
        "n_pos",
        "n_neg",
        F.floor(auc * 1000000 + F.lit(0.5)).cast("bigint").alias("auc_micro"),
        F.floor((auc * 2 - 1) * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("gini_micro"),
    )


# --- q_feature_ece ----------------------------------------------------------

_ECE_ORACLE = """
WITH scored AS (
  SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
), mx AS (
  SELECT CAST(MAX(cents) AS BIGINT) AS max_cents FROM scored
), binned AS (
  SELECT label, cents, max_cents,
         LEAST(9, CAST(FLOOR(CAST(cents AS DOUBLE) * 10 / max_cents)
                       AS BIGINT)) AS bin
  FROM scored CROSS JOIN mx
), cells AS (
  SELECT bin,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(label) AS BIGINT) AS n_pos,
         CAST(SUM(cents) AS BIGINT) AS sum_cents,
         CAST(MAX(max_cents) AS BIGINT) AS max_cents
  FROM binned GROUP BY bin
), gaps AS (
  SELECT bin, n, n_pos,
         CAST(FLOOR(CAST(sum_cents AS DOUBLE) / n / max_cents * 1000000
                    + 0.5) AS BIGINT) AS conf_micro,
         CAST(FLOOR(CAST(n_pos AS DOUBLE) / n * 1000000 + 0.5) AS BIGINT)
           AS acc_micro
  FROM cells
)
SELECT bin, n, n_pos, conf_micro, acc_micro,
       ABS(acc_micro - conf_micro) AS gap_micro,
       CAST(FLOOR(CAST(SUM(n * ABS(acc_micro - conf_micro)) OVER () AS DOUBLE)
                  / SUM(n) OVER () + 0.5) AS BIGINT) AS ece_micro
FROM gaps
"""


@register("q_feature_ece", oracle=_ECE_ORACLE)
def q_feature_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected Calibration Error — the reliability-diagram certificate for
    a probabilistic score (here the normalized order value standing in for
    a model score): 10 fixed-width confidence bins, per-bin confidence
    (mean score) vs accuracy (positive rate), ECE = Σ n_b·|acc_b − conf_b|
    / N. The score is exact integer cents over a broadcast scalar max, so
    per-bin sums are bigints; the only doubles are two per-bin divisions
    (identical IEEE sequence on both engines) and every emitted value is
    micro-snapped BEFORE the cross-bin total, so the final window SUM adds
    exact bigints — no float accumulation across bins.

    Scale shape: one scalar max (broadcast), one map-side-combined
    aggregate to ≤10 cells, two windows over 10 rows. The 100 TB plan is
    identical with (model, segment) prepended to the bin key.
    """
    orders = load(spark, sf_dir, "orders")
    scored = orders.select(
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("label"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    mx = scored.agg(F.max("cents").cast("bigint").alias("max_cents"))
    binned = scored.crossJoin(F.broadcast(mx)).select(
        "label",
        "cents",
        "max_cents",
        F.least(
            F.lit(9),
            F.floor(F.col("cents").cast("double") * 10 / F.col("max_cents"))
            .cast("bigint"),
        ).alias("bin"),
    )
    cells = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("label").cast("bigint").alias("n_pos"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
        F.max("max_cents").cast("bigint").alias("max_cents"),
    )
    gaps = cells.select(
        "bin",
        "n",
        "n_pos",
        F.floor(
            F.col("sum_cents").cast("double")
            / F.col("n")
            / F.col("max_cents")
            * 1000000
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("conf_micro"),
        F.floor(
            F.col("n_pos").cast("double") / F.col("n") * 1000000 + F.lit(0.5)
        )
        .cast("bigint")
        .alias("acc_micro"),
    )
    wall = Window.partitionBy()
    gap = F.abs(F.col("acc_micro") - F.col("conf_micro"))
    return gaps.select(
        "bin",
        "n",
        "n_pos",
        "conf_micro",
        "acc_micro",
        gap.alias("gap_micro"),
        F.floor(
            F.sum(F.col("n") * gap).over(wall).cast("double")
            / F.sum("n").over(wall)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("ece_micro"),
    )


# --- q_feature_lift -----------------------------------------------------------

_LIFT_ORACLE = """
WITH scored AS (
  SELECT o_orderkey, CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
), ranked AS (
  SELECT label,
         ROW_NUMBER() OVER (ORDER BY cents DESC, o_orderkey) AS rk,
         COUNT(*) OVER () AS nn
  FROM scored
), cells AS (
  SELECT CAST(((rk - 1) * 10) // nn AS BIGINT) AS decile,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(label) AS BIGINT) AS n_pos,
         CAST(MAX(nn) AS BIGINT) AS nn
  FROM ranked GROUP BY 1
), tot AS (
  SELECT CAST(SUM(n_pos) AS BIGINT) AS p FROM cells
)
SELECT decile, n, n_pos,
       CAST(SUM(n_pos) OVER (ORDER BY decile
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_pos,
       CAST(FLOOR(CAST(n_pos AS DOUBLE) * nn / (CAST(n AS DOUBLE) * p)
                  * 1000000 + 0.5) AS BIGINT) AS lift_micro,
       CAST(FLOOR(CAST(SUM(n_pos) OVER (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                  / p * 1000000 + 0.5) AS BIGINT) AS cum_gain_micro
FROM cells CROSS JOIN tot
"""


@register("q_feature_lift", oracle=_LIFT_ORACLE)
def q_feature_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / decile lift table — the model-eval chart next to
    q_feature_auc (threshold-free rank quality) and q_feature_ece
    (calibration): rank rows by score (order value standing in for a model
    score), cut into 10 equal-count deciles, and report per-decile lift
    (decile positive rate / overall positive rate) and cumulative gain
    (share of all positives captured so far) — "calling the top 20% of this
    list reaches X% of responders", the number campaign planners act on.

    Parity: decile assignment is pure integer arithmetic over a
    deterministic (cents DESC, orderkey) rank — ((rk−1)·10) div N — so both
    engines cut identical deciles; counts are bigints and the two reported
    ratios are single snapped double divisions.

    Scale shape — tie-block decomposition, NO fact-level global window:
    the global rank over (cents DESC, orderkey) equals the row count of
    all strictly-higher cents blocks (``start``, a cumulative sum over the
    DISTINCT-cents relation — domain-bounded: at most one row per possible
    price in cents, independent of fact count) plus the intra-block
    row_number over a window PARTITIONED BY cents. So the only
    unpartitioned window runs over the collapsed value distribution, the
    per-row ranking is fully parallel across cents partitions, and the
    join-back on cents reuses the window's hash partitioning (one
    exchange, verified in the plan snapshot). Bit-identical to the single
    global sort because o_orderkey is unique within a block. Same
    machinery as q_feature_auc / q_events_mannwhitney value-distribution
    ranks; collapse-first precedent q_abc_classification.
    """
    orders = load(spark, sf_dir, "orders")
    scored = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("label"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    blocks = scored.groupBy("cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("bn")
    )
    w_off = Window.orderBy(F.desc("cents")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_tot = Window.orderBy(F.desc("cents")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # total N rides the same sorted pass as the offsets — no second
    # aggregate over blocks, no crossJoin, no duplicated subtree.
    offs = blocks.select(
        "cents",
        F.coalesce(F.sum("bn").over(w_off), F.lit(0)).alias("start"),
        F.sum("bn").over(w_tot).cast("bigint").alias("nn"),
    )
    w_intra = Window.partitionBy("cents").orderBy("o_orderkey")
    ranked = scored.join(offs, "cents").select(
        "label",
        "nn",
        (F.col("start") + F.row_number().over(w_intra)).alias("rk"),
    )
    cells = ranked.groupBy(
        F.expr("((rk - 1) * 10) div nn").cast("bigint").alias("decile")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("label").cast("bigint").alias("n_pos"),
        F.max("nn").cast("bigint").alias("nn"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    w_p = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum_pos = F.sum("n_pos").over(w_cum).cast("bigint")
    # total positives P rides the same ≤10-row sorted pass as cum_pos —
    # no second aggregate over cells, no crossJoin re-derivation.
    return cells.withColumn("p", F.sum("n_pos").over(w_p)).select(
        "decile",
        "n",
        "n_pos",
        cum_pos.alias("cum_pos"),
        F.floor(
            F.col("n_pos").cast("double")
            * F.col("nn")
            / (F.col("n").cast("double") * F.col("p"))
            * 1000000
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("lift_micro"),
        F.floor(cum_pos.cast("double") / F.col("p") * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("cum_gain_micro"),
    )


# --- q_feature_pr_auc -----------------------------------------------------------

_AP_ORACLE = """
WITH scored AS (
  SELECT o_orderkey, CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
), ranked AS (
  SELECT label,
         ROW_NUMBER() OVER (ORDER BY cents DESC, o_orderkey) AS rk,
         SUM(label) OVER (ORDER BY cents DESC, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos
  FROM scored
), terms AS (
  SELECT CAST(FLOOR(CAST(cum_pos AS DOUBLE) / rk * 1000000 + 0.5) AS BIGINT)
           AS prec_micro
  FROM ranked WHERE label = 1
)
SELECT CAST((SELECT COUNT(*) FROM ranked) AS BIGINT) AS n,
       CAST(COUNT(*) AS BIGINT) AS n_pos,
       CAST(FLOOR(CAST(SUM(prec_micro) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT)
         AS ap_micro,
       CAST(FLOOR(CAST(COUNT(*) AS DOUBLE)
                  / (SELECT COUNT(*) FROM ranked) * 1000000 + 0.5) AS BIGINT)
         AS baseline_micro
FROM terms
HAVING COUNT(*) > 0
"""


@register("q_feature_pr_auc", oracle=_AP_ORACLE)
def q_feature_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average Precision (the area under the precision-recall curve by the
    step-interpolation every ranking library reports) of the score/label
    setup the rest of the feature-screen family shares: AP =
    mean over positives of precision@their-rank. The PR view complements
    q_feature_auc's ROC view — under class imbalance ROC-AUC flatters a
    ranker while AP exposes it, which is why retrieval and rare-event
    models gate on AP. baseline_micro = the positive prevalence (a random
    ranker's AP) anchors the comparison on one row.

    Parity: ranks and cumulative positive counts are exact integers over
    the deterministic (cents DESC, orderkey) order; precision@k is
    micro-snapped PER POSITIVE before the sum (the dec_sum discipline),
    so the final mean divides one exact bigint by the positive count.

    Scale shape — tie-block decomposition, NO fact-level global window
    (same machinery as q_feature_lift): global rank = rows in
    strictly-higher cents blocks (``start``) + intra-block row_number
    partitioned by cents; the global running positive count decomposes
    identically into ``pos_before`` + an intra-block cumulative sum over
    the SAME cents-partitioned window, so rank and cum_pos share one
    partitioned sort. The only unpartitioned window runs over the
    collapsed distinct-cents relation (domain-bounded by the price range
    in cents, not the fact count); N arrives as a broadcast 1-row total.
    Bit-identical to the single global sort because o_orderkey is unique
    within a block.
    """
    orders = load(spark, sf_dir, "orders")
    scored = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("label"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    blocks = scored.groupBy("cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("bn"),
        F.sum("label").cast("bigint").alias("bpos"),
    )
    w_off = Window.orderBy(F.desc("cents")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_tot = Window.orderBy(F.desc("cents")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # total N rides the same sorted pass as the offsets — no second
    # aggregate over blocks, no crossJoin, no duplicated subtree.
    offs = blocks.select(
        "cents",
        F.coalesce(F.sum("bn").over(w_off), F.lit(0)).alias("start"),
        F.coalesce(F.sum("bpos").over(w_off), F.lit(0)).alias("pos_before"),
        F.sum("bn").over(w_tot).cast("bigint").alias("n"),
    )
    w_intra = Window.partitionBy("cents").orderBy("o_orderkey")
    w_icum = w_intra.rowsBetween(Window.unboundedPreceding, 0)
    ranked = scored.join(offs, "cents").select(
        "label",
        "n",
        (F.col("start") + F.row_number().over(w_intra)).alias("rk"),
        (F.col("pos_before") + F.sum("label").over(w_icum)).alias("cum_pos"),
    )
    terms = ranked.filter(F.col("label") == 1).select(
        "n",
        F.floor(
            F.col("cum_pos").cast("double") / F.col("rk") * 1000000 + F.lit(0.5)
        )
        .cast("bigint")
        .alias("prec_micro"),
    )
    return terms.groupBy("n").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pos"),
        F.floor(
            F.sum("prec_micro").cast("double") / F.count(F.lit(1)) + F.lit(0.5)
        )
        .cast("bigint")
        .alias("ap_micro"),
        F.floor(
            F.count(F.lit(1)).cast("double") / F.max("n") * 1000000 + F.lit(0.5)
        )
        .cast("bigint")
        .alias("baseline_micro"),
    ).select(
        F.col("n").cast("bigint").alias("n"), "n_pos", "ap_micro", "baseline_micro"
    )


# --- q_feature_ks -----------------------------------------------------------

_KS_ORACLE = """
WITH scored AS (
  SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
), vals AS (
  SELECT cents,
         CAST(SUM(label) AS BIGINT) AS n1_v,
         CAST(COUNT(*) AS BIGINT) AS t
  FROM scored GROUP BY cents
), cum AS (
  SELECT cents,
         SUM(n1_v) OVER (ORDER BY cents
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos,
         SUM(t) OVER (ORDER BY cents
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tot,
         SUM(n1_v) OVER () AS p,
         SUM(t) OVER () AS nn
  FROM vals
), diffs AS (
  SELECT cents, p, nn - p AS q,
         ABS(cum_pos * (nn - p) - (cum_tot - cum_pos) * p) AS xdiff
  FROM cum
), best AS (
  SELECT cents, p, q, xdiff,
         ROW_NUMBER() OVER (ORDER BY xdiff DESC, cents) AS rn
  FROM diffs
)
SELECT CAST(p AS BIGINT) AS n_pos,
       CAST(q AS BIGINT) AS n_neg,
       CAST(cents AS BIGINT) AS at_cents,
       CAST(FLOOR(CAST(xdiff AS DOUBLE) / (CAST(p AS DOUBLE) * CAST(q AS DOUBLE))
                  * 1000000 + 0.5) AS BIGINT) AS ks_micro
FROM best WHERE rn = 1
"""


@register("q_feature_ks", oracle=_KS_ORACLE)
def q_feature_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov separation between the positive and
    negative classes' score distributions — the credit-scoring industry's
    default discrimination statistic (the "KS" in every scorecard report):
    D = max over thresholds |CDF_pos − CDF_neg|, with the achieving score
    value reported as the natural operating threshold (the readout
    q_events_ks — the same exact cross-multiplied machinery applied to
    DRIFT between two event streams, experiments.py:774 — does not carry).
    Completes the feature-screen family (AUC = rank view, PR-AUC =
    imbalance view, lift = decile view, KS = single-best-cut view).

    Parity: the CDF difference is computed as the CROSS-MULTIPLIED exact
    integer |cum_pos·N_neg − cum_neg·N_pos| (no per-threshold division),
    the argmax is deterministic (ties break to the smallest score), and
    only the reported D gets one micro-snapped double division.

    Scale shape: the q_feature_auc value-distribution machinery — one
    groupBy collapses facts to distinct score values, every window
    (cumulative CDF, totals, argmax rank) runs over that domain-bounded
    relation, never over rows. No fact-level sort exists anywhere.
    """
    orders = load(spark, sf_dir, "orders")
    scored = orders.select(
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("label"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    vals = scored.groupBy("cents").agg(
        F.sum("label").cast("bigint").alias("n1_v"),
        F.count(F.lit(1)).cast("bigint").alias("t"),
    )
    w_cum = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    w_tot = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = vals.select(
        "cents",
        F.sum("n1_v").over(w_cum).alias("cum_pos"),
        F.sum("t").over(w_cum).alias("cum_tot"),
        F.sum("n1_v").over(w_tot).alias("p"),
        F.sum("t").over(w_tot).alias("nn"),
    )
    diffs = cum.select(
        "cents",
        "p",
        (F.col("nn") - F.col("p")).alias("q"),
        F.abs(
            F.col("cum_pos") * (F.col("nn") - F.col("p"))
            - (F.col("cum_tot") - F.col("cum_pos")) * F.col("p")
        ).alias("xdiff"),
    )
    w_best = Window.orderBy(F.desc("xdiff"), "cents")
    return (
        diffs.withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select(
            F.col("p").cast("bigint").alias("n_pos"),
            F.col("q").cast("bigint").alias("n_neg"),
            F.col("cents").cast("bigint").alias("at_cents"),
            F.floor(
                F.col("xdiff").cast("double")
                / (F.col("p").cast("double") * F.col("q").cast("double"))
                * 1000000
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("ks_micro"),
        )
    )


# --- q_feature_psi ----------------------------------------------------------

_PSI_PIVOT = "1998-01-01"

_PSI_ORACLE = f"""
WITH scored AS (
  SELECT CASE WHEN o_orderdate < TIMESTAMP '{_PSI_PIVOT}' THEN 0 ELSE 1 END
           AS period,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
), v AS (
  SELECT period, cents, CAST(COUNT(*) AS BIGINT) AS c
  FROM scored GROUP BY period, cents
), va AS (
  SELECT cents, c,
         SUM(c) OVER (ORDER BY cents
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(c) OVER () AS na
  FROM v WHERE period = 0
), edges AS (
  SELECT cents AS edge
  FROM va, UNNEST(range(CAST((10 * (cum - c)) // na + 1 AS BIGINT),
                        CAST(LEAST((10 * cum) // na, 9) + 1 AS BIGINT))) AS t(i)
  WHERE (10 * cum) // na >= (10 * (cum - c)) // na + 1
    AND (10 * (cum - c)) // na + 1 <= 9
), bucketed AS (
  SELECT v.period, v.c,
         (SELECT COUNT(*) FROM edges e WHERE v.cents > e.edge) AS bucket
  FROM v
), cells AS (
  SELECT bucket,
         CAST(COALESCE(SUM(CASE WHEN period = 0 THEN c END), 0) AS BIGINT) AS n_a,
         CAST(COALESCE(SUM(CASE WHEN period = 1 THEN c END), 0) AS BIGINT) AS n_b
  FROM bucketed GROUP BY bucket
), tot AS (
  SELECT CAST(SUM(CASE WHEN period = 0 THEN c END) AS BIGINT) AS na,
         CAST(SUM(CASE WHEN period = 1 THEN c END) AS BIGINT) AS nb
  FROM v
), terms AS (
  SELECT bucket, n_a, n_b,
         CAST(FLOOR((CAST(n_a + 1 AS DOUBLE) / (na + 10)
                     - CAST(n_b + 1 AS DOUBLE) / (nb + 10))
             * (FLOOR(LN((CAST(n_a + 1 AS DOUBLE) / (na + 10))
                         / (CAST(n_b + 1 AS DOUBLE) / (nb + 10)))
                      * 1000000 + 0.5) / 1000000.0)
             * 1000000 + 0.5) AS BIGINT) AS term_micro
  FROM cells CROSS JOIN tot
)
SELECT CAST(bucket AS BIGINT) AS bucket, n_a, n_b, term_micro,
       CAST(SUM(term_micro) OVER () AS BIGINT) AS psi_micro
FROM terms
"""


@register("q_feature_psi", oracle=_PSI_ORACLE)
def q_feature_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTILE-binned Population Stability Index between two time periods
    of the score distribution — the scorecard-monitoring convention
    (baseline DECILE edges, so every reference bucket holds ~10% of
    baseline mass), complementing q_quality_psi's equal-WIDTH fixed-bin
    form (operators/scans.py — the mergeable monitoring-job variant, over
    events): equal-count edges track drift in the distribution's SHAPE
    where equal-width bins under-resolve dense regions. PSI =
    Σ (p_a − p_b)·ln(p_a/p_b) (>0.1 investigate, >0.25 retrain);
    Laplace-smoothed shares ((n+1)/(N+10)) keep empty buckets finite —
    documented, applied identically in both engines.

    Parity: decile edges are exact integer threshold arithmetic over the
    baseline's value distribution; bucket membership is value-defined
    (v > edge, deterministic under ties); each ln ratio of exact rationals
    is micro-snapped BEFORE the product and each term micro-snapped before
    the cross-bucket sum, so the final PSI is an exact bigint sum.

    Scale shape: one (period, value) groupBy collapses facts; the edge
    derivation (cumulative window + block arithmetic — which deciles cross
    inside this value's run) and everything after runs over the
    domain-bounded distinct-value relation; the 9-edge array broadcasts.
    No fact-level sort, no per-row rank.
    """
    orders = load(spark, sf_dir, "orders")
    scored = orders.select(
        F.when(F.col("o_orderdate") < F.lit(_PSI_PIVOT).cast("timestamp"), 0)
        .otherwise(1)
        .alias("period"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    v = scored.groupBy("period", "cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w_cum = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    w_tot = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    va = (
        v.filter(F.col("period") == 0)
        .select(
            "cents",
            "c",
            F.sum("c").over(w_cum).alias("cum"),
            F.sum("c").over(w_tot).alias("na"),
        )
    )
    lo = F.expr("(10 * (cum - c)) div na + 1")
    hi = F.least(F.expr("(10 * cum) div na"), F.lit(9).cast("bigint"))
    edges = (
        va.filter((hi >= lo) & (lo <= 9))
        .select(F.explode(F.sequence(lo, hi)).alias("i"), F.col("cents").alias("edge"))
    )
    earr = edges.agg(F.sort_array(F.collect_list("edge")).alias("earr"))
    bucketed = v.crossJoin(F.broadcast(earr)).select(
        "period",
        "c",
        F.size(F.filter("earr", lambda e: F.col("cents") > e)).alias("bucket"),
    )
    cells = bucketed.groupBy("bucket").agg(
        F.coalesce(F.sum(F.when(F.col("period") == 0, F.col("c"))), F.lit(0))
        .cast("bigint")
        .alias("n_a"),
        F.coalesce(F.sum(F.when(F.col("period") == 1, F.col("c"))), F.lit(0))
        .cast("bigint")
        .alias("n_b"),
    )
    tot = v.agg(
        F.sum(F.when(F.col("period") == 0, F.col("c"))).cast("bigint").alias("na"),
        F.sum(F.when(F.col("period") == 1, F.col("c"))).cast("bigint").alias("nb"),
    )
    pa = (F.col("n_a") + 1).cast("double") / (F.col("na") + 10)
    pb = (F.col("n_b") + 1).cast("double") / (F.col("nb") + 10)
    lnr = F.floor(F.log(pa / pb) * 1000000 + F.lit(0.5)) / 1000000.0
    terms = cells.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_a",
        "n_b",
        F.floor((pa - pb) * lnr * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("term_micro"),
    )
    w10 = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return terms.select(
        F.col("bucket").cast("bigint").alias("bucket"),
        "n_a",
        "n_b",
        "term_micro",
        F.sum("term_micro").over(w10).cast("bigint").alias("psi_micro"),
    )


# --- q_feature_iv -----------------------------------------------------------

_IV_ORACLE = """
WITH scored AS (
  SELECT o_orderkey, CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
), ranked AS (
  SELECT label,
         ROW_NUMBER() OVER (ORDER BY cents DESC, o_orderkey) AS rk,
         COUNT(*) OVER () AS nn
  FROM scored
), cells AS (
  SELECT CAST(((rk - 1) * 10) // nn AS BIGINT) AS decile,
         CAST(SUM(label) AS BIGINT) AS n_pos,
         CAST(COUNT(*) - SUM(label) AS BIGINT) AS n_neg
  FROM ranked GROUP BY 1
), tot AS (
  SELECT CAST(SUM(n_pos) AS BIGINT) AS p, CAST(SUM(n_neg) AS BIGINT) AS q
  FROM cells
), terms AS (
  SELECT decile, n_pos, n_neg,
         CAST(FLOOR(LN((CAST(n_pos + 1 AS DOUBLE) / (p + 10))
                       / (CAST(n_neg + 1 AS DOUBLE) / (q + 10)))
                    * 1000000 + 0.5) AS BIGINT) AS woe_micro,
         CAST(FLOOR((CAST(n_pos + 1 AS DOUBLE) / (p + 10)
                     - CAST(n_neg + 1 AS DOUBLE) / (q + 10))
             * (FLOOR(LN((CAST(n_pos + 1 AS DOUBLE) / (p + 10))
                         / (CAST(n_neg + 1 AS DOUBLE) / (q + 10)))
                      * 1000000 + 0.5) / 1000000.0)
             * 1000000 + 0.5) AS BIGINT) AS iv_term_micro
  FROM cells CROSS JOIN tot
)
SELECT decile, n_pos, n_neg, woe_micro, iv_term_micro,
       CAST(SUM(iv_term_micro) OVER () AS BIGINT) AS iv_micro
FROM terms
"""


@register("q_feature_iv", oracle=_IV_ORACLE)
def q_feature_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-Evidence / Information Value table per score DECILE — the
    continuous-feature binned form (equal-count bins from the tie-block
    rank machinery, Laplace-smoothed) next to q_feature_woe's
    CATEGORICAL form (extended.py:2149 — per customer segment, no
    binning): scorecards bin every continuous candidate this way before
    the WoE encode, and the IV band read is the same (IV < 0.02 useless,
    > 0.5 suspicious/leaky). The distribution-shape complement of
    q_feature_auc/q_feature_ks. WoE_i =
    ln(share-of-positives / share-of-negatives) per bucket, IV = Σ
    (p_i − q_i)·WoE_i; Laplace smoothing ((n+1)/(N+10)) keeps one-class
    buckets finite, identically in both engines.

    Parity: deciles come from the same tie-block machinery as
    q_feature_lift (exact integer ((rk−1)·10) div N); each WoE ln of
    exact smoothed rationals is micro-snapped before the product and each
    IV term micro-snapped before the sum, so IV is an exact bigint sum.

    Scale shape: identical to q_feature_lift — block offsets from the
    collapsed distinct-cents relation, intra-block ranks partitioned by
    cents, a ≤10-row cells relation, windows only over collapsed inputs.
    """
    orders = load(spark, sf_dir, "orders")
    scored = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("label"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    blocks = scored.groupBy("cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("bn")
    )
    w_off = Window.orderBy(F.desc("cents")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_tot = Window.orderBy(F.desc("cents")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = blocks.select(
        "cents",
        F.coalesce(F.sum("bn").over(w_off), F.lit(0)).alias("start"),
        F.sum("bn").over(w_tot).cast("bigint").alias("nn"),
    )
    w_intra = Window.partitionBy("cents").orderBy("o_orderkey")
    ranked = scored.join(offs, "cents").select(
        "label",
        "nn",
        (F.col("start") + F.row_number().over(w_intra)).alias("rk"),
    )
    cells = ranked.groupBy(
        F.expr("((rk - 1) * 10) div nn").cast("bigint").alias("decile")
    ).agg(
        F.sum("label").cast("bigint").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("label")).cast("bigint").alias("n_neg"),
    )
    w10 = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cells = cells.select(
        "decile",
        "n_pos",
        "n_neg",
        F.sum("n_pos").over(w10).alias("p"),
        F.sum("n_neg").over(w10).alias("q"),
    )
    pi = (F.col("n_pos") + 1).cast("double") / (F.col("p") + 10)
    qi = (F.col("n_neg") + 1).cast("double") / (F.col("q") + 10)
    woe = F.floor(F.log(pi / qi) * 1000000 + F.lit(0.5)).cast("bigint")
    terms = cells.select(
        "decile",
        "n_pos",
        "n_neg",
        woe.alias("woe_micro"),
        F.floor((pi - qi) * (woe.cast("double") / 1000000.0) * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("iv_term_micro"),
    )
    return terms.select(
        "decile",
        "n_pos",
        "n_neg",
        "woe_micro",
        "iv_term_micro",
        F.sum("iv_term_micro").over(w10).cast("bigint").alias("iv_micro"),
    )


# --- q_feature_target_encoding ------------------------------------------------

_TENC_M = 10  # smoothing pseudo-count toward the global prior

_TENC_ORACLE = f"""
WITH scored AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label
  FROM orders
), g AS (
  SELECT o_orderkey, label,
         CAST(SUM(label) OVER (PARTITION BY o_custkey) AS BIGINT) AS sg,
         CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS ng
  FROM scored
), tot AS (
  SELECT CAST(SUM(label) AS BIGINT) AS p, CAST(COUNT(*) AS BIGINT) AS nn
  FROM scored
)
SELECT o_orderkey,
       CAST(ng AS BIGINT) AS group_n,
       CAST(FLOOR(CAST((sg - label) * nn + {_TENC_M} * p AS DOUBLE)
                  / CAST((ng - 1 + {_TENC_M}) * nn AS DOUBLE)
                  * 1000000 + 0.5) AS BIGINT) AS enc_micro
FROM g CROSS JOIN tot
"""


@register("q_feature_target_encoding", oracle=_TENC_ORACLE)
def q_feature_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out smoothed target encoding of a high-cardinality
    categorical (customer id) against the binary label — the standard
    leakage-safe way to feed entity ids to tabular models: each row gets
    its OWN group's positive rate computed WITHOUT itself, shrunk toward
    the global prior by m=_TENC_M pseudo-counts (enc = (S_g − y_i +
    m·prior) / (n_g − 1 + m)); rows of singleton groups collapse to the
    prior exactly.

    Parity: the encoding is the ratio of two EXACT bigints after scaling
    by the global N ((S_g − y_i)·N + m·P over (n_g − 1 + m)·N — the prior
    P/N never becomes an intermediate float), micro-snapped after the one
    division.

    Scale shape: one window partitioned by the entity key delivers both
    group sufficient statistics (no self-join, no two-pass group-then-
    join-back); the 1-row global total broadcasts. High-cardinality keys
    are exactly what the partitioned window wants — parallelism grows
    with cardinality and no group is large enough to skew.
    """
    orders = load(spark, sf_dir, "orders")
    scored = orders.select(
        "o_orderkey",
        "o_custkey",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("label"),
    )
    wg = Window.partitionBy("o_custkey")
    g = scored.select(
        "o_orderkey",
        "label",
        F.sum("label").over(wg).cast("bigint").alias("sg"),
        F.count(F.lit(1)).over(wg).cast("bigint").alias("ng"),
    )
    tot = scored.agg(
        F.sum("label").cast("bigint").alias("p"),
        F.count(F.lit(1)).cast("bigint").alias("nn"),
    )
    return g.crossJoin(F.broadcast(tot)).select(
        "o_orderkey",
        F.col("ng").cast("bigint").alias("group_n"),
        F.floor(
            (
                (F.col("sg") - F.col("label")) * F.col("nn")
                + _TENC_M * F.col("p")
            ).cast("double")
            / ((F.col("ng") - 1 + _TENC_M) * F.col("nn")).cast("double")
            * 1000000
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("enc_micro"),
    )


# --- q_corpus_epoch_shuffle (reproducible per-epoch remixing certificate) ----

_EPOCH_SHARDS = 8

_EPOCH_SHUFFLE_ORACLE = f"""
WITH assigned AS (
  SELECT doc_id,
         length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
         ('0x' || substr(sha256('0:' || doc_id::VARCHAR), 1, 8))::BIGINT
           % {_EPOCH_SHARDS} AS s0,
         ('0x' || substr(sha256('1:' || doc_id::VARCHAR), 1, 8))::BIGINT
           % {_EPOCH_SHARDS} AS s1
  FROM documents
)
SELECT s0, s1,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
FROM assigned
GROUP BY s0, s1
"""


@register("q_corpus_epoch_shuffle", oracle=_EPOCH_SHUFFLE_ORACLE)
def q_corpus_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible EPOCH-SHUFFLE certificate: every training epoch e
    assigns each document to loader shard sha256(e:doc_id) mod 8 — a
    deterministic pseudo-random permutation per epoch with NO global sort
    and no stored permutation table (the dataloader recomputes any doc's
    epoch-e placement from its id alone — the property that makes
    mid-epoch resume and elastic re-sharding free). The certificate is
    the epoch-0 × epoch-1 shard TRANSITION MATRIX (doc counts + token
    mass per cell): uniform off-diagonal mass ≈ 1/shards per cell proves
    consecutive epochs genuinely re-mix (a batch never re-sees epoch-0
    neighborhoods), and the row/column marginals expose shard balance for
    both epochs in the same relation.

    Parity engineering: the sha256-prefix mod idiom both engines share
    (q_corpus_shard_assign / q_sample_hash); token counts are the
    whitespace integer; the matrix is pure integer aggregation.

    Scale shape: one projection (two sha256 calls, whole-stage codegen) +
    one map-side-combinable hash aggregate into ≤ shards² groups — no
    join, no window, no sort; the certificate costs one scan regardless
    of corpus size, and the assignment itself is embarrassingly parallel
    at any epoch count."""
    docs = spread(load(spark, sf_dir, "documents"), "doc_id")
    n_tokens = (
        F.length("text") - F.length(F.regexp_replace(F.col("text"), " ", "")) + 1
    )

    def shard(epoch: int):
        return (
            F.conv(
                F.substring(
                    F.sha2(
                        F.concat(F.lit(f"{epoch}:"), F.col("doc_id").cast("string")),
                        256,
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _EPOCH_SHARDS
        )

    return (
        docs.select(
            shard(0).alias("s0"),
            shard(1).alias("s1"),
            n_tokens.cast("long").alias("n_tokens"),
        )
        .groupBy("s0", "s1")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        )
    )


# --- q_corpus_blocklist (prefix blocklist screen) ----------------------------

_BLOCK_PREFIX_LEN = 4

_BLOCKLIST_ORACLE = f"""
WITH blocked AS (
  SELECT DISTINCT substr(source, 1, {_BLOCK_PREFIX_LEN}) AS pfx
  FROM documents
  WHERE ('0x' || substr(sha256(source), 1, 8))::BIGINT % 5 = 0
), d AS (
  SELECT lang,
         length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
         EXISTS (SELECT 1 FROM blocked b
                 WHERE b.pfx = substr(source, 1, {_BLOCK_PREFIX_LEN}))
           AS is_blocked
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN is_blocked THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked,
       CAST(SUM(CASE WHEN is_blocked THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN is_blocked THEN n_tokens ELSE 0 END) AS BIGINT)
         AS blocked_tokens,
       CAST(SUM(CASE WHEN is_blocked THEN 0 ELSE n_tokens END) AS BIGINT)
         AS kept_tokens
FROM d
GROUP BY lang
"""


@register("q_corpus_blocklist", oracle=_BLOCKLIST_ORACLE)
def q_corpus_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-prefix BLOCKLIST screen — the domain/URL-pattern exclusion
    every web-corpus pipeline runs (opt-outs, spam hosts, license
    blocks): a small blocklist of source PREFIXES (here derived
    deterministically: sources whose sha256 lands in a 1-in-5 residue
    class, truncated to 4 chars — note 'src1' also blocks src10..src19,
    which is exactly prefix-match semantics doing its job) screens the
    corpus, and the certificate reports per-lang kept/blocked doc and
    token mass — the before/after ledger a curation run publishes.

    Parity engineering: the membership test is an exact equality on the
    fixed-length prefix; token counts are the whitespace integer; all
    outputs integer counts/sums.

    Scale shape: the blocklist aggregates to a FEW DISTINCT PREFIXES
    (bounded by the blocklist, not the corpus) and rides a broadcast hash
    join — the corpus never shuffles; kept/blocked fold into one map-side
    aggregate keyed by lang. For variable-length prefix lists the same
    plan explodes each source into its ≤ L prefixes and equi-joins — the
    standard longest-prefix trick, still broadcast, still shuffle-free on
    the fact side."""
    docs = spread(load(spark, sf_dir, "documents"), "doc_id")
    blocked = (
        docs.filter(
            F.conv(F.substring(F.sha2(F.col("source"), 256), 1, 8), 16, 10).cast(
                "long"
            )
            % 5
            == 0
        )
        .select(F.substring("source", 1, _BLOCK_PREFIX_LEN).alias("pfx"))
        .distinct()
    )
    n_tokens = (
        F.length("text") - F.length(F.regexp_replace(F.col("text"), " ", "")) + 1
    )
    return (
        docs.select(
            "lang",
            n_tokens.cast("long").alias("n_tokens"),
            F.substring("source", 1, _BLOCK_PREFIX_LEN).alias("dp"),
        )
        .join(F.broadcast(blocked), F.col("dp") == F.col("pfx"), "left")
        .select(
            "lang", "n_tokens", F.col("pfx").isNotNull().alias("is_blocked")
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("is_blocked"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_blocked"),
            F.sum(F.when(F.col("is_blocked"), 0).otherwise(1))
            .cast("bigint")
            .alias("n_kept"),
            F.sum(F.when(F.col("is_blocked"), F.col("n_tokens")).otherwise(0))
            .cast("bigint")
            .alias("blocked_tokens"),
            F.sum(F.when(F.col("is_blocked"), 0).otherwise(F.col("n_tokens")))
            .cast("bigint")
            .alias("kept_tokens"),
        )
    )


# --- q_corpus_curriculum (phased mix schedule) -------------------------------

#: (phase, alpha, phase token budget) — flatten-as-you-anneal: later phases
#: sample closer to uniform across sources while the budget share shrinks.
_CURRICULUM_PHASES = [(0, "1.0", 500000), (1, "0.7", 300000), (2, "0.4", 200000)]

_CURRICULUM_ORACLE = f"""
WITH per_source AS (
  SELECT source,
         CAST(SUM(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM per_source
), phases(phase, alpha, budget) AS (
  VALUES {", ".join(f"({p}, CAST({a} AS DOUBLE), CAST({b} AS BIGINT))"
                    for p, a, b in _CURRICULUM_PHASES)}
), w AS (
  SELECT ph.phase, ph.alpha, ph.budget, s.source, s.n_tokens,
         CAST(FLOOR(EXP(ph.alpha
               * (FLOOR(LN(CAST(s.n_tokens AS DOUBLE) / t.total) * 1000000 + 0.5)
                  / 1000000)) * 1000000 + 0.5) AS BIGINT) AS w_micros
  FROM per_source s CROSS JOIN tot t CROSS JOIN phases ph
), wt AS (
  SELECT phase, CAST(SUM(w_micros) AS BIGINT) AS w_total FROM w GROUP BY phase
)
SELECT w.phase, w.source, w.n_tokens, w.w_micros,
       CAST(FLOOR(CAST(w.w_micros AS DOUBLE) / wt.w_total
                  * CAST(w.budget AS DOUBLE)) AS BIGINT) AS alloc_tokens
FROM w JOIN wt ON w.phase = wt.phase
"""


@register("q_corpus_curriculum", oracle=_CURRICULUM_ORACLE)
def q_corpus_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phased CURRICULUM schedule — the multi-stage data mix a pretraining
    run actually executes (bulk → anneal → final polish): each phase p
    gets a token budget and a temperature α_p, and every source's
    allocation in phase p is budget_p · w/Σw with w = share^α_p — early
    phases sample sources proportionally (α=1), later phases flatten
    toward uniform (α↓) exactly like data-annealing recipes that upweight
    scarce high-quality sources at the end of training. One relation
    holds the whole schedule: (phase, source, tokens, weight, allocated
    tokens) — the table the shard planner (q_corpus_shard_assign) and the
    packer consume per phase.

    Parity engineering: share^α = exp(α·ln share) with the ln
    micro-snapped BEFORE the multiply and the weight snapped to integer
    micros — q_corpus_temperature's exact libm discipline, now keyed by
    (phase, source); the final allocation is one double ratio floored to
    a bigint.

    Scale shape: one per-source token aggregate (map-side) feeds a
    |sources| × |phases| projection — the corpus is scanned ONCE for any
    number of phases; the broadcast totals are single rows and the phase
    table is a literal. At 100 TB this is the same one-scan decision
    table, written by the planner and read by every phase's sampler."""
    docs = spread(load(spark, sf_dir, "documents"), "doc_id")
    n_tokens = (
        F.length("text") - F.length(F.regexp_replace(F.col("text"), " ", "")) + 1
    )
    per_source = (
        docs.select("source", n_tokens.cast("long").alias("t"))
        .groupBy("source")
        .agg(F.sum("t").cast("bigint").alias("n_tokens"))
    )
    tot = per_source.agg(F.sum("n_tokens").cast("bigint").alias("total"))
    phases = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(p).cast("bigint").alias("phase"),
                    F.expr(f"CAST({a} AS DOUBLE)").alias("alpha"),
                    F.lit(b).cast("bigint").alias("budget"),
                )
                for p, a, b in _CURRICULUM_PHASES
            ]
        )
    )
    w = (
        per_source.crossJoin(F.broadcast(tot))
        .select("source", "n_tokens", "total", phases.alias("ph"))
        .select(
            F.col("ph.phase").alias("phase"),
            F.col("ph.alpha").alias("alpha"),
            F.col("ph.budget").alias("budget"),
            "source",
            "n_tokens",
            F.expr(
                "CAST(FLOOR(EXP(ph.alpha "
                "* (FLOOR(LN(CAST(n_tokens AS DOUBLE) / total) * 1000000 + 0.5) "
                "/ 1000000)) * 1000000 + 0.5) AS BIGINT)"
            ).alias("w_micros"),
        )
    )
    wt = w.groupBy(F.col("phase").alias("wt_phase")).agg(
        F.sum("w_micros").cast("bigint").alias("w_total")
    )
    return (
        w.join(F.broadcast(wt), F.col("phase") == F.col("wt_phase"))
        .select(
            "phase",
            "source",
            "n_tokens",
            "w_micros",
            F.expr(
                "CAST(FLOOR(CAST(w_micros AS DOUBLE) / w_total "
                "* CAST(budget AS DOUBLE)) AS BIGINT)"
            ).alias("alloc_tokens"),
        )
    )
