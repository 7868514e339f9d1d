"""Window-function operators (SURVEY.md §2.5).

Reference analog: latest-version-per-cube selection in
``genesapi/storage.py (upstream)`` (rank-1 per key), year-over-year deltas and
cumulative series in the serialized documents.

Scale notes: every window here partitions by a key (customer/user) before
ordering, so the sort is per-partition after one hash shuffle — never a global
sort. Running/trailing sums inside windows use exact decimal casts where the
frame aggregation order could differ between engines (DuckDB evaluates frames
with a segment tree; Spark streams the frame — double addition order differs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from genesapi_cli_spark.io import load
from genesapi_cli_spark.registry import DEC, dec_sum, register

# --- q_window_rank ----------------------------------------------------------

_RANK_ORACLE = """
SELECT * FROM (
  SELECT c_custkey AS custkey,
         o_orderkey AS orderkey,
         o_totalprice AS totalprice,
         ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
         RANK()       OVER (PARTITION BY c_custkey ORDER BY o_totalprice DESC) AS rnk,
         DENSE_RANK() OVER (PARTITION BY c_custkey ORDER BY o_totalprice DESC) AS drnk
  FROM orders JOIN customer ON o_custkey = c_custkey
)
WHERE rn <= 3
"""


@register("q_window_rank", oracle=_RANK_ORACLE)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer with row_number/rank/dense_rank — the
    reference's latest-version-per-cube selection generalized. row_number gets
    a unique tiebreak; rank/dense_rank keep genuine tie semantics."""
    orders, customer = load(spark, sf_dir, "orders"), load(spark, sf_dir, "customer")
    j = orders.join(customer, orders.o_custkey == customer.c_custkey)
    by_price = Window.partitionBy("c_custkey").orderBy(F.col("o_totalprice").desc())
    unique = Window.partitionBy("c_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        j.select(
            F.col("c_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
            F.row_number().over(unique).alias("rn"),
            F.rank().over(by_price).alias("rnk"),
            F.dense_rank().over(by_price).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


# --- q_window_running -------------------------------------------------------

_RUNNING_ORACLE = """
SELECT event_id,
       user_id,
       epoch_us(ts) AS us,
       CAST(SUM(CAST(value AS DECIMAL(18,7))) OVER w AS DOUBLE) AS run_sum,
       CAST(SUM(CAST(value AS DECIMAL(18,7))) OVER w AS DOUBLE) / (COUNT(*) OVER w) AS run_avg,
       COUNT(*) OVER w AS run_n
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY epoch_us(ts), event_id
  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
)
"""


@register("q_window_running", oracle=_RUNNING_ORACLE)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running sum/avg over the event stream (cumulative time series
    in the reference's serialized facts). Decimal-cast keeps the cumulative
    sum independent of the engines' frame evaluation order."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run_sum = F.sum(F.col("value").cast(DEC)).over(w).cast("double")
    run_n = F.count(F.lit(1)).over(w)
    return ev.select(
        "event_id",
        "user_id",
        F.col("ts_us").alias("us"),
        run_sum.alias("run_sum"),
        (run_sum / run_n).alias("run_avg"),
        run_n.alias("run_n"),
    )


# --- q_window_lag -----------------------------------------------------------

_LAG_ORACLE = """
SELECT event_id,
       user_id,
       value - LAG(value)    OVER w AS delta_value,
       epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS delta_us,
       LAG(event_id)  OVER w AS prev_event_id,
       LEAD(event_id) OVER w AS next_event_id
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
"""


@register("q_window_lag", oracle=_LAG_ORACLE)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead deltas per user (year-over-year-style deltas in the
    reference). Double subtraction on identical operands is bit-exact."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.col("value") - F.lag("value").over(w)).alias("delta_value"),
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("delta_us"),
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.lead("event_id").over(w).alias("next_event_id"),
    )


# --- q_window_range_frame ---------------------------------------------------

_RANGE_FRAME_ORACLE = """
SELECT o_orderkey AS orderkey,
       o_custkey AS custkey,
       daynum,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,7))) OVER (
         PARTITION BY o_custkey ORDER BY daynum
         RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS trailing_30d
FROM (
  SELECT o_orderkey, o_custkey, o_totalprice,
         date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS daynum
  FROM orders
)
"""


@register("q_window_range_frame", oracle=_RANGE_FRAME_ORACLE)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 30-day order total per customer via a RANGE frame over a day
    number (the reference's trailing-period aggregates). RANGE (not ROWS) so
    same-day orders aggregate together regardless of physical order."""
    orders = load(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("daynum")
        .rangeBetween(-30, Window.currentRow)
    )
    return (
        orders.withColumn("daynum", days)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_custkey").alias("custkey"),
            "daynum",
            F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("trailing_30d"),
        )
    )


# --- q_topk_per_group -------------------------------------------------------

_TOPK_GROUP_ORACLE = """
SELECT * FROM (
  SELECT p_type,
         p_partkey,
         p_retailprice,
         ROW_NUMBER() OVER (PARTITION BY p_type ORDER BY p_retailprice DESC, p_partkey) AS rn
  FROM part
)
WHERE rn <= 2
"""


@register("q_topk_per_group", oracle=_TOPK_GROUP_ORACLE)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 parts by retail price per type (QUALIFY shape): row_number +
    filter. AQE prunes the per-group sort to partition-local work."""
    part = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_type").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        part.select(
            "p_type", "p_partkey", "p_retailprice", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 2)
    )


# --- q_window_firstlast -----------------------------------------------------

_FIRSTLAST_ORACLE = """
WITH w AS (
  SELECT user_id,
         FIRST_VALUE(event_type) OVER win AS first_type,
         LAST_VALUE(event_type)  OVER win AS last_type,
         NTH_VALUE(event_type, 2) OVER win AS second_type,
         COUNT(*) OVER win AS n_events,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
  FROM events
  WINDOW win AS (
    PARTITION BY user_id ORDER BY epoch_us(ts), event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
  )
)
SELECT user_id, first_type, last_type, second_type, n_events
FROM w WHERE rn = 1
"""


@register("q_window_firstlast", oracle=_FIRSTLAST_ORACLE)
def q_window_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user journey endpoints: first/last/2nd event type over the full
    per-user frame (the reference's first-seen/last-seen attribute semantics).

    One shuffle on user_id serves all four window functions AND the rn=1
    dedup — Spark computes every function sharing (partition, order, frame)
    in a single Window exec, so this costs the same as one rank. Ties at
    equal timestamps break on event_id (unique) for engine-stable output.
    """
    ev = load(spark, sf_dir, "events")
    full = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    seq = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (
        ev.select(
            "user_id",
            F.first("event_type").over(full).alias("first_type"),
            F.last("event_type").over(full).alias("last_type"),
            F.nth_value("event_type", 2).over(full).alias("second_type"),
            F.count(F.lit(1)).over(full).alias("n_events"),
            F.row_number().over(seq).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# --- q_window_sessionize ----------------------------------------------------

_SESSIONIZE_ORACLE = """
WITH ordered AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), sessed AS (
  SELECT user_id, us,
         SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_id
  FROM ordered
), per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n_events,
         (MAX(us) - MIN(us)) // 1000000 AS dur_s
  FROM sessed GROUP BY user_id, session_id
)
SELECT COUNT(*) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(MAX(dur_s) AS BIGINT) AS max_dur_s,
       CAST(SUM(dur_s) AS BIGINT) AS sum_dur_s
FROM per_session
"""


@register("q_window_sessionize", oracle=_SESSIONIZE_ORACLE)
def q_window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (30-min gap): the offline mirror of
    q_stream_session — gaps > threshold start a new session; session id is
    the running sum of gap flags.

    Both window passes share the (user_id, ts, event_id) sort, so Spark plans
    ONE shuffle + ONE sort for lag + running-sum (same Window exec group).
    All arithmetic is integer microseconds (integer div for durations — no
    float division, whose long-cast truncates on Spark but rounds on DuckDB),
    so the oracle match is exact. At 100 TB this is the canonical
    shuffle-once-per-user sessionizer; the streaming twin handles the
    unbounded case with state + watermarks.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.when(
        F.col("ts_us") - F.lag("ts_us").over(w) > 1800 * 1000 * 1000, 1
    ).otherwise(0)
    sessed = ev.select(
        "user_id",
        "ts_us",
        "event_id",
        F.sum(gap).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("session_id"),
    )
    per_session = sessed.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("(max(ts_us) - min(ts_us)) div 1000000").alias("dur_s"),
    )
    return per_session.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("dur_s").cast("long").alias("max_dur_s"),
        F.sum("dur_s").cast("long").alias("sum_dur_s"),
    )


# --- q_window_gap_fill ------------------------------------------------------

_GAP_FILL_ORACLE = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS n_ev,
         SUM(CAST(value AS DECIMAL(18,7))) AS sum_v
  FROM events GROUP BY 1, 2
), span AS (
  SELECT user_id, MIN(d) AS lo, MAX(d) AS hi FROM daily GROUP BY 1
), cal AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
  FROM span
), filled AS (
  SELECT c.user_id, c.d, dy.n_ev,
         last_value(dy.sum_v IGNORE NULLS) OVER (
           PARTITION BY c.user_id ORDER BY c.d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS ff
  FROM cal c LEFT JOIN daily dy ON c.user_id = dy.user_id AND c.d = dy.d
)
SELECT user_id,
       COUNT(*) AS span_days,
       COUNT(n_ev) AS active_days,
       COUNT(*) - COUNT(n_ev) AS gap_days,
       CAST(SUM(ff) AS DOUBLE) AS filled_sum
FROM filled
GROUP BY user_id
"""


@register("q_window_gap_fill", oracle=_GAP_FILL_ORACLE)
def q_window_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification + forward fill: each user's daily series gets
    explicit rows for missing days (sequence-explode calendar, left join),
    then the last observed daily sum carries forward (last(..., ignorenulls)).

    The reference's time axis is dense per cube but sparse across cubes;
    GENESIS region×year series routinely skip years — this is the standard
    publish-a-complete-series operator. Sums stay DECIMAL end-to-end until
    the final double cast, so fill + re-aggregation is exact in both engines.

    Scale: the calendar explode generates span×users rows but never shuffles
    the raw events twice — daily agg (shuffle 1, map-side combined) → tiny
    span agg reuses the same partitioning → explode is in-plan → the ffill
    window re-shuffles only daily rows (≤ users × span), not events. At
    100 TB the daily table is ~4 orders of magnitude smaller than facts.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n_ev"),
        F.sum(F.col("value").cast(DEC)).alias("sum_v"),
    )
    span = daily.groupBy("user_id").agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    cal = span.select(
        "user_id",
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d"),
    )
    filled = cal.join(daily, ["user_id", "d"], "left").select(
        "user_id",
        "d",
        "n_ev",
        F.last("sum_v", ignorenulls=True)
        .over(
            Window.partitionBy("user_id")
            .orderBy("d")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("ff"),
    )
    return filled.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("span_days"),
        F.count("n_ev").alias("active_days"),
        (F.count(F.lit(1)) - F.count("n_ev")).alias("gap_days"),
        F.sum("ff").cast("double").alias("filled_sum"),
    )


# --- q_window_yoy -----------------------------------------------------------

_YOY_ORACLE = """
WITH y AS (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,7))) AS DOUBLE) AS sum_price
  FROM orders GROUP BY 1
)
SELECT o_year, n_orders, sum_price,
       LAG(sum_price) OVER (ORDER BY o_year) AS prev_sum,
       (sum_price - LAG(sum_price) OVER (ORDER BY o_year))
         / LAG(sum_price) OVER (ORDER BY o_year) AS growth
FROM y
"""


@register("q_window_yoy", oracle=_YOY_ORACLE)
def q_window_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth of order volume: aggregate-then-lag. The
    reference's headline use case is exactly this (population change per
    region per year); here the period roll-up happens FIRST, so the window
    runs over one row per year — the 100 TB pattern is agg-early,
    window-late (a window over raw facts would sort everything; over the
    aggregate it sorts 7 rows). Growth is a single double division of two
    exact-decimal-derived sums — deterministic in both engines.
    """
    orders = load(spark, sf_dir, "orders")
    y = orders.groupBy(F.year("o_orderdate").cast("int").alias("o_year")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dec_sum("o_totalprice", "sum_price"),
    )
    w = Window.orderBy("o_year")
    prev = F.lag("sum_price").over(w)
    return y.select(
        "o_year",
        "n_orders",
        "sum_price",
        prev.alias("prev_sum"),
        ((F.col("sum_price") - prev) / prev).alias("growth"),
    )


# --- q_window_distribution --------------------------------------------------

_DISTRIBUTION_ORACLE = """
SELECT p_partkey,
       p_brand,
       rank()         OVER w AS price_rank,
       percent_rank() OVER w AS price_pct_rank,
       cume_dist()    OVER w AS price_cume_dist,
       count(*)       OVER (PARTITION BY p_brand) AS n_in_brand
FROM part
WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
"""


@register("q_window_distribution", oracle=_DISTRIBUTION_ORACLE)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows (percent_rank / cume_dist): where a row sits in
    its group's value distribution — the percentile-band assignment used for
    quality-score binning of a training corpus (keep the top X% per source).

    percent_rank = (rank-1)/(n-1) and cume_dist = n_le/n are exact
    small-integer ratios, so both engines agree bit-for-bit (no r4 wrap
    needed). All four windows share ONE partitioning (p_brand), so Catalyst
    plans a single sort+shuffle feeding every frame — adding the unordered
    count() costs nothing extra. ~25 brands → 25-way parallelism; at 100 TB
    partition by a finer key (brand×container) or pre-bucket by it.
    """
    part = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return part.select(
        "p_partkey",
        "p_brand",
        F.rank().over(w).alias("price_rank"),
        F.percent_rank().over(w).alias("price_pct_rank"),
        F.cume_dist().over(w).alias("price_cume_dist"),
        F.count(F.lit(1)).over(Window.partitionBy("p_brand")).alias("n_in_brand"),
    )


# --- q_window_retention -----------------------------------------------------

#: 2024-01-01 00:00:00 UTC in epoch-µs; week bucket = integer div on µs.
_RET_EPOCH0_US = 1704067200000000
_RET_WEEK_US = 7 * 86400 * 1000000

_RETENTION_ORACLE = f"""
WITH uw AS (
  SELECT DISTINCT user_id,
         (epoch_us(ts) - {_RET_EPOCH0_US}) // {_RET_WEEK_US} AS week_idx
  FROM events
), c AS (
  SELECT user_id, week_idx,
         MIN(week_idx) OVER (PARTITION BY user_id) AS cohort
  FROM uw
), g AS (
  SELECT cohort, week_idx, COUNT(*) AS n_active
  FROM c GROUP BY cohort, week_idx
)
SELECT cohort,
       week_idx,
       week_idx - cohort AS weeks_since,
       n_active,
       FLOOR(CAST(n_active AS DOUBLE)
             / MAX(CASE WHEN week_idx = cohort THEN n_active END)
                 OVER (PARTITION BY cohort)
             * 10000 + 0.5) / 10000 AS retention_r
FROM g
"""


@register("q_window_retention", oracle=_RETENTION_ORACLE)
def q_window_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active week, tracked
    across subsequent weeks — THE product-analytics query, and the same shape
    as data-freshness tracking (first-crawl cohort vs re-crawl activity).

    Spark-first plan: distinct (user, week) pairs → per-user MIN window for
    the cohort (1 shuffle on user) → (cohort, week) hash agg → cohort-size
    lookup as an unordered window over cohort (no self-join back for the
    denominator — the window reuses the agg's partitioning). Retention is an
    exact integer ratio, floor-rounded. Week bucketing is integer µs
    division — no timestamp/timezone arithmetic to disagree on.
    """
    ev = load(spark, sf_dir, "events")
    week = ((F.col("ts_us") - _RET_EPOCH0_US) / _RET_WEEK_US).cast("long")
    uw = ev.select("user_id", week.alias("week_idx")).distinct()
    c = uw.withColumn(
        "cohort", F.min("week_idx").over(Window.partitionBy("user_id"))
    )
    g = c.groupBy("cohort", "week_idx").agg(F.count(F.lit(1)).alias("n_active"))
    size = F.max(
        F.when(F.col("week_idx") == F.col("cohort"), F.col("n_active"))
    ).over(Window.partitionBy("cohort"))
    return g.select(
        "cohort",
        "week_idx",
        (F.col("week_idx") - F.col("cohort")).alias("weeks_since"),
        "n_active",
        (F.floor(F.col("n_active").cast("double") / size * 10000 + F.lit(0.5)) / 10000).alias(
            "retention_r"
        ),
    )


# --- q_window_locf ----------------------------------------------------------

_LOCF_ORACLE = """
WITH gapped AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
  FROM events
), filled AS (
  SELECT user_id, event_id, v,
         last_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS v_filled
  FROM gapped
)
SELECT user_id,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
       CAST(SUM(CASE WHEN v IS NULL AND v_filled IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_imputed,
       CAST(SUM(CAST(COALESCE(v_filled, 0) AS DECIMAL(18,7))) AS DOUBLE) AS sum_filled
FROM filled
GROUP BY user_id
"""


@register("q_window_locf", oracle=_LOCF_ORACLE)
def q_window_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward imputation (forward fill): NULL gaps
    in a per-entity time series take the latest preceding non-NULL value —
    the standard repair for sensor dropouts / sparse snapshots before any
    downstream aggregate (and the reference's '...'-token cleaning done
    statefully over time instead of per cell).

    Spark expresses it as last(col, ignorenulls=True) over an UNBOUNDED
    PRECEDING running frame — one shuffle+sort per entity partition,
    streaming frame evaluation (no buffering of the whole partition). A
    leading-NULL row stays NULL (nothing to carry) — counted separately from
    imputed rows. Values that survive are originals (2-dec), so the
    decimal-cast checksum is tie-free.
    """
    ev = load(spark, sf_dir, "events")
    v = F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(F.col("value"))
    gapped = ev.select("user_id", "event_id", "ts_us", v.alias("v"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = gapped.select(
        "user_id", "v", F.last("v", ignorenulls=True).over(w).alias("v_filled")
    )
    return filled.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).cast("bigint").alias("n_missing"),
        F.sum(
            F.when(F.col("v").isNull() & F.col("v_filled").isNotNull(), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_imputed"),
        F.sum(F.coalesce("v_filled", F.lit(0)).cast("decimal(18,7)"))
        .cast("double")
        .alias("sum_filled"),
    )


# --- q_window_streak --------------------------------------------------------

_STREAK_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id,
         (epoch_us(ts) - 1704067200000000) // 86400000000 AS day_idx
  FROM events
), grp AS (
  SELECT user_id, day_idx,
         day_idx - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day_idx)
           AS island
  FROM days
), streaks AS (
  SELECT user_id, island, COUNT(*) AS len
  FROM grp GROUP BY user_id, island
)
SELECT user_id,
       CAST(MAX(len) AS BIGINT) AS longest_streak_days,
       COUNT(*) AS n_streaks,
       CAST(SUM(len) AS BIGINT) AS n_active_days
FROM streaks
GROUP BY user_id
"""


@register("q_window_streak", oracle=_STREAK_ORACLE)
def q_window_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest consecutive-day activity streak per user via
    the row_number-difference trick (day_idx − rank is constant within each
    unbroken run) — the engagement-streak / continuous-coverage query that
    naïve approaches solve with per-user loops.

    Everything is integer arithmetic on µs-derived day indices (no date
    functions to disagree on). One shuffle on user_id feeds the ranking
    window AND both stacked aggregations — islands are derived, grouped,
    and rolled up without repartitioning.
    """
    ev = load(spark, sf_dir, "events")
    day = ((F.col("ts_us") - 1704067200000000) / 86400000000).cast("long")
    days = ev.select("user_id", day.alias("day_idx")).distinct()
    w = Window.partitionBy("user_id").orderBy("day_idx")
    grp = days.select(
        "user_id",
        "day_idx",
        (F.col("day_idx") - F.row_number().over(w)).alias("island"),
    )
    streaks = grp.groupBy("user_id", "island").agg(F.count(F.lit(1)).alias("len"))
    return streaks.groupBy("user_id").agg(
        F.max("len").cast("bigint").alias("longest_streak_days"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.sum("len").cast("bigint").alias("n_active_days"),
    )


# --- q_events_transitions ---------------------------------------------------

_TRANSITIONS_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
           AS prev_type
  FROM events
), pairs AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, next_type, n,
       FLOOR(CAST(n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY prev_type) * 10000 + 0.5) / 10000
         AS p_transition
FROM pairs
"""


@register("q_events_transitions", oracle=_TRANSITIONS_ORACLE)
def q_events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    P(next event type | current) — the behavioral fingerprint behind
    session simulation, bot detection (impossible transitions), and
    next-action features.

    One shuffle on user_id for the LAG window, then the pair space is tiny
    (|types|² = 25 rows) — the normalizing per-row window costs nothing.
    Transition probabilities are exact integer ratios, floor-rounded.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    pairs = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = F.sum("n").over(Window.partitionBy("prev_type"))
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        (F.floor(F.col("n").cast("double") / total * 10000 + F.lit(0.5)) / 10000).alias(
            "p_transition"
        ),
    )


# --- q_share_of_total -------------------------------------------------------

_SHARE_ORACLE = """
WITH per_cust AS (
  SELECT c.c_nationkey, o.o_custkey,
         CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_nationkey, o.o_custkey
)
SELECT c_nationkey, o_custkey, cents,
       CAST(SUM(cents) OVER (PARTITION BY c_nationkey) AS BIGINT) AS nation_cents,
       CAST(cents AS DOUBLE)
         / CAST(SUM(cents) OVER (PARTITION BY c_nationkey) AS DOUBLE) AS share
FROM per_cust
"""


@register("q_share_of_total", oracle=_SHARE_ORACLE)
def q_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each customer's share of their nation's total order
    revenue — the contribution/market-share window every BI layer ships
    (RATIO_TO_REPORT in warehouse dialects).

    Plan: aggregate-early (orders shrink to one row per customer BEFORE any
    window), then an unordered partition window adds the nation total with
    no sort requirement. Revenue flows as exact integer cents; the share is
    one double division of identical integers — bit-exact. At 100 TB the
    window runs over the per-customer aggregate (~|customers| rows), never
    the raw fact table.
    """
    orders, cust = load(spark, sf_dir, "orders"), load(spark, sf_dir, "customer")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    per_cust = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == cust.c_custkey,
        )
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.sum(cents).alias("cents"))
    )
    w = Window.partitionBy("c_nationkey")
    nation_cents = F.sum("cents").over(w)
    return per_cust.select(
        "c_nationkey",
        "o_custkey",
        "cents",
        nation_cents.alias("nation_cents"),
        (F.col("cents").cast("double") / nation_cents.cast("double")).alias("share"),
    )


# --- q_rank_movers ----------------------------------------------------------

_MOVERS_MIN_JUMP = 3

_MOVERS_ORACLE = f"""
WITH rev AS (
  SELECT p.p_brand,
         date_diff('month', DATE '1992-01-01',
                   date_trunc('month', CAST(l.l_shipdate AS DATE))) AS month_idx,
         SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS cents
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand, month_idx
), ranked AS (
  SELECT p_brand, month_idx, cents,
         RANK() OVER (PARTITION BY month_idx ORDER BY cents DESC, p_brand) AS rnk
  FROM rev
), moved AS (
  SELECT p_brand, month_idx, rnk,
         LAG(rnk) OVER (PARTITION BY p_brand ORDER BY month_idx) AS prev_rnk
  FROM ranked
)
SELECT p_brand, month_idx, rnk, prev_rnk, prev_rnk - rnk AS jump
FROM moved
WHERE prev_rnk - rnk >= {_MOVERS_MIN_JUMP}
"""


@register("q_rank_movers", oracle=_MOVERS_ORACLE)
def q_rank_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank movers: brands whose within-month revenue rank improved by ≥3
    positions versus the previous month — the trending/leaderboard-delta
    analytic (top gainers, emerging categories).

    Two windows over the per-(brand, month) aggregate: RANK within month
    (tie-broken by brand for determinism), then LAG along each brand's
    month series. Both windows and the LAG read the same tiny aggregate
    (~|brands|·|months| rows) — the raw fact table shuffles exactly once,
    into the aggregate. Exact integer cents throughout.
    """
    li, part = load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "part")
    month_idx = F.months_between(
        F.date_trunc("month", F.col("l_shipdate").cast("date")),
        F.lit("1992-01-01").cast("date"),
    ).cast("bigint")
    rev = (
        li.join(F.broadcast(part.select("p_partkey", "p_brand")),
                li.l_partkey == part.p_partkey)
        .groupBy("p_brand", month_idx.alias("month_idx"))
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
            ).alias("cents")
        )
    )
    w_rank = Window.partitionBy("month_idx").orderBy(F.desc("cents"), "p_brand")
    w_lag = Window.partitionBy("p_brand").orderBy("month_idx")
    ranked = rev.select(
        "p_brand", "month_idx", "cents", F.rank().over(w_rank).alias("rnk")
    )
    moved = ranked.select(
        "p_brand",
        "month_idx",
        "rnk",
        F.lag("rnk").over(w_lag).alias("prev_rnk"),
    )
    return moved.select(
        "p_brand",
        "month_idx",
        "rnk",
        "prev_rnk",
        (F.col("prev_rnk") - F.col("rnk")).alias("jump"),
    ).filter(F.col("jump") >= _MOVERS_MIN_JUMP)


# --- q_events_velocity -------------------------------------------------------

_VELO_WINDOW_US = 3_600_000_000  # 1-hour trailing window
_VELO_K = 2                      # events within the window that trigger a flag

_VELO_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
), flagged AS (
  SELECT user_id, event_id, us,
         COUNT(*) OVER (PARTITION BY user_id ORDER BY us
                        RANGE BETWEEN {_VELO_WINDOW_US} PRECEDING
                              AND CURRENT ROW) AS n_in_hour
  FROM e
)
SELECT CAST(us // 86400000000 AS BIGINT) AS day_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN n_in_hour > {_VELO_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_velocity_hits,
       CAST(COUNT(DISTINCT CASE WHEN n_in_hour > {_VELO_K} THEN user_id END)
            AS BIGINT) AS n_flagged_users
FROM flagged
GROUP BY day_idx
HAVING SUM(CASE WHEN n_in_hour > {_VELO_K} THEN 1 ELSE 0 END) > 0
ORDER BY day_idx
"""


@register("q_events_velocity", oracle=_VELO_ORACLE)
def q_events_velocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Velocity screening (the fraud/abuse rate-limit check): an event is a
    velocity hit when its user produced more than 2 events inside the
    trailing ONE HOUR — a true sliding RANGE frame over integer
    microseconds, not a bucketed approximation (bucket edges split bursts;
    the range frame catches a burst wherever it lands). Reported per day
    with the distinct users flagged, days without hits suppressed.

    Parity engineering: the frame is integer-µs RANGE
    (3.6e9 PRECEDING .. CURRENT ROW) per user — ties included on both
    engines by range semantics regardless of event_id order — and
    everything after is exact integer counting.

    Scale shape: one user-partitioned ordered window (the per-user event
    ordering every sessionize/funnel query here already uses — same
    Exchange shape), then a day rollup. At 100 TB the range frame's state
    is bounded by each user's 1-hour burst size."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-_VELO_WINDOW_US, 0)
    )
    flagged = ev.select(
        "user_id",
        F.col("ts_us").alias("us"),
        F.count(F.lit(1)).over(w).alias("n_in_hour"),
    )
    hit = F.col("n_in_hour") > _VELO_K
    return (
        flagged.groupBy(F.expr("CAST(us div 86400000000 AS BIGINT)").alias("day_idx"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.when(hit, 1).otherwise(0)).cast("bigint").alias("n_velocity_hits"),
            F.count_distinct(F.when(hit, F.col("user_id")))
            .cast("bigint")
            .alias("n_flagged_users"),
        )
        .filter(F.col("n_velocity_hits") > 0)
        .orderBy("day_idx")
    )
