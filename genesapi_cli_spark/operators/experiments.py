"""Experiment-analysis and robust-statistics operators: A/B proportion
tests, MAD outlier profiling, and multi-touch attribution.

Reference analog: the reference computes per-slice summary statistics for
the GENESIS catalog (``genesapi/schema.py`` upstream); these operators are
the inferential/diagnostic layer a production metrics pipeline adds on top
of the same aggregates.

Parity engineering (shared across the module): every statistic is derived
from EXACT integer counts/cents first; the few float steps (division, sqrt)
are correctly-rounded IEEE ops applied to identical integers in the same
expression shape on both engines, so results are bit-identical and only
snapped to 4 decimals for output hygiene.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from genesapi_cli_spark.io import load
from genesapi_cli_spark.registry import dec_sum, register

_CENTS = "CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"

# --- q_events_abtest --------------------------------------------------------

_ABTEST_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         user_id % 2 AS arm,
         MAX(CASE WHEN event_type = 'purchase' AND value > 90 THEN 1 ELSE 0 END) AS converted
  FROM events
  GROUP BY user_id
), arms AS (
  SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
         CAST(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT) AS conv_b
  FROM per_user
)
SELECT n_a, n_b, conv_a, conv_b,
       FLOOR((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
         / SQRT((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b))
         * 10000 + 0.5) / 10000 AS z_r4
FROM arms
"""


@register("q_events_abtest", oracle=_ABTEST_ORACLE)
def q_events_abtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test between experiment arms (users split by
    user_id parity): did arm A convert (≥1 high-value purchase, value>90 —
    a threshold with real variance; plain 'any purchase' saturates at 100%
    on this data and degenerates the pooled variance to zero) at a
    different rate than arm B? The readout every experimentation platform computes.

    Plan: one per-user aggregate (the only full shuffle), one 4-counter
    rollup, then the closed-form pooled z-statistic as a projection. The
    z formula runs the IDENTICAL sequence of correctly-rounded IEEE ops on
    identical integers in both engines — bit-exact before the cosmetic
    4-decimal snap.
    """
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 90), 1
            ).otherwise(0)
        ).alias("converted")
    ).select((F.col("user_id") % 2).alias("arm"), "converted")
    arms = per_user.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_b"),
    )
    pa = F.col("conv_a").cast("double") / F.col("n_a")
    pb = F.col("conv_b").cast("double") / F.col("n_b")
    pp = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    se = F.sqrt(
        pp
        * (1 - pp)
        * (
            F.lit(1).cast("double") / F.col("n_a")
            + F.lit(1).cast("double") / F.col("n_b")
        )
    )
    z = (pa - pb) / se
    return arms.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        (F.floor(z * 10000 + F.lit(0.5)) / 10000).alias("z_r4"),
    )


# --- q_agg_outlier_mad ------------------------------------------------------

#: half-cent-safe buffer: |v−med| steps and 3·mad steps are ≥ 0.0025 apart,
#: so ±0.001 can never sit between an exact coincidence and its neighbor.
_MAD_EPS = 0.001

_MAD_ORACLE = f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
), dev AS (
  SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS adev
  FROM events e JOIN med m ON e.event_type = m.event_type
), mad AS (
  SELECT event_type, MAX(med) AS med, quantile_cont(adev, 0.5) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       FLOOR(MAX(m.med) * 10000 + 0.5) / 10000 AS med_r4,
       FLOOR(MAX(m.mad) * 10000 + 0.5) / 10000 AS mad_r4,
       CAST(SUM(CASE WHEN d.adev > 3 * m.mad + {_MAD_EPS} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev d JOIN mad m ON d.event_type = m.event_type
GROUP BY d.event_type
"""


@register("q_agg_outlier_mad", oracle=_MAD_ORACLE)
def q_agg_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier profiling via MAD (median absolute deviation): per
    event_type, the median, the MAD, and how many values sit more than
    3·MAD from the median — the robust alternative to z-scores that a
    single corrupt batch cannot poison (median/MAD have a 50% breakdown
    point; mean/stddev have 0%).

    Plan: exact medians via two grouped percentile aggregates with the tiny
    per-type medians BROADCAST back onto the stream both times — the fact
    table never shuffles (same shape as q_events_anomaly). The outlier
    threshold carries a half-cent-safe ε so an exact |dev| = 3·MAD
    coincidence can never straddle a last-ulp difference.
    """
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.max("med").alias("med"), F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.select("event_type", "adev")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.floor(F.max("med") * 10000 + F.lit(0.5)) / 10000).alias("med_r4"),
            (F.floor(F.max("mad") * 10000 + F.lit(0.5)) / 10000).alias("mad_r4"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad") + _MAD_EPS, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


# --- q_attribution_linear ---------------------------------------------------

_ATTR_WINDOW_DAYS = 7
_ATTR_WINDOW_US = _ATTR_WINDOW_DAYS * 86_400_000_000

_ATTR_ORACLE = f"""
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS p_us, {_CENTS} AS cents
  FROM events WHERE event_type = 'purchase'
), t AS (
  SELECT user_id, event_type, epoch_us(ts) AS t_us
  FROM events WHERE event_type IN ('view', 'click')
), touched AS (
  SELECT p.event_id, p.cents,
         COUNT(*) AS k,
         CAST(SUM(CASE WHEN t.event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_view,
         CAST(SUM(CASE WHEN t.event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_click
  FROM p JOIN t
    ON p.user_id = t.user_id
   AND t.t_us < p.p_us
   AND t.t_us >= p.p_us - {_ATTR_WINDOW_US}
  GROUP BY p.event_id, p.cents
), credited AS (
  SELECT CAST(cents AS DOUBLE) * n_view / k AS view_credit,
         CAST(cents AS DOUBLE) * n_click / k AS click_credit
  FROM touched
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM touched) AS n_attributed,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM p) -
         (SELECT CAST(COUNT(*) AS BIGINT) FROM touched) AS n_direct,
       (SELECT CAST(SUM(CAST(view_credit AS DECIMAL(27,7))) AS DOUBLE)
        FROM credited) AS view_credit,
       (SELECT CAST(SUM(CAST(click_credit AS DECIMAL(27,7))) AS DOUBLE)
        FROM credited) AS click_credit
"""


@register("q_attribution_linear", oracle=_ATTR_ORACLE)
def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's value is split equally
    across the user's view/click touches in the trailing 7 days; purchases
    with no touches are 'direct'. The credit-allocation operator of
    marketing/conversion pipelines (and the same interval-join shape as
    q_stream_join, with a credit fan-in on top).

    Parity: per-purchase credit = cents · n_type / k is ONE double multiply
    + divide of exact integers (bit-identical both engines); the corpus sum
    of those doubles goes through the decimal-cast order-independent sum.
    Scale: the interval join shuffles both sides once on user_id; the
    credit rollup is a purchase-keyed aggregate (no global state).
    """
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts_us").alias("p_us"),
        F.expr(_CENTS).alias("cents"),
    )
    t = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_user"),
        F.col("event_type").alias("touch_type"),
        F.col("ts_us").alias("t_us"),
    )
    touched = (
        p.join(
            t,
            (F.col("user_id") == F.col("t_user"))
            & (F.col("t_us") < F.col("p_us"))
            & (F.col("t_us") >= F.col("p_us") - F.lit(_ATTR_WINDOW_US)),
        )
        .groupBy("event_id", "cents")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.sum(F.when(F.col("touch_type") == "view", 1).otherwise(0))
            .cast("bigint")
            .alias("n_view"),
            F.sum(F.when(F.col("touch_type") == "click", 1).otherwise(0))
            .cast("bigint")
            .alias("n_click"),
        )
    )
    credited = touched.select(
        (F.col("cents").cast("double") * F.col("n_view") / F.col("k")).alias(
            "view_credit"
        ),
        (F.col("cents").cast("double") * F.col("n_click") / F.col("k")).alias(
            "click_credit"
        ),
    )
    n_attributed = touched.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_attributed")
    )
    n_purchases = p.agg(F.count(F.lit(1)).cast("bigint").alias("n_p"))
    credit = credited.agg(
        dec_sum("view_credit", "view_credit"),
        dec_sum("click_credit", "click_credit"),
    )
    return (
        n_attributed.crossJoin(F.broadcast(n_purchases))
        .crossJoin(F.broadcast(credit))
        .select(
            "n_attributed",
            (F.col("n_p") - F.col("n_attributed")).alias("n_direct"),
            "view_credit",
            "click_credit",
        )
    )


# --- q_feature_scale --------------------------------------------------------

_FSCALE_ORACLE = """
WITH stats AS (
  SELECT event_type,
         MIN(value) AS vmin, MAX(value) AS vmax,
         quantile_cont(value, 0.25) AS p25,
         quantile_cont(value, 0.75) AS p75,
         quantile_cont(value, 0.5)  AS p50
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       FLOOR((e.value - s.vmin) / (s.vmax - s.vmin) * 10000 + 0.5) / 10000
         AS minmax_r4,
       FLOOR((e.value - s.p50) / (s.p75 - s.p25) * 10000 + 0.5) / 10000
         AS robust_r4
FROM events e JOIN stats s ON e.event_type = s.event_type
"""


@register("q_feature_scale", oracle=_FSCALE_ORACLE)
def q_feature_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature scaling — min-max normalization to [0,1] and robust scaling
    ((x − median) / IQR): the per-feature normalization step of every
    training-data pipeline, with the robust variant immune to the outliers
    that wreck min-max on heavy-tailed features.

    Plan: one tiny per-type stats aggregate (min/max + exact percentiles)
    BROADCAST back onto the stream — the fact table never shuffles (the
    q_events_anomaly shape). Scaled values are identical-op IEEE arithmetic
    on identical inputs across engines: the percentiles land on cent/
    half-cent boundaries (exact copies or exact midpoints), subtraction and
    division are correctly rounded, and the 4-decimal floor-snap is applied
    on both sides.
    """
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    stats = ev.groupBy("event_type").agg(
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.expr("percentile(value, 0.25)").alias("p25"),
        F.expr("percentile(value, 0.75)").alias("p75"),
        F.expr("percentile(value, 0.5)").alias("p50"),
    )
    joined = ev.join(F.broadcast(stats), "event_type")
    minmax = (F.col("value") - F.col("vmin")) / (F.col("vmax") - F.col("vmin"))
    robust = (F.col("value") - F.col("p50")) / (F.col("p75") - F.col("p25"))
    return joined.select(
        "event_id",
        "event_type",
        (F.floor(minmax * 10000 + F.lit(0.5)) / 10000).alias("minmax_r4"),
        (F.floor(robust * 10000 + F.lit(0.5)) / 10000).alias("robust_r4"),
    )


# --- q_events_wilson (Wilson score interval per arm) -------------------------

#: shared numeric text for the Wilson 95% lower bound — the SAME expression
#: string feeds Spark (F.expr) and DuckDB so the IEEE evaluation trees are
#: identical and the result is bit-exact before the r4 snap.
_WILSON_LB = (
    "((p + (1.96 * 1.96) / (2 * n) - 1.96 * "
    "SQRT((p * (1 - p) + (1.96 * 1.96) / (4 * n)) / n)) "
    "/ (1 + (1.96 * 1.96) / n))"
)

_WILSON_ORACLE = f"""
WITH arms AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
  FROM events GROUP BY event_type
), rates AS (
  SELECT event_type, n_events, n_hits,
         CAST(n_hits AS DOUBLE) / n_events AS p,
         CAST(n_events AS DOUBLE) AS n
  FROM arms
)
SELECT event_type, n_events, n_hits,
       FLOOR(p * 10000 + 0.5) / 10000 AS p_r4,
       FLOOR({_WILSON_LB} * 10000 + 0.5) / 10000 AS wilson_lb_r4
FROM rates
"""


@register("q_events_wilson", oracle=_WILSON_ORACLE)
def q_events_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson 95% score-interval lower bound of the high-value-event rate
    per event_type — the ranking statistic that orders arms by "how good is
    this rate given how much evidence we have" (small-n arms shrink toward
    0.5 instead of winning on a lucky 2/2), the standard fix for sorting by
    raw proportion; complements q_events_abtest's two-arm z-test.

    Parity engineering: counts are exact bigints; p is one double division;
    the Wilson closed form is evaluated from ONE shared expression string on
    both engines (identical IEEE tree, correctly-rounded SQRT), then snapped
    r4. Scale shape: a single map-side-combined hash aggregate over the fact
    table; the closed form is a projection over the tiny per-arm table.
    """
    ev = load(spark, sf_dir, "events")
    arms = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("value") > 50, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hits"),
    )
    rates = arms.select(
        "event_type",
        "n_events",
        "n_hits",
        F.expr("CAST(n_hits AS DOUBLE) / n_events").alias("p"),
        F.expr("CAST(n_events AS DOUBLE)").alias("n"),
    )
    return rates.select(
        "event_type",
        "n_events",
        "n_hits",
        F.expr("FLOOR(p * 10000 + 0.5) / 10000").alias("p_r4"),
        F.expr(f"FLOOR({_WILSON_LB} * 10000 + 0.5) / 10000").alias("wilson_lb_r4"),
    )


# --- q_events_ttest_welch (Welch two-sample t on event values) ---------------

#: Welch t and degrees of freedom from exact per-arm (n, Σc, Σc²) — ONE
#: shared expression text so both engines build identical IEEE trees.
#: se2_x = sample variance / n, from integer sums: (n·S2 − S1²) / (n·(n−1)·n)
_WELCH_SE2_A = "(CAST(n_a * s2_a - s1_a * s1_a AS DOUBLE) / (n_a * (n_a - 1)) / n_a)"
_WELCH_SE2_B = "(CAST(n_b * s2_b - s1_b * s1_b AS DOUBLE) / (n_b * (n_b - 1)) / n_b)"
_WELCH_T = (
    f"((CAST(s1_a AS DOUBLE) / n_a - CAST(s1_b AS DOUBLE) / n_b) "
    f"/ SQRT({_WELCH_SE2_A} + {_WELCH_SE2_B}))"
)
_WELCH_DF = (
    f"(({_WELCH_SE2_A} + {_WELCH_SE2_B}) * ({_WELCH_SE2_A} + {_WELCH_SE2_B}) "
    f"/ ({_WELCH_SE2_A} * {_WELCH_SE2_A} / (n_a - 1) "
    f" + {_WELCH_SE2_B} * {_WELCH_SE2_B} / (n_b - 1)))"
)

_WELCH_ORACLE = f"""
WITH tagged AS (
  SELECT user_id % 2 AS arm, {_CENTS} AS c FROM events
  WHERE event_type = 'purchase'
), arms AS (
  SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN arm = 0 THEN c ELSE 0 END) AS BIGINT) AS s1_a,
         CAST(SUM(CASE WHEN arm = 1 THEN c ELSE 0 END) AS BIGINT) AS s1_b,
         CAST(SUM(CASE WHEN arm = 0 THEN c * c ELSE 0 END) AS BIGINT) AS s2_a,
         CAST(SUM(CASE WHEN arm = 1 THEN c * c ELSE 0 END) AS BIGINT) AS s2_b
  FROM tagged
)
SELECT n_a, n_b, s1_a, s1_b,
       FLOOR({_WELCH_T} * 10000 + 0.5) / 10000 AS t_r4,
       FLOOR({_WELCH_DF} * 10000 + 0.5) / 10000 AS df_r4
FROM arms
"""


@register("q_events_ttest_welch", oracle=_WELCH_ORACLE)
def q_events_ttest_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test on purchase VALUES between
    the two user arms — the mean-difference companion to q_events_abtest's
    proportion z-test (the pair every experimentation platform ships), with
    Welch-Satterthwaite degrees of freedom so unequal arm variances don't
    inflate false positives the way Student's pooled t does.

    Parity engineering: each arm reduces to exact integer (n, Σc, Σc²) in
    ONE conditional aggregate pass; variances, t, and df are closed forms
    evaluated from a single shared expression text (identical IEEE trees,
    correctly-rounded SQRT), snapped r4. Magnitudes: c ≲ 10⁴ cents, n ≲ 10⁵
    at sf0.01 → Σc² ≲ 10¹³, far under 2⁶³ even at 10⁶× the rows.

    Scale shape: one map-side-combined hash aggregate over the fact scan
    (the filter pushes down); the statistics are a 1-row projection.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    tagged = ev.select(
        (F.col("user_id") % 2).alias("arm"), F.expr(_CENTS).alias("c")
    )
    arms = tagged.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("s1_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("s1_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("c") * F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("s2_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("c") * F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("s2_b"),
    )
    return arms.select(
        "n_a",
        "n_b",
        "s1_a",
        "s1_b",
        F.expr(f"FLOOR({_WELCH_T} * 10000 + 0.5) / 10000").alias("t_r4"),
        F.expr(f"FLOOR({_WELCH_DF} * 10000 + 0.5) / 10000").alias("df_r4"),
    )


# --- q_events_power_mde (A/B test power / minimum detectable effect) ---------

#: z quantiles for alpha=0.05 two-sided and 80% power — fixed literals, cast
#: to DOUBLE before arithmetic on BOTH engines (decimal-literal typing rules
#: differ; see q_agg_hll_portable).
_MDE = (
    "((CAST(1.959964 AS DOUBLE) + CAST(0.841621 AS DOUBLE)) "
    "* SQRT(2 * p * (1 - p) / n_arm))"
)

_POWER_ORACLE = f"""
WITH per_user AS (
  SELECT user_id, user_id % 2 AS arm,
         MAX(CASE WHEN event_type = 'purchase' AND value > 90 THEN 1 ELSE 0 END)
           AS converted
  FROM events GROUP BY user_id
), arms AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(converted) AS BIGINT) AS n_conv
  FROM per_user
), rates AS (
  SELECT n_users, n_a, n_conv,
         CAST(n_conv AS DOUBLE) / n_users AS p,
         CAST(n_a AS DOUBLE) AS n_arm
  FROM arms
)
SELECT n_users, n_a, n_conv,
       FLOOR(p * 10000 + 0.5) / 10000 AS base_rate_r4,
       FLOOR({_MDE} * 10000 + 0.5) / 10000 AS mde_abs_r4,
       FLOOR({_MDE} / p * 10000 + 0.5) / 10000 AS mde_rel_r4
FROM rates
"""


@register("q_events_power_mde", oracle=_POWER_ORACLE)
def q_events_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment POWER planning: given the observed base conversion rate and
    per-arm sample size, the minimum detectable effect (absolute and
    relative) at alpha=0.05 / 80% power — the pre-registration number every
    experiment review asks for, derived from the same per-user conversion
    relation q_events_abtest tests after the fact (design → q_events_power_mde,
    analysis → q_events_abtest / q_events_ttest_welch, ranking →
    q_events_wilson: the full experimentation lifecycle).

    Parity: counts are exact bigints from one per-user aggregate; the MDE
    closed form is a shared expression text with z-quantile literals cast to
    DOUBLE before arithmetic, snapped r4. Scale shape: one per-user hash agg
    (map-side partials) and a 1-row projection.
    """
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 90), 1
            ).otherwise(0)
        ).alias("converted")
    )
    arms = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum("converted").cast("bigint").alias("n_conv"),
    )
    rates = arms.select(
        "n_users",
        "n_a",
        "n_conv",
        F.expr("CAST(n_conv AS DOUBLE) / n_users").alias("p"),
        F.expr("CAST(n_a AS DOUBLE)").alias("n_arm"),
    )
    return rates.select(
        "n_users",
        "n_a",
        "n_conv",
        F.expr("FLOOR(p * 10000 + 0.5) / 10000").alias("base_rate_r4"),
        F.expr(f"FLOOR({_MDE} * 10000 + 0.5) / 10000").alias("mde_abs_r4"),
        F.expr(f"FLOOR({_MDE} / p * 10000 + 0.5) / 10000").alias("mde_rel_r4"),
    )


# --- q_bootstrap_poisson (deterministic Poisson bootstrap of a mean) ---------

_BOOT_R = 10  # bootstrap replicates

#: deterministic per-(row, replicate) weight with Poisson(1)-like pmf over
#: {0,1,2,3} (p = 12/32, 12/32, 6/32, 2/32), derived from a portable
#: sha256 hash — every engine draws the SAME bootstrap samples.
_BOOT_W = (
    "CASE WHEN hb < 12 THEN 0 WHEN hb < 24 THEN 1 WHEN hb < 30 THEN 2 ELSE 3 END"
)

_BOOT_ORACLE = f"""
WITH base AS (
  SELECT event_id, {_CENTS} AS c FROM events WHERE event_type = 'purchase'
), rep AS (
  SELECT b.event_id, b.c, r.r,
         ('0x' || substr(sha256(r.r || ':' || CAST(b.event_id AS VARCHAR)), 1, 8))::BIGINT
           % 32 AS hb
  FROM base b, (SELECT unnest(range(0, {_BOOT_R})) AS r) r
), reps AS (
  SELECT r,
         CAST(SUM(({_BOOT_W}) * c) AS BIGINT) AS wsum,
         CAST(SUM({_BOOT_W}) AS BIGINT) AS wn
  FROM rep GROUP BY r
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_reps,
       CAST(MIN(wn) AS BIGINT) AS min_wn,
       FLOOR(MIN(CAST(wsum AS DOUBLE) / wn) * 10000 + 0.5) / 10000 AS lo_mean_r4,
       FLOOR(MAX(CAST(wsum AS DOUBLE) / wn) * 10000 + 0.5) / 10000 AS hi_mean_r4,
       CAST(SUM(wsum) AS BIGINT) AS tot_wsum
FROM reps
"""


@register("q_bootstrap_poisson", oracle=_BOOT_ORACLE)
def q_bootstrap_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap of the mean purchase value — the distributed
    bootstrap: instead of resampling n rows WITH replacement (which needs
    global coordination), every row independently draws a replicate weight
    from a Poisson(1)-like pmf, giving each of the {_BOOT_R} replicates a
    valid bootstrap sample in ONE streaming pass. Here the draw is a
    DETERMINISTIC sha256 hash of (replicate, event_id), so the "random"
    resamples are engine-portable and the whole procedure is certifiable:
    the replicate mean envelope (min/max over replicates) is the CI sketch.

    Scale shape: a narrow ×{_BOOT_R} fan-out (no shuffle) then one
    {_BOOT_R}-group hash aggregate with map-side partials — the bootstrap
    of a 100 TB mean costs {_BOOT_R} weighted sums, not {_BOOT_R} shuffles.
    Parity: weights and weighted sums are exact integers; each replicate
    mean is one double division, min/max over replicates picked exactly.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    base = ev.select("event_id", F.expr(_CENTS).alias("c"))
    rep = base.select(
        "event_id",
        "c",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_R - 1))).alias("r"),
    ).select(
        "c",
        "r",
        F.expr(
            "CAST(CONV(SUBSTRING(SHA2(CONCAT(CAST(r AS STRING), ':', "
            "CAST(event_id AS STRING)), 256), 1, 8), 16, 10) AS BIGINT) % 32"
        ).alias("hb"),
    )
    w = F.expr(_BOOT_W)
    reps = rep.groupBy("r").agg(
        F.sum(w * F.col("c")).cast("bigint").alias("wsum"),
        F.sum(w).cast("bigint").alias("wn"),
    )
    mean = F.col("wsum").cast("double") / F.col("wn")
    return reps.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_reps"),
        F.min("wn").cast("bigint").alias("min_wn"),
        (F.floor(F.min(mean) * 10000 + F.lit(0.5)) / 10000).alias("lo_mean_r4"),
        (F.floor(F.max(mean) * 10000 + F.lit(0.5)) / 10000).alias("hi_mean_r4"),
        F.sum("wsum").cast("bigint").alias("tot_wsum"),
    )


# --- q_docs_chisq (chi-square independence of lang × source) -----------------

_CHISQ_ORACLE = """
WITH obs AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
  FROM documents GROUP BY lang, source
), rows_t AS (
  SELECT lang, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY lang
), cols_t AS (
  SELECT source, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY source
), n_t AS (
  SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs
), cells AS (
  SELECT rows_t.lang, cols_t.source, rows_t.r, cols_t.c, n_t.n,
         COALESCE(obs.o, 0) AS o
  FROM rows_t CROSS JOIN cols_t CROSS JOIN n_t
  LEFT JOIN obs ON obs.lang = rows_t.lang AND obs.source = cols_t.source
), contrib AS (
  SELECT CAST((o * n - r * c) * (o * n - r * c) AS DOUBLE) / (r * c * n) AS t
  FROM cells
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cells) AS n_cells,
       (SELECT CAST((COUNT(DISTINCT lang) - 1) * (COUNT(DISTINCT source) - 1) AS BIGINT)
        FROM cells) AS dof,
       FLOOR(CAST(SUM(CAST(t AS DECIMAL(27,7))) AS DOUBLE) * 10000 + 0.5) / 10000
         AS chi2_r4
FROM contrib
"""


@register("q_docs_chisq", oracle=_CHISQ_ORACLE)
def q_docs_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between document language
    and source — the standard "is my corpus mix balanced across crawls"
    diagnostic before training-data mixing.

    Parity engineering: the full contingency table INCLUDES structurally
    empty cells (row×column cross join, observed counts left-joined in) —
    dropping zero cells understates chi². Each cell's contribution uses
    the all-integer numerator (o·N − r·c)² over the integer denominator
    r·c·N (exact bigints at this table's magnitudes), one double division
    per cell, and the cell sum goes through the exact-decimal cast so it
    is partition-order independent. dof = (|langs|−1)(|sources|−1).

    Scale shape: one hash aggregate over the fact table; everything after
    operates on the ~100-row contingency table (broadcast joins). At
    100 TB the fact scan dominates and nothing else grows. The contingency
    relation is lazily checkpointed (round 13, guide §5): it feeds FOUR
    consumers (the left join + row/col/total margins), each of which
    otherwise re-ran the fact aggregate — ~100 rows, the rerank-class tiny
    checkpoint, so the fact table is scanned once at any scale."""
    docs = load(spark, sf_dir, "documents")
    obs = (
        docs.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
        .localCheckpoint(eager=False)
    )
    rows_t = obs.groupBy("lang").agg(F.sum("o").cast("bigint").alias("r"))
    cols_t = obs.groupBy("source").agg(F.sum("o").cast("bigint").alias("c"))
    n_t = obs.agg(F.sum("o").cast("bigint").alias("n"))
    cells = (
        rows_t.crossJoin(F.broadcast(cols_t))
        .crossJoin(F.broadcast(n_t))
        .join(F.broadcast(obs), ["lang", "source"], "left")
        .select(
            "lang",
            "source",
            "r",
            "c",
            "n",
            F.coalesce(F.col("o"), F.lit(0).cast("bigint")).alias("o"),
        )
    )
    contrib = cells.select(
        F.expr(
            "CAST((o * n - r * c) * (o * n - r * c) AS DOUBLE) / (r * c * n)"
        ).alias("t"),
        "lang",
        "source",
    )
    return contrib.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        (
            (F.count_distinct(F.col("lang")) - 1)
            * (F.count_distinct(F.col("source")) - 1)
        )
        .cast("bigint")
        .alias("dof"),
        (
            F.floor(
                F.sum(F.col("t").cast("decimal(27,7)")).cast("double") * 10000
                + F.lit(0.5)
            )
            / 10000
        ).alias("chi2_r4"),
    )


# --- q_events_ks (exact two-sample Kolmogorov-Smirnov) -----------------------

_KS_ORACLE = """
WITH pts AS (
  SELECT value AS v,
         CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS da,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS db
  FROM events
  WHERE event_type IN ('click', 'purchase')
  GROUP BY value
), cum AS (
  SELECT CAST(SUM(da) OVER (ORDER BY v) AS BIGINT) AS ca,
         CAST(SUM(db) OVER (ORDER BY v) AS BIGINT) AS cb
  FROM pts
), tot AS (
  SELECT MAX(ca) AS na, MAX(cb) AS nb FROM cum
)
SELECT CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
       CAST(MAX(ABS(ca::HUGEINT * nb - cb::HUGEINT * na)) AS BIGINT) AS d_num,
       FLOOR(CAST(MAX(ABS(ca::HUGEINT * nb - cb::HUGEINT * na)) AS DOUBLE)
             / (na::HUGEINT * nb) * 10000 + 0.5)
         / 10000 AS d_r4
FROM cum CROSS JOIN tot
GROUP BY na, nb
"""


@register("q_events_ks", oracle=_KS_ORACLE)
def q_events_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov distance between the `value`
    distributions of two event types — the distribution-drift test that
    needs no binning choice (unlike a chi-square over buckets).

    Parity engineering: the supremum is computed over the merged support
    as MAX|ca·Nb − cb·Na| in exact integers (the float D = sup|F_a−F_b|
    follows by ONE double division), so there is no accumulated-float
    ECDF anywhere and ties in `v` collapse into one support point on both
    engines identically. The cross-multiply runs 128-bit (Spark
    decimal(38,0), DuckDB HUGEINT): at 10¹² event rows ca·Nb ~ 10²³
    passes int64 — the q_events_bot_screen span-overflow class (the
    reported d_num column stays bigint; past 2⁶³ the cast fails loudly
    instead of wrapping, and the report column itself would need widening).

    Scale shape: one hash aggregate collapses the fact to its distinct
    value support, then one global ordered window computes both running
    counts in a single sort. The support is bounded by value cardinality
    (≪ row count); if the support itself were huge, the same math
    partitions by value range with per-range offsets (documented, not
    needed here)."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    pts = ev.groupBy(F.col("value").alias("v")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("da"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("db"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = pts.select(
        F.sum("da").over(w).cast("bigint").alias("ca"),
        F.sum("db").over(w).cast("bigint").alias("cb"),
    )
    tot = cum.agg(F.max("ca").alias("na"), F.max("cb").alias("nb"))
    d38 = lambda c: F.col(c).cast("decimal(38,0)")
    cross = F.abs(d38("ca") * d38("nb") - d38("cb") * d38("na"))
    return (
        cum.join(F.broadcast(tot))
        .groupBy("na", "nb")
        .agg(
            F.max(cross).cast("bigint").alias("d_num"),
            (
                F.floor(
                    F.max(cross).cast("double")
                    / (d38("na") * d38("nb")).cast("double")
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("d_r4"),
        )
        .select(
            F.col("na").cast("bigint").alias("na"),
            F.col("nb").cast("bigint").alias("nb"),
            "d_num",
            "d_r4",
        )
    )


# --- q_agg_linreg (grouped OLS via exact sufficient statistics) --------------

#: OLS closed forms over the double-cast exact sums — ONE shared text so
#: both engines build identical IEEE trees. y is integer CENTS, so the
#: slope/intercept rescale by 100 at output. Sufficient statistics are
#: bigint per-row products summed as DECIMAL(38,0): exact at any row
#: count, and ~2x faster than scale-7 decimal accumulation of doubles
#: (long-backed products, no scale alignment).
_LR_SLOPE_C = "((n * sxy - sx * sy) / (n * sxx - sx * sx))"
_LR_ICEPT_C = f"((sy - {_LR_SLOPE_C} * sx) / n)"
_LR_R2 = (
    "((n * sxy - sx * sy) * (n * sxy - sx * sy) "
    "/ ((n * sxx - sx * sx) * (n * syy - sy * sy)))"
)

_LINREG_ORACLE = f"""
WITH c AS (
  SELECT l_returnflag,
         CAST(l_quantity AS BIGINT) AS q,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
  FROM lineitem
), s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(q AS DECIMAL(38,0))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(c AS DECIMAL(38,0))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(q * q AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(q * c AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(c * c AS DECIMAL(38,0))) AS DOUBLE) AS syy
  FROM c GROUP BY l_returnflag
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
       FLOOR(({_LR_SLOPE_C} / 100) * 10000 + 0.5) / 10000 AS slope_r4,
       FLOOR(({_LR_ICEPT_C} / 100) * 10000 + 0.5) / 10000 AS intercept_r4,
       FLOOR({_LR_R2} * 10000 + 0.5) / 10000 AS r2_r4
FROM s
ORDER BY l_returnflag
"""


@register("q_agg_linreg", oracle=_LINREG_ORACLE)
def q_agg_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group simple linear regression (price ~ quantity per return
    flag) from one-pass sufficient statistics — the REGR_SLOPE /
    REGR_INTERCEPT / REGR_R2 family expressed as a single hash aggregate.

    Parity engineering: per-row products are EXACT bigints (quantity ×
    integer cents — no float enters until the closed form), summed as
    DECIMAL(38,0) so no row count can overflow them, cast to double once;
    all three closed forms evaluate from ONE shared expression text, with
    the cents scale divided back out at output.

    Scale shape: a single map-side-combined aggregate — the whole
    regression is 6 numbers per group, the textbook mergeable-state
    pattern (same family as q_agg_corr / q_window_rolling_corr).
    Decimal(38,0) over bigint products measured ~2x faster than scale-7
    decimal accumulation of double products (no scale alignment)."""
    li = load(spark, sf_dir, "lineitem")
    c = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("q"),
        F.expr("CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)").alias("c"),
    )
    s = c.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.expr("CAST(q AS DECIMAL(38,0))")).cast("double").alias("sx"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0))")).cast("double").alias("sy"),
        F.sum(F.expr("CAST(q * q AS DECIMAL(38,0))")).cast("double").alias("sxx"),
        F.sum(F.expr("CAST(q * c AS DECIMAL(38,0))")).cast("double").alias("sxy"),
        F.sum(F.expr("CAST(c * c AS DECIMAL(38,0))")).cast("double").alias("syy"),
    )
    return s.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n_rows"),
        F.expr(f"FLOOR(({_LR_SLOPE_C} / 100) * 10000 + 0.5) / 10000").alias(
            "slope_r4"
        ),
        F.expr(f"FLOOR(({_LR_ICEPT_C} / 100) * 10000 + 0.5) / 10000").alias(
            "intercept_r4"
        ),
        F.expr(f"FLOOR({_LR_R2} * 10000 + 0.5) / 10000").alias("r2_r4"),
    ).orderBy("l_returnflag")


# --- q_events_cuped (CUPED variance-reduced A/B means) -----------------------

#: θ and the adjusted mean from double-cast exact sums — ONE shared text.
_CUPED_THETA = "((n * sxy - sx * sy) / (n * sxx - sx * sx))"

_CUPED_ORACLE = f"""
WITH per_user AS (
  SELECT user_id, user_id % 2 AS arm,
         CAST(SUM(CASE WHEN ts <  TIMESTAMP '2024-07-01 00:00:00'
                        AND event_type = 'click' THEN {_CENTS} ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-07-01 00:00:00'
                        AND event_type = 'purchase' THEN {_CENTS} ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY user_id
), pooled AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(x AS DECIMAL(27,7))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(27,7))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * x AS DECIMAL(27,7))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(x * y AS DECIMAL(27,7))) AS DOUBLE) AS sxy
  FROM per_user
), arms AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(CAST(x AS DECIMAL(27,7))) AS DOUBLE) AS asx,
         CAST(SUM(CAST(y AS DECIMAL(27,7))) AS DOUBLE) AS asy
  FROM per_user GROUP BY arm
)
SELECT arm, n_users,
       FLOOR(asy / n_users * 10000 + 0.5) / 10000 AS mean_y_r4,
       FLOOR((asy / n_users - {_CUPED_THETA} * (asx / n_users - sx / n))
             * 10000 + 0.5) / 10000 AS mean_y_cuped_r4,
       FLOOR({_CUPED_THETA} * 10000 + 0.5) / 10000 AS theta_r4
FROM arms CROSS JOIN pooled
ORDER BY arm
"""


@register("q_events_cuped", oracle=_CUPED_ORACLE)
def q_events_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for A/B outcome means: pre-period click
    spend is the covariate X, post-period purchase spend the outcome Y,
    θ = cov(X,Y)/var(X) fitted on the POOLED population (the standard
    unbiased choice), and each arm reports mean(Y) alongside the adjusted
    mean(Y) − θ·(mean(X_arm) − mean(X_pooled)) — the estimator that makes
    experiments read out days earlier at the same power.

    Parity engineering: X and Y are exact per-user integer cents built in
    ONE conditional pass over events; pooled moments are decimal-exact
    sums (bigint x² would overflow at 100 TB user counts) cast to double
    once; θ and both means evaluate from shared expression text.

    Scale shape: one user-keyed aggregate over the fact, then a 2-row arm
    aggregate and a 1-row pooled aggregate (derived from the same
    per-user relation, broadcast back). Nothing after the first shuffle
    grows with data."""
    ev = load(spark, sf_dir, "events")
    cutoff = F.lit("2024-07-01 00:00:00").cast("timestamp_ntz")
    cents = F.expr(_CENTS)
    per_user = ev.groupBy(
        "user_id", (F.col("user_id") % 2).alias("arm")
    ).agg(
        F.sum(
            F.when((F.col("ts") < cutoff) & (F.col("event_type") == "click"), cents)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("x"),
        F.sum(
            F.when(
                (F.col("ts") >= cutoff) & (F.col("event_type") == "purchase"), cents
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("y"),
    )
    pooled = per_user.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("x").cast("decimal(27,7)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(27,7)")).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(27,7)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(27,7)"))
        .cast("double")
        .alias("sxy"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(F.col("x").cast("decimal(27,7)")).cast("double").alias("asx"),
        F.sum(F.col("y").cast("decimal(27,7)")).cast("double").alias("asy"),
    )
    return (
        arms.join(F.broadcast(pooled))
        .select(
            "arm",
            "n_users",
            F.expr("FLOOR(asy / n_users * 10000 + 0.5) / 10000").alias("mean_y_r4"),
            F.expr(
                f"FLOOR((asy / n_users - {_CUPED_THETA} * (asx / n_users - sx / n))"
                " * 10000 + 0.5) / 10000"
            ).alias("mean_y_cuped_r4"),
            F.expr(f"FLOOR({_CUPED_THETA} * 10000 + 0.5) / 10000").alias("theta_r4"),
        )
        .orderBy("arm")
    )


# --- q_docs_mutual_info (lang × source mutual information) -------------------

_MI_ORACLE = """
WITH obs AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
  FROM documents GROUP BY lang, source
), rows_t AS (
  SELECT lang, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY lang
), cols_t AS (
  SELECT source, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY source
), n_t AS (
  SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs
), terms AS (
  SELECT (CAST(o AS DOUBLE) / n)
           * (FLOOR(LN(CAST(o AS DOUBLE) * n / (r * c)) * 1000000 + 0.5)
              / 1000000.0) AS t
  FROM obs
  JOIN rows_t USING (lang)
  JOIN cols_t USING (source)
  CROSS JOIN n_t
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       FLOOR(CAST(SUM(CAST(t AS DECIMAL(27,7))) AS DOUBLE) * 10000 + 0.5) / 10000
         AS mi_nats_r4
FROM terms
"""


@register("q_docs_mutual_info", oracle=_MI_ORACLE)
def q_docs_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(lang; source) in nats over the corpus — the
    companion to q_docs_chisq that answers "HOW MUCH does knowing the
    source tell you about the language" on an interpretable scale (0 =
    independent, min(H(lang), H(source)) = fully determined); the
    dependence screen feature stores run between every categorical pair.

    Parity engineering: only observed cells contribute (o·ln(...) → 0 as
    o → 0, so zero cells add nothing — unlike chi-square); the log
    argument o·N/(r·c) is one double built from exact integers, ln is
    micro-snapped before the multiply (the module's libm-drift guard),
    and the term sum crosses partitions as exact decimals.

    Scale shape: identical to q_docs_chisq — one fact aggregate, then
    broadcast joins over the tiny contingency relation. The contingency
    relation is lazily checkpointed (round 13, guide §5): it feeds FOUR
    consumers (terms + row/col/total margins), each of which otherwise
    re-ran the fact aggregate — |lang|·|source| rows, the rerank-class
    tiny checkpoint, so the fact table is scanned once at any scale."""
    docs = load(spark, sf_dir, "documents")
    obs = (
        docs.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
        .localCheckpoint(eager=False)
    )
    rows_t = obs.groupBy("lang").agg(F.sum("o").cast("bigint").alias("r"))
    cols_t = obs.groupBy("source").agg(F.sum("o").cast("bigint").alias("c"))
    n_t = obs.agg(F.sum("o").cast("bigint").alias("n"))
    terms = (
        obs.join(F.broadcast(rows_t), "lang")
        .join(F.broadcast(cols_t), "source")
        .crossJoin(F.broadcast(n_t))
        .select(
            (
                (F.col("o").cast("double") / F.col("n"))
                * (
                    F.floor(
                        F.log(
                            F.col("o").cast("double")
                            * F.col("n")
                            / (F.col("r") * F.col("c"))
                        )
                        * 1000000
                        + F.lit(0.5)
                    )
                    / 1000000.0
                )
            ).alias("t")
        )
    )
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        (
            F.floor(
                F.sum(F.col("t").cast("decimal(27,7)")).cast("double") * 10000
                + F.lit(0.5)
            )
            / 10000
        ).alias("mi_nats_r4"),
    )


# --- q_events_ratio_ci (delta-method CI for a ratio metric) ------------------

#: var(R) ≈ (var_n + R²·var_d − 2·R·cov) / (n·mean_d²) — the delta method on
#: per-user (numerator, denominator); ONE shared text both engines.
_RATIO_R = "(CAST(sy AS DOUBLE) / sx)"
_RATIO_VAR = (
    f"(((syy - sy * sy / n) + {_RATIO_R} * {_RATIO_R} * (sxx - sx * sx / n) "
    f"- 2 * {_RATIO_R} * (sxy - sx * sy / n)) / (n - 1)) "
    f"/ (n * (sx / n) * (sx / n))"
)

_RATIO_CI_ORACLE = f"""
WITH per_user AS (
  SELECT user_id, user_id % 2 AS arm,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN {_CENTS} ELSE 0 END)
              AS BIGINT) AS y,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS x
  FROM events GROUP BY user_id
), s AS (
  SELECT arm,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(x AS DECIMAL(27,7))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(27,7))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(x * y AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(y * y AS DECIMAL(38,0))) AS DOUBLE) AS syy
  FROM per_user WHERE x > 0 GROUP BY arm
)
SELECT arm, CAST(n AS BIGINT) AS n_users,
       FLOOR({_RATIO_R} * 10000 + 0.5) / 10000 AS ratio_r4,
       FLOOR(({_RATIO_R} - 1.96 * SQRT({_RATIO_VAR})) * 10000 + 0.5) / 10000
         AS ci_lo_r4,
       FLOOR(({_RATIO_R} + 1.96 * SQRT({_RATIO_VAR})) * 10000 + 0.5) / 10000
         AS ci_hi_r4
FROM s
ORDER BY arm
"""


@register("q_events_ratio_ci", oracle=_RATIO_CI_ORACLE)
def q_events_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method 95% CI for a RATIO metric (purchase cents per view) —
    the metric family where naive per-event averaging is wrong because the
    randomization unit (user) differs from the analysis unit (event): the
    ratio of per-user sums with its linearization variance is the standard
    correct estimator (Deng et al.'s ratio-metric methodology).

    Parity engineering: per-user numerators/denominators are exact
    integers from one conditional pass; arm-level moments are exact
    decimal sums (DECIMAL(38,0) for the bigint products) cast to double
    once; R, var(R) and both bounds evaluate from ONE shared text.

    Scale shape: user-keyed aggregate → 2-row arm aggregate; identical to
    the other experiment readouts, nothing grows past the first shuffle."""
    ev = load(spark, sf_dir, "events")
    cents = F.expr(_CENTS)
    per_user = ev.groupBy("user_id", (F.col("user_id") % 2).alias("arm")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", cents).otherwise(0))
        .cast("bigint")
        .alias("y"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
    )
    s = (
        per_user.filter(F.col("x") > 0)
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(F.col("x").cast("decimal(27,7)")).cast("double").alias("sx"),
            F.sum(F.col("y").cast("decimal(27,7)")).cast("double").alias("sy"),
            F.sum(F.expr("CAST(x * x AS DECIMAL(38,0))")).cast("double").alias("sxx"),
            F.sum(F.expr("CAST(x * y AS DECIMAL(38,0))")).cast("double").alias("sxy"),
            F.sum(F.expr("CAST(y * y AS DECIMAL(38,0))")).cast("double").alias("syy"),
        )
    )
    return s.select(
        "arm",
        F.col("n").cast("bigint").alias("n_users"),
        F.expr(f"FLOOR({_RATIO_R} * 10000 + 0.5) / 10000").alias("ratio_r4"),
        F.expr(
            f"FLOOR(({_RATIO_R} - 1.96 * SQRT({_RATIO_VAR})) * 10000 + 0.5) / 10000"
        ).alias("ci_lo_r4"),
        F.expr(
            f"FLOOR(({_RATIO_R} + 1.96 * SQRT({_RATIO_VAR})) * 10000 + 0.5) / 10000"
        ).alias("ci_hi_r4"),
    ).orderBy("arm")


# --- q_events_did (difference-in-differences) --------------------------------

_DID_ORACLE = f"""
WITH cell AS (
  SELECT user_id % 2 AS arm,
         CASE WHEN ts >= TIMESTAMP '2024-07-01 00:00:00' THEN 1 ELSE 0 END
           AS post,
         {_CENTS} AS cents
  FROM events WHERE event_type = 'purchase'
), s AS (
  SELECT arm, post,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS sc
  FROM cell GROUP BY arm, post
), m AS (
  SELECT
    MAX(CASE WHEN arm = 1 AND post = 1 THEN CAST(sc AS DOUBLE) / n END) AS t_post,
    MAX(CASE WHEN arm = 1 AND post = 0 THEN CAST(sc AS DOUBLE) / n END) AS t_pre,
    MAX(CASE WHEN arm = 0 AND post = 1 THEN CAST(sc AS DOUBLE) / n END) AS c_post,
    MAX(CASE WHEN arm = 0 AND post = 0 THEN CAST(sc AS DOUBLE) / n END) AS c_pre,
    CAST(SUM(n) AS BIGINT) AS n_events
  FROM s
)
SELECT n_events,
       FLOOR((t_post - t_pre) * 10000 + 0.5) / 10000 AS treat_delta_r4,
       FLOOR((c_post - c_pre) * 10000 + 0.5) / 10000 AS control_delta_r4,
       FLOOR(((t_post - t_pre) - (c_post - c_pre)) * 10000 + 0.5) / 10000
         AS did_r4
FROM m
"""


@register("q_events_did", oracle=_DID_ORACLE)
def q_events_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences readout: mean purchase value by
    (arm × pre/post) cell, each arm's post−pre delta, and the DiD estimate
    (treatment delta minus control delta) — the workhorse causal estimate
    when treatment launched at a known time and a concurrent control
    exists; the control delta nets out the secular trend a naive
    before/after comparison would absorb.

    Parity engineering: four exact integer (count, cents) cells from ONE
    conditional aggregate; the four means and three differences are
    identical IEEE ops on both engines, r4-snapped.

    Scale shape: a 4-group map-side-combined aggregate over the fact, then
    arithmetic on 4 rows — the cheapest causal readout there is."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    cutoff = F.lit("2024-07-01 00:00:00").cast("timestamp_ntz")
    s = ev.groupBy(
        (F.col("user_id") % 2).alias("arm"),
        F.when(F.col("ts") >= cutoff, 1).otherwise(0).alias("post"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr(_CENTS)).cast("bigint").alias("sc"),
    )
    mean = F.col("sc").cast("double") / F.col("n")
    m = s.agg(
        F.max(F.when((F.col("arm") == 1) & (F.col("post") == 1), mean)).alias(
            "t_post"
        ),
        F.max(F.when((F.col("arm") == 1) & (F.col("post") == 0), mean)).alias(
            "t_pre"
        ),
        F.max(F.when((F.col("arm") == 0) & (F.col("post") == 1), mean)).alias(
            "c_post"
        ),
        F.max(F.when((F.col("arm") == 0) & (F.col("post") == 0), mean)).alias(
            "c_pre"
        ),
        F.sum("n").cast("bigint").alias("n_events"),
    )
    return m.select(
        "n_events",
        F.expr("FLOOR((t_post - t_pre) * 10000 + 0.5) / 10000").alias(
            "treat_delta_r4"
        ),
        F.expr("FLOOR((c_post - c_pre) * 10000 + 0.5) / 10000").alias(
            "control_delta_r4"
        ),
        F.expr(
            "FLOOR(((t_post - t_pre) - (c_post - c_pre)) * 10000 + 0.5) / 10000"
        ).alias("did_r4"),
    )


# --- q_events_srm (sample-ratio-mismatch guardrail) --------------------------

_SRM_ORACLE = """
WITH arms AS (
  SELECT CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM (SELECT DISTINCT user_id FROM events)
)
SELECT n_a, n_b,
       FLOOR(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b)
             * 10000 + 0.5) / 10000 AS chi2_r4,
       CASE WHEN CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b) > 3.841
            THEN 1 ELSE 0 END AS srm_flag
FROM arms
"""


@register("q_events_srm", oracle=_SRM_ORACLE)
def q_events_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail for a 50/50 split: the 1-dof
    chi-square against equal allocation — for expected halves it reduces
    to (n_a − n_b)²/(n_a + n_b) exactly — with the 0.05 trigger flag. SRM
    is the first thing checked before ANY experiment readout is believed:
    a mismatch means assignment, logging, or filtering is biased and every
    downstream metric is suspect.

    Parity engineering: the unit count is per-USER (one distinct pass),
    the statistic is integer arithmetic with one division, and the trigger
    compares against the χ²₁ 95% critical value as a literal.

    Scale shape: one distinct-user aggregate (two-phase, no skew on a
    uniform id), then arithmetic on one row."""
    ev = load(spark, sf_dir, "events")
    arms = (
        ev.select("user_id")
        .distinct()
        .agg(
            F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_a"),
            F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_b"),
        )
    )
    chi2 = F.expr("CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b)")
    return arms.select(
        "n_a",
        "n_b",
        F.floor(chi2 * 10000 + F.lit(0.5)).cast("double").alias("_t"),
        F.when(chi2 > 3.841, 1).otherwise(0).alias("srm_flag"),
    ).select(
        "n_a",
        "n_b",
        (F.col("_t") / 10000).alias("chi2_r4"),
        "srm_flag",
    )


# --- q_events_conversion_window ----------------------------------------------

_CONV_US = 7 * 86400000000  # 7-day conversion window

_CONV_ORACLE = f"""
WITH signups AS (
  SELECT user_id, MIN(epoch_us(ts)) AS s_us
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), purchases AS (
  SELECT user_id, epoch_us(ts) AS p_us FROM events
  WHERE event_type = 'purchase'
), conv AS (
  SELECT s.user_id, s.s_us,
         MAX(CASE WHEN p.p_us > s.s_us AND p.p_us <= s.s_us + {_CONV_US}
                  THEN 1 ELSE 0 END) AS converted
  FROM signups s LEFT JOIN purchases p ON p.user_id = s.user_id
  GROUP BY s.user_id, s.s_us
)
SELECT CAST(s_us // (7 * 86400000000) AS BIGINT) AS cohort_week,
       CAST(COUNT(*) AS BIGINT) AS n_signups,
       CAST(SUM(converted) AS BIGINT) AS n_converted,
       FLOOR(CAST(SUM(converted) * 100 AS DOUBLE) / COUNT(*) * 10000 + 0.5)
         / 10000 AS conv_pct_r4
FROM conv
GROUP BY cohort_week
ORDER BY cohort_week
"""


@register("q_events_conversion_window", oracle=_CONV_ORACLE)
def q_events_conversion_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded conversion rate by signup cohort: a user converts iff
    a purchase lands within 7 days AFTER their first signup, rolled up per
    signup week — the canonical growth metric done right (the naive
    "converted ever" version inflates older cohorts, because they had
    longer to convert; the fixed window makes cohorts comparable).

    Parity engineering: first-signup and the window test are integer µs;
    the per-user flag is a MAX over the user's joined purchases (exists-
    within-window decorrelated into a user-keyed equi-join + aggregate,
    never a per-row subquery); counts and one division close it out.

    Scale shape: both event slices aggregate/join on user_id — one
    partitioning serves the join and both aggregates; at 100 TB the
    purchase side prunes to the event-type slice at the scan."""
    ev = load(spark, sf_dir, "events")
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("s_us"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts_us").alias("p_us")
    )
    conv = (
        signups.join(purchases, "user_id", "left")
        .groupBy("user_id", "s_us")
        .agg(
            F.max(
                F.when(
                    (F.col("p_us") > F.col("s_us"))
                    & (F.col("p_us") <= F.col("s_us") + _CONV_US),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
    )
    return (
        conv.groupBy(
            F.expr(f"CAST(s_us div {7 * 86400000000} AS BIGINT)").alias("cohort_week")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_signups"),
            F.sum("converted").cast("bigint").alias("n_converted"),
            (
                F.floor(
                    (F.sum("converted") * 100).cast("double")
                    / F.count(F.lit(1))
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("conv_pct_r4"),
        )
        .orderBy("cohort_week")
    )


# --- q_docs_anova (one-way ANOVA of document length across languages) --------

_ANOVA_ORACLE = """
WITH g AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS s,
         CAST(SUM(CAST(n_chars * n_chars AS BIGINT)) AS BIGINT) AS q
  FROM documents GROUP BY lang
), t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS nn,
         CAST(SUM(s) AS BIGINT) AS ss,
         CAST(SUM(q) AS BIGINT) AS qq,
         CAST(SUM(CAST(CAST(s AS DOUBLE) * s / n AS DECIMAL(27,7))) AS DOUBLE)
           AS grp_term
  FROM g
)
SELECT k, nn AS n_docs,
       FLOOR((grp_term - CAST(ss AS DOUBLE) * ss / nn) / (k - 1)
             / ((CAST(qq AS DOUBLE) - grp_term) / (nn - k))
             * 10000 + 0.5) / 10000 AS f_stat_r4,
       FLOOR((grp_term - CAST(ss AS DOUBLE) * ss / nn)
             / (CAST(qq AS DOUBLE) - CAST(ss AS DOUBLE) * ss / nn)
             * 10000 + 0.5) / 10000 AS eta_sq_r4
FROM t
"""


@register("q_docs_anova", oracle=_ANOVA_ORACLE)
def q_docs_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of document length across languages: the F statistic
    (between-group vs within-group variance) and effect size η² — closing
    the inferential-test triad: chi-square (categorical × categorical,
    q_docs_chisq), Kolmogorov-Smirnov (continuous two-sample, q_events_ks),
    ANOVA (continuous × k-group). The corpus question it answers: "does
    document length actually differ by language, or is the mix just noisy".

    Parity engineering: per-group (n, Σx, Σx²) are exact integer sums;
    the only group-level float, s²/n, crosses the final aggregate as an
    exact decimal; F and η² evaluate from the same sufficient statistics
    in one shared closed form, snapped r4.

    Scale shape: one map-side-combined group aggregate, one 5-row rollup —
    the mergeable-moments pattern yet again (q_agg_moments_merge certifies
    exactly why this is safe under any partitioning)."""
    docs = load(spark, sf_dir, "documents")
    g = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("n_chars").cast("bigint")).cast("bigint").alias("s"),
        F.sum((F.col("n_chars") * F.col("n_chars")).cast("bigint"))
        .cast("bigint")
        .alias("q"),
    )
    t = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("s").cast("bigint").alias("ss"),
        F.sum("q").cast("bigint").alias("qq"),
        F.sum(F.expr("CAST(CAST(s AS DOUBLE) * s / n AS DECIMAL(27,7))"))
        .cast("double")
        .alias("grp_term"),
    )
    return t.select(
        "k",
        F.col("nn").alias("n_docs"),
        F.expr(
            "FLOOR((grp_term - CAST(ss AS DOUBLE) * ss / nn) / (k - 1)"
            " / ((CAST(qq AS DOUBLE) - grp_term) / (nn - k))"
            " * 10000 + 0.5) / 10000"
        ).alias("f_stat_r4"),
        F.expr(
            "FLOOR((grp_term - CAST(ss AS DOUBLE) * ss / nn)"
            " / (CAST(qq AS DOUBLE) - CAST(ss AS DOUBLE) * ss / nn)"
            " * 10000 + 0.5) / 10000"
        ).alias("eta_sq_r4"),
    )


# --- q_feature_store_pit (leakage-free point-in-time training assembly) ------

_PIT_CUTOFF = "2024-07-01 00:00:00"  # feature/label boundary
_PIT_HORIZON_US = 14 * 86400000000   # label: purchase within 14 days after

_FSTORE_ORACLE = f"""
WITH feat AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_events_pre,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_purchases_pre,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN {_CENTS} ELSE 0 END)
              AS BIGINT) AS spend_cents_pre,
         CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_seen_us
  FROM events
  WHERE ts < TIMESTAMP '{_PIT_CUTOFF}'
  GROUP BY user_id
), lab AS (
  SELECT DISTINCT user_id, 1 AS label
  FROM events
  WHERE event_type = 'purchase'
    AND ts >= TIMESTAMP '{_PIT_CUTOFF}'
    AND epoch_us(ts) < epoch_us(TIMESTAMP '{_PIT_CUTOFF}') + {_PIT_HORIZON_US}
)
SELECT f.user_id, f.n_events_pre, f.n_purchases_pre, f.spend_cents_pre,
       CAST(epoch_us(TIMESTAMP '{_PIT_CUTOFF}') - f.last_seen_us AS BIGINT)
         AS recency_us,
       CAST(COALESCE(l.label, 0) AS INT) AS label
FROM feat f LEFT JOIN lab l USING (user_id)
"""


@register("q_feature_store_pit", oracle=_FSTORE_ORACLE)
def q_feature_store_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME training-set assembly — the leakage discipline every
    feature store exists to enforce: features see ONLY events strictly
    before the cutoff (activity counts, purchase spend, recency at the
    cutoff), the label sees ONLY the 14-day horizon after it (did the
    user purchase), and the two sides meet in one left join keyed on the
    entity. Leakage — a feature computed over post-cutoff data — is the
    classic silent train/serve-skew bug; here the boundary is a single
    shared constant and the oracle re-derives both sides from the raw
    events, so any feature peeking across it hash-fails.

    Scale shape: one filtered pass per side of the boundary (the
    predicate reaches the parquet scan — at 100 TB with time-partitioned
    events this is partition pruning, reading only each side's date
    range), one hash aggregate per side, one equity join on user_id.
    At full scale the cutoff generalizes to a per-entity as-of join
    against a label-event table (q_join_pit's machinery); the fixed
    global cutoff here is the standard batch-training snapshot.

    Parity: integer event counts/cents, exact epoch-µs recency, label
    coalesced to 0/1 int.
    """
    ev = load(spark, sf_dir, "events")
    cutoff_us = F.expr(f"unix_micros(TIMESTAMP '{_PIT_CUTOFF}')")
    pre = ev.filter(F.col("ts") < F.lit(_PIT_CUTOFF).cast("timestamp_ntz"))
    feat = pre.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events_pre"),
        F.sum((F.col("event_type") == "purchase").cast("int"))
        .cast("bigint")
        .alias("n_purchases_pre"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.expr(_CENTS)).otherwise(0)
        )
        .cast("bigint")
        .alias("spend_cents_pre"),
        F.max("ts_us").cast("bigint").alias("last_seen_us"),
    )
    lab = (
        ev.filter(
            (F.col("event_type") == "purchase")
            & (F.col("ts") >= F.lit(_PIT_CUTOFF).cast("timestamp_ntz"))
            & (F.col("ts_us") < cutoff_us + F.lit(_PIT_HORIZON_US))
        )
        .select("user_id")
        .distinct()
        .withColumn("label", F.lit(1))
    )
    return feat.join(lab, "user_id", "left").select(
        "user_id",
        "n_events_pre",
        "n_purchases_pre",
        "spend_cents_pre",
        (cutoff_us - F.col("last_seen_us")).cast("bigint").alias("recency_us"),
        F.coalesce(F.col("label"), F.lit(0)).cast("int").alias("label"),
    )


# --- q_events_mannwhitney -------------------------------------------------------

_MW_Z_CRIT_MICRO = 1_959_964  # two-sided 5% normal critical value, micro units


_MW_ORACLE = f"""
WITH obs AS (
  SELECT user_id % 2 AS arm, {_CENTS} AS v
  FROM events WHERE event_type = 'purchase'
), vals AS (
  SELECT v,
         CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0_v,
         CAST(COUNT(*) AS BIGINT) AS t
  FROM obs GROUP BY v
), ranked AS (
  SELECT v, n0_v, t,
         COALESCE(SUM(t) OVER (
           ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cum_before
  FROM vals
), agg AS (
  SELECT CAST(SUM(n0_v) AS BIGINT) AS n1,
         CAST(SUM(t - n0_v) AS BIGINT) AS n2,
         CAST(SUM(n0_v * (2 * cum_before + t + 1)) AS BIGINT) AS r1_x2,
         CAST(SUM(t * t * t - t) AS BIGINT) AS tie_term
  FROM ranked
)
SELECT n1, n2,
       CAST(r1_x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
       CAST(FLOOR((CAST(r1_x2 - n1 * (n1 + 1) AS DOUBLE) / 2
                   - CAST(n1 AS DOUBLE) * n2 / 2)
                  / SQRT(CAST(n1 AS DOUBLE) * n2 / 12
                         * ((n1 + n2 + 1)
                            - CAST(tie_term AS DOUBLE)
                              / ((n1 + n2) * (n1 + n2 - 1))))
                  * 1000000 + 0.5) AS BIGINT) AS z_micro,
       CAST(CASE WHEN ABS(FLOOR((CAST(r1_x2 - n1 * (n1 + 1) AS DOUBLE) / 2
                   - CAST(n1 AS DOUBLE) * n2 / 2)
                  / SQRT(CAST(n1 AS DOUBLE) * n2 / 12
                         * ((n1 + n2 + 1)
                            - CAST(tie_term AS DOUBLE)
                              / ((n1 + n2) * (n1 + n2 - 1))))
                  * 1000000 + 0.5)) > {_MW_Z_CRIT_MICRO}
            THEN 1 ELSE 0 END AS BIGINT) AS significant
FROM agg
"""


@register("q_events_mannwhitney", oracle=_MW_ORACLE)
def q_events_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) between experiment arms on purchase
    value — the nonparametric companion to q_events_ttest_welch for the
    heavy-tailed metrics where mean tests mislead. Ranks are NEVER assigned
    row-by-row: the test collapses to the VALUE DISTRIBUTION (per distinct
    cents value: arm-0 count and total count), so tie-averaged rank sums
    come from one cumulative window over DISTINCT values —
    2·R₁ = Σ_v n₀ᵥ·(2·cum_before(v) + tᵥ + 1), an exact integer. The
    tie-corrected normal approximation gives z.

    Exactness: U and 2R₁ are exact bigints (the ×2 carries half-ranks as
    integers); the variance uses the standard tie correction from exact
    integer Σ(t³−t); z snaps to micros; significance compares snapped
    integers against the 1.96 literal.

    Scale shape: one aggregate to the distinct-value distribution (bounded
    by the value domain, not the row count — integer cents), one cumulative
    window over that small relation, one final row. This is how exact rank
    statistics are computed at 100 TB — never a global row sort.
    """
    ev = load(spark, sf_dir, "events")
    obs = ev.filter(F.col("event_type") == "purchase").select(
        (F.col("user_id") % 2).alias("arm"), F.expr(_CENTS).alias("v")
    )
    vals = obs.groupBy("v").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n0_v"),
        F.count(F.lit(1)).cast("bigint").alias("t"),
    )
    wcum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vals.select(
        "v",
        "n0_v",
        "t",
        F.coalesce(F.sum("t").over(wcum), F.lit(0)).alias("cum_before"),
    )
    agg = ranked.agg(
        F.sum("n0_v").cast("bigint").alias("n1"),
        F.sum(F.col("t") - F.col("n0_v")).cast("bigint").alias("n2"),
        F.sum(F.col("n0_v") * (2 * F.col("cum_before") + F.col("t") + 1))
        .cast("bigint")
        .alias("r1_x2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("tie_term"),
    )
    u1_x2 = F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)
    z = (
        (u1_x2.cast("double") / 2 - F.col("n1").cast("double") * F.col("n2") / 2)
        / F.sqrt(
            F.col("n1").cast("double")
            * F.col("n2")
            / 12
            * (
                (F.col("n1") + F.col("n2") + 1)
                - F.col("tie_term").cast("double")
                / (
                    (F.col("n1") + F.col("n2"))
                    * (F.col("n1") + F.col("n2") - 1)
                )
            )
        )
    )
    z_micro = F.floor(z * 1000000 + F.lit(0.5)).cast("bigint")
    return agg.select(
        "n1",
        "n2",
        u1_x2.cast("bigint").alias("u1_x2"),
        z_micro.alias("z_micro"),
        F.when(F.abs(z_micro) > _MW_Z_CRIT_MICRO, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("significant"),
    )


# --- q_events_cem ----------------------------------------------------------------

_CEM_ORACLE = f"""
WITH users AS (
  SELECT user_id,
         CAST(user_id % 2 AS INTEGER) AS treated,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN {_CENTS} ELSE 0 END) AS BIGINT) AS spend
  FROM events GROUP BY user_id
), binned AS (
  -- coarsen: activity volume in buckets of 5 events, capped at 6 bins
  SELECT treated, LEAST(n_events // 5, 5) AS bin, spend FROM users
), cells AS (
  SELECT bin,
         CAST(SUM(treated) AS BIGINT) AS n_t,
         CAST(COUNT(*) - SUM(treated) AS BIGINT) AS n_c,
         CAST(SUM(CASE WHEN treated = 1 THEN spend ELSE 0 END) AS BIGINT)
           AS s_t,
         CAST(SUM(CASE WHEN treated = 0 THEN spend ELSE 0 END) AS BIGINT)
           AS s_c
  FROM binned GROUP BY bin
), matched AS (
  SELECT bin, n_t, n_c, s_t, s_c FROM cells WHERE n_t > 0 AND n_c > 0
), att AS (
  SELECT CAST(SUM(n_t) AS BIGINT) AS n_matched_t,
         CAST(SUM(n_c) AS BIGINT) AS n_matched_c,
         CAST(FLOOR(SUM((CAST(s_t AS DOUBLE) / n_t
                         - CAST(s_c AS DOUBLE) / n_c) * n_t)
                    / SUM(n_t) * 10000 + 0.5) AS BIGINT) AS att_r4_cents,
         CAST((SELECT COUNT(*) FROM cells) AS BIGINT) AS n_cells,
         CAST((SELECT COUNT(*) FROM matched) AS BIGINT) AS n_matched_cells
  FROM matched
)
SELECT n_cells, n_matched_cells, n_matched_t, n_matched_c, att_r4_cents
FROM att
"""


@register("q_events_cem", oracle=_CEM_ORACLE)
def q_events_cem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarsened Exact Matching (CEM) estimate of the treatment effect on
    spend: coarsen the confounder (activity volume) into bins, keep only
    bins containing BOTH arms (exact matching on the coarsened stratum),
    and weight each bin's arm-mean contrast by its treated count — the
    ATT under the CEM weighting scheme. The observational-causal rung
    between the raw contrast (confounded by activity) and q_events_cuped
    (variance reduction for randomized data): matching makes the arms
    comparable WITHIN strata before differencing.

    Exactness: user aggregates, bin counts and spend sums are exact
    bigints; each bin's contrast is a difference of exact-integer ratios
    (bit-identical doubles); the treated-weighted ATT snaps to r4 cents.
    Unmatched-cell counts are the pruning certificate (how much support
    the matching discarded).

    Scale shape: one user-keyed aggregate collapses the fact table, one
    bin-keyed aggregate collapses users to ≤6 cells, and the estimate is
    arithmetic over those cells — the entire causal adjustment costs two
    map-side-combinable shuffles regardless of corpus size. More
    confounders = a wider coarsened key, same plan.
    """
    ev = load(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.expr(_CENTS)).otherwise(0)
        )
        .cast("bigint")
        .alias("spend"),
    ).select(
        (F.col("user_id") % 2).cast("int").alias("treated"),
        F.least(F.expr("n_events div 5"), F.lit(5)).alias("bin"),
        "spend",
    )
    cells = users.groupBy("bin").agg(
        F.sum("treated").cast("bigint").alias("n_t"),
        (F.count(F.lit(1)) - F.sum("treated")).cast("bigint").alias("n_c"),
        F.sum(F.when(F.col("treated") == 1, F.col("spend")).otherwise(0))
        .cast("bigint")
        .alias("s_t"),
        F.sum(F.when(F.col("treated") == 0, F.col("spend")).otherwise(0))
        .cast("bigint")
        .alias("s_c"),
    ).localCheckpoint(eager=False)
    matched = cells.filter((F.col("n_t") > 0) & (F.col("n_c") > 0))
    n_cells = cells.agg(F.count(F.lit(1)).cast("bigint").alias("n_cells"))
    contrast = (
        F.col("s_t").cast("double") / F.col("n_t")
        - F.col("s_c").cast("double") / F.col("n_c")
    )
    att = matched.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matched_cells"),
        F.sum("n_t").cast("bigint").alias("n_matched_t"),
        F.sum("n_c").cast("bigint").alias("n_matched_c"),
        F.floor(
            F.sum(contrast * F.col("n_t")) / F.sum("n_t") * 10000 + F.lit(0.5)
        )
        .cast("bigint")
        .alias("att_r4_cents"),
    )
    return att.crossJoin(F.broadcast(n_cells)).select(
        "n_cells", "n_matched_cells", "n_matched_t", "n_matched_c", "att_r4_cents"
    )


# --- q_events_fdr_bh ---------------------------------------------------------------

_BH_Q_BP = 1000  # FDR level q = 0.10 in basis points

#: Abramowitz-Stegun 7.1.26 constants — the SAME literals in both engines, so
#: the normal-CDF approximation is the identical double-op sequence.
_AS_P = 0.3275911
_AS_B = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def _phi_tail_sql(z: str) -> str:
    """2-sided p-value 2·(1−Φ(|z|)) via erfc(|z|/√2)/... expressed with the
    A&S 7.1.26 erf polynomial: p = erfc(|z|/sqrt(2)) (two-sided normal)."""
    x = f"(ABS({z}) / 1.4142135623730951)"
    t = f"(1.0 / (1.0 + {_AS_P} * {x}))"
    poly = (
        f"((((({_AS_B[4]} * {t} + {_AS_B[3]}) * {t} + {_AS_B[2]}) * {t}"
        f" + {_AS_B[1]}) * {t} + {_AS_B[0]}) * {t})"
    )
    return f"({poly} * EXP(-({x}) * ({x})))"


_FDR_ORACLE = f"""
WITH base AS (
  SELECT c_nationkey AS nation, o_custkey % 2 AS arm,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS s
  FROM orders JOIN customer ON o_custkey = c_custkey
), cell AS (
  SELECT nation,
         CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN arm = 0 THEN s ELSE 0 END) AS BIGINT) AS s0,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN arm = 1 THEN s ELSE 0 END) AS BIGINT) AS s1
  FROM base GROUP BY nation
), z AS (
  SELECT nation, n0, n1,
         (CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
         / SQRT(CAST(s0 + s1 AS DOUBLE) / (n0 + n1)
                * (1 - CAST(s0 + s1 AS DOUBLE) / (n0 + n1))
                * (1.0 / n0 + 1.0 / n1)) AS zv
  FROM cell
  WHERE n0 > 0 AND n1 > 0 AND s0 + s1 > 0 AND s0 + s1 < n0 + n1
), p AS (
  SELECT nation,
         CAST(FLOOR(zv * 1000000 + 0.5) AS BIGINT) AS z_micro,
         CAST(FLOOR({_phi_tail_sql("zv")} * 1000000 + 0.5) AS BIGINT)
           AS p_micro
  FROM z
), ranked AS (
  SELECT nation, z_micro, p_micro,
         ROW_NUMBER() OVER (ORDER BY p_micro, nation) AS rk,
         COUNT(*) OVER () AS m
  FROM p
), thresh AS (
  SELECT COALESCE(MAX(CASE WHEN p_micro * 10000 * m
                                <= {_BH_Q_BP} * rk * 1000000
                           THEN rk END), 0) AS k_star
  FROM ranked
)
SELECT nation, z_micro, p_micro, CAST(rk AS BIGINT) AS rk,
       CAST(CASE WHEN rk <= k_star THEN 1 ELSE 0 END AS BIGINT) AS rejected
FROM ranked, thresh
"""


@register("q_events_fdr_bh", oracle=_FDR_ORACLE)
def q_events_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over a FAMILY of hypothesis tests —
    the multiple-comparisons step every experimentation platform needs when
    one experiment reads out 25 per-nation conversion contrasts: two-arm
    pooled z per nation, two-sided p via the Abramowitz-Stegun erf
    polynomial (SHARED literal constants, so both engines run the identical
    double sequence), then the BH step-up rule: reject the k smallest
    p-values where k is the largest rank with p_(k) ≤ q·k/m (q = 0.10) —
    the integer cross-multiplied form p·10⁴·m ≤ q_bp·k·10⁶ keeps the
    decision exact on both engines.

    Scale shape: one conditional-sum aggregate to |tests| rows; the BH
    ranking and threshold live in two windows over that tiny relation. At
    1000s of concurrent metrics this is the same plan keyed by
    (experiment, metric).
    """
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.col("o_custkey") % 2).alias("arm"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("s"),
    )
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_nationkey").alias("nation")
    )
    cell = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("nation")
        .agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n0"),
            F.sum(F.when(F.col("arm") == 0, F.col("s")).otherwise(0))
            .cast("bigint")
            .alias("s0"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n1"),
            F.sum(F.when(F.col("arm") == 1, F.col("s")).otherwise(0))
            .cast("bigint")
            .alias("s1"),
        )
    )
    pooled = (F.col("s0") + F.col("s1")).cast("double") / (
        F.col("n0") + F.col("n1")
    )
    zv = (
        F.col("s1").cast("double") / F.col("n1")
        - F.col("s0").cast("double") / F.col("n0")
    ) / F.sqrt(pooled * (1 - pooled) * (1.0 / F.col("n0") + 1.0 / F.col("n1")))
    z = cell.filter(
        (F.col("n0") > 0)
        & (F.col("n1") > 0)
        & (F.col("s0") + F.col("s1") > 0)
        & (F.col("s0") + F.col("s1") < F.col("n0") + F.col("n1"))
    ).select("nation", zv.alias("zv"))
    x = F.abs(F.col("zv")) / 1.4142135623730951
    t = 1.0 / (1.0 + _AS_P * x)
    poly = (
        (((_AS_B[4] * t + _AS_B[3]) * t + _AS_B[2]) * t + _AS_B[1]) * t
        + _AS_B[0]
    ) * t
    p_two = poly * F.exp(-x * x)
    p = z.select(
        "nation",
        F.floor(F.col("zv") * 1000000 + F.lit(0.5)).cast("bigint").alias("z_micro"),
        F.floor(p_two * 1000000 + F.lit(0.5)).cast("bigint").alias("p_micro"),
    )
    wall = Window.orderBy("p_micro", "nation")
    wg = Window.partitionBy()
    ranked = p.select(
        "nation",
        "z_micro",
        "p_micro",
        F.row_number().over(wall).alias("rk"),
        F.count(F.lit(1)).over(wg).alias("m"),
    )
    # k* as a SECOND global window over the same single-partition sort (the
    # relation is |tests| rows): no 1-row aggregate job and no broadcast
    # crossJoin — two stage barriers fewer than the agg+join formulation.
    final = ranked.withColumn(
        "k_star",
        F.coalesce(
            F.max(
                F.when(
                    F.col("p_micro") * 10000 * F.col("m")
                    <= _BH_Q_BP * F.col("rk").cast("bigint") * 1000000,
                    F.col("rk"),
                )
            ).over(wg),
            F.lit(0),
        ),
    )
    return final.select(
        "nation",
        "z_micro",
        "p_micro",
        F.col("rk").cast("bigint").alias("rk"),
        F.when(F.col("rk") <= F.col("k_star"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("rejected"),
    )


# --- q_docs_kruskal ----------------------------------------------------------

#: chi-square 95% critical value for df = 4 (5 languages), in micro units —
#: the SAME literal on both engines so the significance bit compares
#: identically snapped integers.
_KW_CHI2_CRIT_MICRO = 9_487_729


_KW_ORACLE = """
WITH lv AS (
  SELECT lang, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY lang, n_chars
), vt AS (
  SELECT v, CAST(SUM(c) AS BIGINT) AS t FROM lv GROUP BY v
), ranked AS (
  SELECT v, t,
         COALESCE(SUM(t) OVER (
           ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cum_before
  FROM vt
), grp AS (
  SELECT lang, CAST(SUM(c) AS BIGINT) AS n_g,
         CAST(SUM(c * (2 * cum_before + t + 1)) AS BIGINT) AS r2_g
  FROM lv JOIN ranked USING (v) GROUP BY lang
), ties AS (
  SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie_term,
         CAST(SUM(t) AS BIGINT) AS nn
  FROM ranked
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(CAST(CAST(r2_g AS DOUBLE) * r2_g / (4 * n_g)
                       AS DECIMAL(27,7))) AS DOUBLE) AS r_term
  FROM grp
)
SELECT k, nn AS n_docs,
       FLOOR((12.0 * r_term / (CAST(nn AS DOUBLE) * (nn + 1)) - 3.0 * (nn + 1))
             * 10000 + 0.5) / 10000 AS h_r4,
       FLOOR((12.0 * r_term / (CAST(nn AS DOUBLE) * (nn + 1)) - 3.0 * (nn + 1))
             / (1.0 - CAST(tie_term AS DOUBLE)
                      / (CAST(nn AS DOUBLE) * nn * nn - nn))
             * 10000 + 0.5) / 10000 AS h_corr_r4,
       CAST(CASE WHEN FLOOR((12.0 * r_term / (CAST(nn AS DOUBLE) * (nn + 1))
                             - 3.0 * (nn + 1))
                            / (1.0 - CAST(tie_term AS DOUBLE)
                                     / (CAST(nn AS DOUBLE) * nn * nn - nn))
                            * 1000000 + 0.5) > 9487729
            THEN 1 ELSE 0 END AS BIGINT) AS significant
FROM tot, ties
"""


@register("q_docs_kruskal", oracle=_KW_ORACLE)
def q_docs_kruskal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test of document length across the 5 languages —
    the nonparametric k-group companion to q_docs_anova (and the k-group
    generalization of q_events_mannwhitney): does the length DISTRIBUTION
    differ by language when heavy tails make the F test unreliable?

    Like Mann-Whitney, ranks are never assigned row-by-row: the statistic
    collapses to the VALUE DISTRIBUTION. Per (lang, length) counts join the
    per-length tie-averaged rank (2·rank carried as the exact integer
    2·cum_before + t + 1 from ONE cumulative window over distinct lengths),
    giving each group's doubled rank sum 2·R_g as an exact bigint. Then
    H = 12/(N(N+1))·Σ R_g²/n_g − 3(N+1) with the tie correction
    1 − Σ(t³−t)/(N³−N); R_g²/n_g crosses the final 5-row aggregate as an
    exact decimal(27,7) (the q_docs_anova s²/n pattern), H/H_corr snap r4,
    and the significance bit compares micro-snapped H_corr against the
    shared df=4 chi-square literal.

    Scale shape: one (lang, length) aggregate, one length aggregate, one
    cumulative window over DISTINCT lengths (bounded by the value domain,
    not row count), a broadcast-sized join, and a 5-row rollup — exact rank
    statistics with no global row sort, the only shape that survives 100 TB.
    """
    docs = load(spark, sf_dir, "documents")
    lv = docs.groupBy("lang", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    vt = lv.groupBy("v").agg(F.sum("c").cast("bigint").alias("t"))
    wcum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vt.select(
        "v", "t", F.coalesce(F.sum("t").over(wcum), F.lit(0)).alias("cum_before")
    )
    grp = (
        lv.join(F.broadcast(ranked), "v")
        .groupBy("lang")
        .agg(
            F.sum("c").cast("bigint").alias("n_g"),
            F.sum(F.col("c") * (2 * F.col("cum_before") + F.col("t") + 1))
            .cast("bigint")
            .alias("r2_g"),
        )
    )
    ties = ranked.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("tie_term"),
        F.sum("t").cast("bigint").alias("nn"),
    )
    tot = grp.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(
            F.expr("CAST(CAST(r2_g AS DOUBLE) * r2_g / (4 * n_g) AS DECIMAL(27,7))")
        )
        .cast("double")
        .alias("r_term"),
    )
    j = tot.crossJoin(F.broadcast(ties))
    h = 12.0 * F.col("r_term") / (
        F.col("nn").cast("double") * (F.col("nn") + 1)
    ) - 3.0 * (F.col("nn") + 1)
    corr = 1.0 - F.col("tie_term").cast("double") / (
        F.col("nn").cast("double") * F.col("nn") * F.col("nn") - F.col("nn")
    )
    h_corr = h / corr
    return j.select(
        "k",
        F.col("nn").alias("n_docs"),
        (F.floor(h * 10000 + F.lit(0.5)) / 10000).alias("h_r4"),
        (F.floor(h_corr * 10000 + F.lit(0.5)) / 10000).alias("h_corr_r4"),
        F.when(
            F.floor(h_corr * 1000000 + F.lit(0.5)) > _KW_CHI2_CRIT_MICRO, 1
        )
        .otherwise(0)
        .cast("bigint")
        .alias("significant"),
    )


# --- q_docs_levene -----------------------------------------------------------

#: F(4, ∞) upper-5% critical value in micro units — a shared literal (df₂ is
#: in the hundreds-to-thousands here, where the quantile is within ~0.02 of
#: the asymptote; both engines compare the SAME snapped F to the SAME bar).
_BF_F_CRIT_MICRO = 2_372_000


_LEVENE_ORACLE = """
WITH med AS (
  SELECT lang, CAST(2 * median(n_chars) AS BIGINT) AS med2
  FROM documents GROUP BY lang
), z AS (
  SELECT d.lang, ABS(2 * d.n_chars - m.med2) AS zv
  FROM documents d JOIN med m ON d.lang = m.lang
), g AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(zv) AS BIGINT) AS s,
         CAST(SUM(zv * zv) AS BIGINT) AS q
  FROM z GROUP BY lang
), t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS nn,
         CAST(SUM(s) AS BIGINT) AS ss,
         CAST(SUM(q) AS BIGINT) AS qq,
         CAST(SUM(CAST(CAST(s AS DOUBLE) * s / n AS DECIMAL(27,7))) AS DOUBLE)
           AS grp_term
  FROM g
)
SELECT k, nn AS n_docs,
       FLOOR((grp_term - CAST(ss AS DOUBLE) * ss / nn) / (k - 1)
             / ((CAST(qq AS DOUBLE) - grp_term) / (nn - k))
             * 10000 + 0.5) / 10000 AS f_bf_r4,
       CAST(CASE WHEN FLOOR((grp_term - CAST(ss AS DOUBLE) * ss / nn) / (k - 1)
                            / ((CAST(qq AS DOUBLE) - grp_term) / (nn - k))
                            * 1000000 + 0.5) > 2372000
            THEN 1 ELSE 0 END AS BIGINT) AS heteroscedastic
FROM t
"""


@register("q_docs_levene", oracle=_LEVENE_ORACLE)
def q_docs_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe (median-centered Levene) test of variance equality of
    document length across languages — the assumption check BEHIND
    q_docs_anova: the F test trusts equal group variances, and this is the
    robust way to test exactly that (deviations from the group MEDIAN, so
    heavy tails don't masquerade as variance differences). Statistically it
    is one-way ANOVA applied to |x − median_g|, and the implementation
    shares q_docs_anova's machinery verbatim.

    Parity engineering: group medians of integer lengths land on k or
    k + ½, so 2·median is an exact integer on both engines and the
    deviations z = |2x − 2·med| stay in exact bigint arithmetic (a factor
    4 on variances that cancels in F); per-group (n, Σz, Σz²) are exact,
    s²/n crosses the final rollup as decimal(27,7), F snaps r4 and the
    decision bit compares micro-snapped F against a shared literal.

    Scale shape: one exact-median aggregate per group (at 100 TB: the
    value-distribution rank trick of q_docs_kruskal replaces the sort),
    one broadcast join back, one moments aggregate, one 5-row rollup.
    """
    docs = load(spark, sf_dir, "documents")
    med = docs.groupBy("lang").agg(
        (2 * F.expr("percentile(n_chars, 0.5)")).cast("bigint").alias("med2")
    )
    z = docs.join(F.broadcast(med), "lang").select(
        "lang", F.abs(2 * F.col("n_chars") - F.col("med2")).alias("zv")
    )
    g = z.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("zv").cast("bigint").alias("s"),
        F.sum(F.col("zv") * F.col("zv")).cast("bigint").alias("q"),
    )
    t = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("s").cast("bigint").alias("ss"),
        F.sum("q").cast("bigint").alias("qq"),
        F.sum(F.expr("CAST(CAST(s AS DOUBLE) * s / n AS DECIMAL(27,7))"))
        .cast("double")
        .alias("grp_term"),
    )
    f_bf = (
        (F.col("grp_term") - F.col("ss").cast("double") * F.col("ss") / F.col("nn"))
        / (F.col("k") - 1)
        / (
            (F.col("qq").cast("double") - F.col("grp_term"))
            / (F.col("nn") - F.col("k"))
        )
    )
    return t.select(
        "k",
        F.col("nn").alias("n_docs"),
        (F.floor(f_bf * 10000 + F.lit(0.5)) / 10000).alias("f_bf_r4"),
        F.when(F.floor(f_bf * 1000000 + F.lit(0.5)) > _BF_F_CRIT_MICRO, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("heteroscedastic"),
    )


# --- q_attribution_shapley -----------------------------------------------------

_SHAP_ORACLE = """
WITH fp AS (
  SELECT user_id, MIN(epoch_us(ts)) AS p_us
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
), exposure AS (
  SELECT e.user_id,
         CAST(BIT_OR(CASE e.event_type WHEN 'view' THEN 1
                     WHEN 'click' THEN 2 WHEN 'signup' THEN 4 END) AS BIGINT)
           AS mask
  FROM events e LEFT JOIN fp ON e.user_id = fp.user_id
  WHERE e.event_type IN ('view', 'click', 'signup')
    AND (fp.p_us IS NULL OR epoch_us(e.ts) < fp.p_us)
  GROUP BY e.user_id
), users AS (
  SELECT u.user_id, COALESCE(x.mask, 0) AS mask,
         CASE WHEN fp.user_id IS NULL THEN 0 ELSE 1 END AS conv
  FROM (SELECT DISTINCT user_id FROM events) u
  LEFT JOIN exposure x ON u.user_id = x.user_id
  LEFT JOIN fp ON u.user_id = fp.user_id
), c AS (
  SELECT CAST(SUM(CASE WHEN mask = 0 THEN conv ELSE 0 END) AS BIGINT) AS c0,
         CAST(SUM(CASE WHEN mask = 1 THEN conv ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN mask = 2 THEN conv ELSE 0 END) AS BIGINT) AS c2,
         CAST(SUM(CASE WHEN mask = 3 THEN conv ELSE 0 END) AS BIGINT) AS c3,
         CAST(SUM(CASE WHEN mask = 4 THEN conv ELSE 0 END) AS BIGINT) AS c4,
         CAST(SUM(CASE WHEN mask = 5 THEN conv ELSE 0 END) AS BIGINT) AS c5,
         CAST(SUM(CASE WHEN mask = 6 THEN conv ELSE 0 END) AS BIGINT) AS c6,
         CAST(SUM(CASE WHEN mask = 7 THEN conv ELSE 0 END) AS BIGINT) AS c7
  FROM users
), v AS (
  SELECT c0 AS v0, c0 + c1 AS v1, c0 + c2 AS v2, c0 + c4 AS v4,
         c0 + c1 + c2 + c3 AS v3, c0 + c1 + c4 + c5 AS v5,
         c0 + c2 + c4 + c6 AS v6,
         c0 + c1 + c2 + c3 + c4 + c5 + c6 + c7 AS v7
  FROM c
)
SELECT 'view' AS channel,
       CAST(2 * (v1 - v0) + (v3 - v2) + (v5 - v4) + 2 * (v7 - v6) AS BIGINT)
         AS phi_x6,
       FLOOR(CAST(2 * (v1 - v0) + (v3 - v2) + (v5 - v4) + 2 * (v7 - v6)
                  AS DOUBLE) / 6 * 10000 + 0.5) / 10000 AS phi_r4,
       CAST(v7 - v0 AS BIGINT) AS total_attr
FROM v
UNION ALL
SELECT 'click',
       CAST(2 * (v2 - v0) + (v3 - v1) + (v6 - v4) + 2 * (v7 - v5) AS BIGINT),
       FLOOR(CAST(2 * (v2 - v0) + (v3 - v1) + (v6 - v4) + 2 * (v7 - v5)
                  AS DOUBLE) / 6 * 10000 + 0.5) / 10000,
       CAST(v7 - v0 AS BIGINT)
FROM v
UNION ALL
SELECT 'signup',
       CAST(2 * (v4 - v0) + (v6 - v2) + (v5 - v1) + 2 * (v7 - v3) AS BIGINT),
       FLOOR(CAST(2 * (v4 - v0) + (v6 - v2) + (v5 - v1) + 2 * (v7 - v3)
                  AS DOUBLE) / 6 * 10000 + 0.5) / 10000,
       CAST(v7 - v0 AS BIGINT)
FROM v
"""


@register("q_attribution_shapley", oracle=_SHAP_ORACLE)
def q_attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value attribution over the 3 marketing channels
    (view / click / signup exposure before first purchase) — the
    game-theoretic upgrade of q_attribution_linear: each channel is
    credited its average marginal contribution across all 3! orderings,
    with v(S) = conversions reachable using only channels in S (the
    subset-sum coalition value over exact exposure sets). Organic
    conversions (empty exposure set) stay unattributed — v(∅) is the
    baseline — and the three values sum exactly to v(full) − v(∅)
    (Shapley efficiency, visible in the output).

    Exactness: everything is INTEGER — per-user exposure masks are a
    BIT_OR over pre-first-purchase events (µs time compare), the 8
    coalition values are subset sums of conversion counts, and with
    weights {2,1,1,2}/6 each 6·φ is an exact bigint; φ snaps r4 only for
    display. No sampling, no Monte-Carlo permutations: with bounded
    channel sets the 2³ mask table IS the sufficient statistic.

    Scale shape: one filtered aggregate to per-user masks (events read
    once, first-purchase side broadcast), one 8-cell rollup, then
    constant-time closed-form algebra — channel count, not user count,
    drives the Shapley stage; at 10 channels the mask table is 1024 rows
    and the same plan holds.
    """
    ev = load(spark, sf_dir, "events")
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("p_us"))
    )
    chan = F.when(F.col("event_type") == "view", 1).when(
        F.col("event_type") == "click", 2
    ).when(F.col("event_type") == "signup", 4)
    exposure = (
        ev.filter(F.col("event_type").isin("view", "click", "signup"))
        .join(F.broadcast(fp), "user_id", "left")
        .filter(F.col("p_us").isNull() | (F.col("ts_us") < F.col("p_us")))
        .groupBy("user_id")
        .agg(F.bit_or(chan).cast("bigint").alias("mask"))
    )
    users = (
        ev.select("user_id")
        .distinct()
        .join(F.broadcast(exposure), "user_id", "left")
        .join(F.broadcast(fp.select("user_id", F.lit(1).alias("conv"))), "user_id", "left")
        .select(
            F.coalesce(F.col("mask"), F.lit(0)).alias("mask"),
            F.coalesce(F.col("conv"), F.lit(0)).alias("conv"),
        )
    )
    c = users.agg(
        *[
            F.sum(F.when(F.col("mask") == m, F.col("conv")).otherwise(0))
            .cast("bigint")
            .alias(f"c{m}")
            for m in range(8)
        ]
    )
    v = c.select(
        F.col("c0").alias("v0"),
        (F.col("c0") + F.col("c1")).alias("v1"),
        (F.col("c0") + F.col("c2")).alias("v2"),
        (F.col("c0") + F.col("c1") + F.col("c2") + F.col("c3")).alias("v3"),
        (F.col("c0") + F.col("c4")).alias("v4"),
        (F.col("c0") + F.col("c1") + F.col("c4") + F.col("c5")).alias("v5"),
        (F.col("c0") + F.col("c2") + F.col("c4") + F.col("c6")).alias("v6"),
        (
            F.col("c0") + F.col("c1") + F.col("c2") + F.col("c3")
            + F.col("c4") + F.col("c5") + F.col("c6") + F.col("c7")
        ).alias("v7"),
    )
    phi_view = "2 * (v1 - v0) + (v3 - v2) + (v5 - v4) + 2 * (v7 - v6)"
    phi_click = "2 * (v2 - v0) + (v3 - v1) + (v6 - v4) + 2 * (v7 - v5)"
    phi_signup = "2 * (v4 - v0) + (v6 - v2) + (v5 - v1) + 2 * (v7 - v3)"
    return v.selectExpr(
        f"""stack(3,
            'view',   CAST({phi_view} AS BIGINT),
            'click',  CAST({phi_click} AS BIGINT),
            'signup', CAST({phi_signup} AS BIGINT)
        ) AS (channel, phi_x6)""",
        "CAST(v7 - v0 AS BIGINT) AS total_attr",
    ).select(
        "channel",
        "phi_x6",
        (F.floor(F.col("phi_x6").cast("double") / 6 * 10000 + F.lit(0.5)) / 10000)
        .alias("phi_r4"),
        "total_attr",
    )


# --- q_events_cohens_d ---------------------------------------------------------

#: Cohen's d closed forms over the six exact arm moments — ONE expression
#: text evaluated verbatim by BOTH engines (identical IEEE trees), the
#: q_events_ttest_welch discipline.
_COHEN_VA = (
    "((CAST(n_a AS DOUBLE) * s2_a - CAST(s1_a AS DOUBLE) * s1_a)"
    " / (CAST(n_a AS DOUBLE) * (n_a - 1)))"
)
_COHEN_VB = (
    "((CAST(n_b AS DOUBLE) * s2_b - CAST(s1_b AS DOUBLE) * s1_b)"
    " / (CAST(n_b AS DOUBLE) * (n_b - 1)))"
)
_COHEN_SP = (
    f"SQRT(((n_a - 1) * {_COHEN_VA} + (n_b - 1) * {_COHEN_VB})"
    " / (n_a + n_b - 2))"
)
_COHEN_D = (
    f"((CAST(s1_a AS DOUBLE) / n_a - CAST(s1_b AS DOUBLE) / n_b) / {_COHEN_SP})"
)

_COHEN_ORACLE = f"""
WITH tagged AS (
  SELECT user_id % 2 AS arm, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
  FROM events WHERE event_type = 'purchase'
), arms AS (
  SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN arm = 0 THEN c ELSE 0 END) AS BIGINT) AS s1_a,
         CAST(SUM(CASE WHEN arm = 1 THEN c ELSE 0 END) AS BIGINT) AS s1_b,
         CAST(SUM(CASE WHEN arm = 0 THEN c * c ELSE 0 END) AS BIGINT) AS s2_a,
         CAST(SUM(CASE WHEN arm = 1 THEN c * c ELSE 0 END) AS BIGINT) AS s2_b
  FROM tagged
)
SELECT n_a, n_b,
       FLOOR({_COHEN_SP} * 10000 + 0.5) / 10000 AS pooled_sd_r4,
       FLOOR({_COHEN_D} * 10000 + 0.5) / 10000 AS cohens_d_r4,
       FLOOR({_COHEN_D} * SQRT((CAST(n_a AS DOUBLE) + n_b)
             / (CAST(n_a AS DOUBLE) * n_b)) * 10000 + 0.5) / 10000
         AS d_se_r4
FROM arms
WHERE n_a > 1 AND n_b > 1
"""


@register("q_events_cohens_d", oracle=_COHEN_ORACLE)
def q_events_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d standardized effect size between the two experiment arms —
    the number a significance test does NOT give you: q_events_ttest_welch
    says whether the purchase-value difference is real, this says whether
    it is LARGE (0.2 small / 0.5 medium / 0.8 large, the thresholds every
    experiment review quotes), plus its standard error √((n_a+n_b)/n_a·n_b)
    for the confidence interval. The pair is how mature platforms stop
    shipping statistically-significant-but-tiny changes.

    Parity: the same six exact integer arm moments as the Welch test (one
    conditional aggregate pass); pooled SD, d, and the SE evaluate from
    ONE shared expression text — identical IEEE trees on both engines —
    snapped r4. Degenerate arms (n ≤ 1) drop identically.

    Scale shape: one map-side-combined hash aggregate over the pushed-down
    fact scan; the statistics are a 1-row projection.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    tagged = ev.select(
        (F.col("user_id") % 2).alias("arm"), F.expr(_CENTS).alias("c")
    )
    arms = tagged.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("s1_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("s1_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("c") * F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("s2_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("c") * F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("s2_b"),
    )
    return arms.filter((F.col("n_a") > 1) & (F.col("n_b") > 1)).select(
        "n_a",
        "n_b",
        F.expr(f"FLOOR({_COHEN_SP} * 10000 + 0.5) / 10000").alias("pooled_sd_r4"),
        F.expr(f"FLOOR({_COHEN_D} * 10000 + 0.5) / 10000").alias("cohens_d_r4"),
        F.expr(
            f"FLOOR({_COHEN_D} * SQRT((CAST(n_a AS DOUBLE) + n_b)"
            f" / (CAST(n_a AS DOUBLE) * n_b)) * 10000 + 0.5) / 10000"
        ).alias("d_se_r4"),
    )
