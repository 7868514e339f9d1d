"""Stream-stream event-time join (SURVEY.md §2.9 runtime surface).

The attribution join — every purchase matched to the user's signup(s) within
a trailing horizon — written ONCE as a DataFrame transform and mounted on
both the batch events table (oracle-checked as ``q_stream_join``) and two
watermarked Structured Streaming inputs (tests/test_streaming.py).

Scale notes: a stream-stream inner join keeps both sides' rows in the state
store until the watermark plus the join's time bound allows eviction — the
explicit event-time range condition (s.ts ≤ p.ts ≤ s.ts + horizon) is what
lets Spark bound state instead of buffering both streams forever. Batch-side
the same plan is an ordinary equi-join on user_id with a residual range
filter; at 100 TB both sides shuffle once on user_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from genesapi_cli_spark.io import load
from genesapi_cli_spark.registry import dec_sum, oracle_dec_sum, register

HORIZON_DAYS = 7


def purchase_attribution(purchases: DataFrame, signups: DataFrame) -> DataFrame:
    """Inner join: purchases to the same user's signups with
    s.ts <= p.ts <= s.ts + 7 days. Works on batch DataFrames and on
    watermarked streams (the range condition bounds streaming state).

    Comparisons are on the µs-truncated ``ts`` column, identical to the
    oracle's epoch_us() arithmetic — integer time, no float.
    """
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        "value",
    )
    s = signups.select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("s_ts"),
    )
    return p.join(
        s,
        (F.col("p_user") == F.col("s_user"))
        & (F.col("s_ts") <= F.col("p_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr(f"INTERVAL {HORIZON_DAYS} DAYS")),
        "inner",
    ).select(
        "purchase_id",
        "signup_id",
        F.col("p_user").alias("user_id"),
        "value",
        F.unix_seconds(F.col("p_ts").cast("timestamp")).alias("p_ts_s"),
    )


_STREAM_JOIN_ORACLE = f"""
SELECT user_id,
       COUNT(*) AS n_attributed,
       {oracle_dec_sum('value', 'sum_value')}
FROM (
  SELECT p.user_id, p.value
  FROM events p JOIN events s
    ON p.user_id = s.user_id
   AND p.event_type = 'purchase' AND s.event_type = 'signup'
   AND epoch_us(s.ts) <= epoch_us(p.ts)
   AND epoch_us(p.ts) <= epoch_us(s.ts) + CAST({HORIZON_DAYS} AS BIGINT) * 86400 * 1000000
)
GROUP BY user_id
"""


@register("q_stream_join", oracle=_STREAM_JOIN_ORACLE)
def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch mount of the stream-stream attribution join: per user, how many
    purchases fall within 7 days of one of their signups (signup multiplicity
    preserved — each matching signup counts), plus the attributed value sum.

    The reference aligns facts to reference dates the same way
    (time-bounded enrichment); q_join_asof is the pick-ONE-match variant,
    this is the keep-ALL-matches interval join.
    """
    ev = load(spark, sf_dir, "events")
    joined = purchase_attribution(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "signup"),
    )
    return joined.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_attributed"),
        dec_sum("value", "sum_value"),
    )
