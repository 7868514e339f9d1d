"""Event-time windowed operators (SURVEY.md §2.9), written ONCE as DataFrame
transforms and mounted on both the batch events table (for the DuckDB oracle)
and a Structured Streaming source (tests/test_streaming.py).

Reference analog: the periodic batch cadence + incremental sync of
``genesapi/storage.py (upstream)``; the streaming mount is the continuous
form of the same pipeline.

Scale notes: tumbling/sliding windows are hash aggregates keyed by
(window, type) — the sliding form expands each event into exactly 4 overlapping
windows (1h / 15m) before aggregating, which is how Spark plans it physically;
state size in streaming mode is bounded by watermark eviction. Session windows
shuffle once per user and merge adjacent spans — per-key state, skew-bounded
by per-user event rates. All time arithmetic is integer epoch math (µs/s) —
no float time anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from genesapi_cli_spark.io import load
from genesapi_cli_spark.registry import register

# --- shared transforms (batch + streaming) ----------------------------------


def tumbling_counts(ev: DataFrame) -> DataFrame:
    """events per 1-hour tumbling window per event_type."""
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_seconds(F.col("win.start").cast("timestamp")).alias("win_start_s"),
            "event_type",
            "n",
        )
    )


def sliding_counts(ev: DataFrame) -> DataFrame:
    """events per 1-hour window sliding every 15 minutes."""
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_seconds(F.col("win.start").cast("timestamp")).alias("win_start_s"),
            "event_type",
            "n",
        )
    )


def session_stats(ev: DataFrame) -> DataFrame:
    """Per-user sessions with a 30-minute inactivity gap: start, duration, size.

    A new session starts only when the gap strictly exceeds 30min (an event
    at exactly last+gap merges — session_window's end bound is inclusive for
    the next event). Duration is computed from exact integer µs bounds, not
    from the padded window end.
    """
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(
            F.min("ts_us").alias("start_us"),
            (F.max("ts_us") - F.min("ts_us")).alias("dur_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "start_us", "dur_us", "n_events")
    )


# --- declared batch queries -------------------------------------------------

_TUMBLING_ORACLE = """
SELECT (epoch_us(ts) // 3600000000) * 3600 AS win_start_s,
       event_type,
       COUNT(*) AS n
FROM events
GROUP BY 1, 2
"""


@register("q_stream_tumbling", oracle=_TUMBLING_ORACLE)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling counts per event_type (epoch-aligned on both engines)."""
    return tumbling_counts(load(spark, sf_dir, "events"))


_SLIDING_ORACLE = """
SELECT ((epoch_us(ts) // 900000000) - k) * 900 AS win_start_s,
       event_type,
       COUNT(*) AS n
FROM events, (SELECT unnest([0, 1, 2, 3]) AS k)
GROUP BY 1, 2
"""


@register("q_stream_sliding", oracle=_SLIDING_ORACLE)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 min. Every event belongs to exactly 4
    windows whose starts are bucket(ts) - k·15min for k∈0..3 — the oracle
    enumerates them with integer slot arithmetic (no window function needed)."""
    return sliding_counts(load(spark, sf_dir, "events"))


_SESSION_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, event_id FROM events
), flagged AS (
  SELECT user_id, us,
         CASE WHEN us - LAG(us) OVER w > 1800000000
              OR LAG(us) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
), sess AS (
  SELECT user_id, us,
         SUM(new_s) OVER (
           PARTITION BY user_id ORDER BY us
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS sid
  FROM flagged
)
SELECT user_id,
       MIN(us) AS start_us,
       MAX(us) - MIN(us) AS dur_us,
       COUNT(*) AS n_events
FROM sess
GROUP BY user_id, sid
"""


@register("q_stream_session", oracle=_SESSION_ORACLE)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization per user. Oracle is the classic
    gaps-and-islands; Spark side is native session_window. Boundary semantics
    (verified empirically, tests/test_ops_edge.py): an event at EXACTLY
    last+gap still merges — a new session starts only when the gap is
    strictly greater than 30 min."""
    return session_stats(load(spark, sf_dir, "events"))


_INCR_ORACLE = """
SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date
FROM orders
WHERE o_orderdate > TIMESTAMP '2000-01-01 00:00:00'
  AND NOT EXISTS (
    SELECT 1 FROM orders l
    WHERE l.o_orderkey % 10 < 3 AND l.o_orderkey = orders.o_orderkey
  )
"""


@register("q_incremental_sync", oracle=_INCR_ORACLE)
def q_incremental_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental load = watermark filter + anti-join against the already-
    loaded keyset — the exact relational semantics of storage.should_update
    (upstream): fetch only cubes newer than the stored stand date and not
    already present. At scale the keyset side is a bloom/broadcast or a
    partition-pruned lookup; here it is a left_anti join."""
    orders = load(spark, sf_dir, "orders")
    fresh = orders.filter(
        F.col("o_orderdate") > F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")
    )
    loaded = orders.filter(F.col("o_orderkey") % 10 < 3).select("o_orderkey")
    return fresh.join(loaded, "o_orderkey", "left_anti").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("o_date")
    )


# --- q_stream_late -----------------------------------------------------------

_LATE_US = 600_000_000  # 10-minute watermark delay

_LATE_ORACLE = f"""
WITH arr AS (
  SELECT event_type, event_id, epoch_us(ts) AS us,
         MAX(epoch_us(ts)) OVER (PARTITION BY event_type
                                 ORDER BY event_id
                                 ROWS UNBOUNDED PRECEDING) AS hwm
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN us < hwm - {_LATE_US} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_late,
       FLOOR(CAST(SUM(CASE WHEN us < hwm - {_LATE_US} THEN 1 ELSE 0 END) * 100
                  AS DOUBLE) / COUNT(*) * 10000 + 0.5) / 10000 AS late_pct_r4
FROM arr
GROUP BY event_type
ORDER BY event_type
"""


@register("q_stream_late", oracle=_LATE_ORACLE)
def q_stream_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data accounting, batch-replayed: with arrival order =
    event_id and a 10-minute watermark, a row is LATE (would be dropped by
    a streaming windowed aggregate) when its event time is more than the
    delay behind the per-key high-water mark at its arrival. This is the
    audit every watermark choice needs — "what fraction of my data would a
    10-minute delay actually discard" — computed on history before you
    deploy the streaming job with that delay.

    Parity engineering: the high-water mark is an integer-µs running MAX
    over the deterministic (event_id) arrival order; the late test and
    counts are pure integer ops, one division for the percentage.

    Scale shape: one window partitioned by event type in arrival order
    (exactly the state the streaming engine keeps: max event time per
    key), then a 5-row aggregate that rides the window's partitioning."""
    ev = load(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    arr = ev.select(
        "event_type",
        "event_id",
        F.col("ts_us").alias("us"),
        F.max("ts_us").over(w).alias("hwm"),
    )
    late = F.when(F.col("us") < F.col("hwm") - _LATE_US, 1).otherwise(0)
    return (
        arr.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(late).cast("bigint").alias("n_late"),
            (
                F.floor(
                    (F.sum(late) * 100).cast("double")
                    / F.count(F.lit(1))
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("late_pct_r4"),
        )
        .orderBy("event_type")
    )


# --- q_stream_throttle (per-key debounce with sequential kept-state) ---------

_THROTTLE_GAP_US = 3600000000  # keep at most one event per key per hour

_THROTTLE_ORACLE = f"""
WITH RECURSIVE e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY epoch_us(ts), event_id) AS rn
  FROM events
), rec(user_id, event_type, rn, us, last_kept, kept) AS (
  SELECT user_id, event_type, rn, us, us, 1 FROM e WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.event_type, e.rn, e.us,
         CASE WHEN e.us - rec.last_kept >= {_THROTTLE_GAP_US}
              THEN e.us ELSE rec.last_kept END,
         CASE WHEN e.us - rec.last_kept >= {_THROTTLE_GAP_US}
              THEN 1 ELSE 0 END
  FROM rec JOIN e ON e.user_id = rec.user_id
                 AND e.event_type = rec.event_type
                 AND e.rn = rec.rn + 1
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(kept) AS BIGINT) AS n_kept,
       CAST(COUNT(*) - SUM(kept) AS BIGINT) AS n_dropped
FROM rec
GROUP BY event_type
"""


@register("q_stream_throttle", oracle=_THROTTLE_ORACLE)
def q_stream_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key event THROTTLE (debounce): within each (user_id, event_type)
    stream, an event is dropped when it arrives less than one hour after
    the previous KEPT event — alert/notification rate limiting, dedup of
    bursty repeated signals, and the ingestion-side damper every event
    pipeline runs before fan-out. This is genuinely SEQUENTIAL state (what
    is kept depends on what was previously kept, so no window frame or
    gaps-and-islands rewrite expresses it — contrast q_window_sessionize,
    where islands depend only on raw gaps).

    Spark shape: the per-key sequential-state pattern of q_window_holt,
    with one scale refinement — the ``applyInPandas`` grouping key is a
    USER BUCKET (user_id mod 64), not the raw (user, type) key: the state
    key is fully contained in the bucket, so semantics are identical, but
    each Arrow exchange now carries thousands of rows instead of ~10
    (per-group Arrow/JVM overhead is ~1 ms — 10k micro-groups cost ~11 s,
    64 buckets ~1 s, measured at sf0.1), and the inner per-(user, type)
    scans run as plain pandas groupby inside the batch. At 100 TB the
    same bucketing bounds state-store key count for the
    ``applyInPandasWithState`` streaming version, which
    tests/test_streaming.py exercises. Ties order by (ts, event_id) on
    both engines.

    Parity: pure integer-µs arithmetic; the DuckDB oracle replays the
    identical recursion as a recursive CTE partitioned on the same key.
    """
    import pandas as pd

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts_us", "event_id"
    )

    def throttle(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["user_id", "event_type", "ts_us", "event_id"])
        types, kepts = [], []
        for (_, _), g in pdf.groupby(["user_id", "event_type"], sort=False):
            last_kept = None
            for us in g["ts_us"]:
                if last_kept is None or us - last_kept >= _THROTTLE_GAP_US:
                    kepts.append(1)
                    last_kept = us
                else:
                    kepts.append(0)
            types.extend(g["event_type"])
        return pd.DataFrame({"event_type": types, "kept": kepts})

    flagged = ev.groupBy((F.col("user_id") % 64).alias("ub")).applyInPandas(
        throttle, schema="event_type string, kept int"
    )
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("kept").cast("bigint").alias("n_kept"),
        (F.count(F.lit(1)) - F.sum("kept")).cast("bigint").alias("n_dropped"),
    )


# --- q_stream_dedup (keep-first collapse per key+minute bucket) --------------

_DEDUP_BUCKET_US = 60_000_000  # 1-minute dedup bucket

_STREAM_DEDUP_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
         epoch_us(ts) // {_DEDUP_BUCKET_US} AS minute_b
  FROM events
), ranked AS (
  SELECT event_type, cents,
         ROW_NUMBER() OVER (
           PARTITION BY user_id, event_type, minute_b
           ORDER BY us, event_id
         ) AS rn
  FROM e
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(COUNT(*) - SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped,
       CAST(SUM(CASE WHEN rn = 1 THEN cents ELSE 0 END) AS BIGINT)
         AS sum_kept_cents
FROM ranked
GROUP BY event_type
"""


@register("q_stream_dedup", oracle=_STREAM_DEDUP_ORACLE)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup per (user, event_type, minute): the BATCH mirror of
    Structured Streaming's ``dropDuplicates`` on a bucketed event-time key
    (and the bounded-state cousin ``dropDuplicatesWithinWatermark``, whose
    at-least-once redelivery collapse tests/test_streaming.py pins against
    a doubled file source). Within each 1-minute bucket the earliest
    (ts, event_id) row survives; the report carries the kept rows' exact
    cents sum so the oracle verifies WHICH rows were kept, not just counts.

    Contrast q_stream_throttle: throttle is sequential state (a kept event
    re-arms the timer), so it needs a recursive oracle; bucketed keep-first
    depends only on the row's own bucket — one window, no recursion, and in
    streaming mode the state store holds one key per (user,type,minute)
    inside the watermark horizon, which is what makes it safe on an
    unbounded feed.

    Scale shape: one shuffle on the dedup key (the same partitioning the
    streaming state store uses), window streams within partitions, then a
    map-side-combined rollup to event_type."""
    ev = load(spark, sf_dir, "events")
    from pyspark.sql import Window

    e = ev.select(
        "user_id",
        "event_type",
        "event_id",
        F.col("ts_us").alias("us"),
        F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("cents"),
        F.expr(f"ts_us div {_DEDUP_BUCKET_US}").alias("minute_b"),
    )
    w = Window.partitionBy("user_id", "event_type", "minute_b").orderBy(
        "us", "event_id"
    )
    ranked = e.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        (
            F.count(F.lit(1))
            - F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
        )
        .cast("bigint")
        .alias("n_dropped"),
        F.sum(F.when(F.col("rn") == 1, F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("sum_kept_cents"),
    )


# --- q_stream_leaderboard -------------------------------------------------------

_LEADERBOARD_ORACLE = """
WITH w AS (
  SELECT (epoch_us(ts) // 3600000000) * 3600 AS win_start_s,
         event_type, user_id,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events
  GROUP BY 1, 2, 3
), ranked AS (
  SELECT win_start_s, event_type, user_id, cents,
         ROW_NUMBER() OVER (PARTITION BY win_start_s, event_type
                            ORDER BY cents DESC, user_id) AS rnk
  FROM w
)
SELECT win_start_s, event_type, user_id, cents, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 3
"""


def leaderboard_cents(ev: DataFrame) -> DataFrame:
    """The aggregate half of the leaderboard: exact integer-cent sums per
    (1-hour tumbling event-time window, event_type, user_id). Written once
    and mounted on BOTH the batch events table and a watermarked streaming
    source — the event-time ``window()`` grouping key is what lets the
    streaming state store evict closed windows (an integer-bucket key
    would not carry watermark semantics)."""
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type", "user_id")
        .agg(F.sum(cents).cast("bigint").alias("cents"))
        .select(
            F.unix_seconds(F.col("win.start").cast("timestamp")).alias("win_start_s"),
            "event_type",
            "user_id",
            "cents",
        )
    )


def rank_leaderboard(w: DataFrame) -> DataFrame:
    """The emit half of the leaderboard: top-3 per (window, event_type) by
    cents, user_id tie-break. In the streaming mount this runs inside
    foreachBatch on each micro-batch of CLOSED window aggregates — every
    group of one window finalizes when the watermark passes that window's
    end, i.e. in the SAME micro-batch, so the per-window rank computed on
    emit is complete (tests/test_streaming.py pins batch ≡ stream)."""
    from pyspark.sql import Window

    rnk = F.row_number().over(
        Window.partitionBy("win_start_s", "event_type").orderBy(
            F.desc("cents"), "user_id"
        )
    )
    return (
        w.withColumn("rnk", rnk.cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("win_start_s", "event_type", "user_id", "cents", "rnk")
    )


@register("q_stream_leaderboard", oracle=_LEADERBOARD_ORACLE)
def q_stream_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed LEADERBOARD — top-3 users by value per (1-hour tumbling
    window, event_type): the canonical streaming-analytics shape one rank
    above plain windowed counts (dashboards, abuse screens, spend caps).
    Both halves are shared transforms mounted on batch here and on a real
    stream in tests/test_streaming.py::
    test_leaderboard_batch_equals_stream_foreachbatch — the aggregate runs
    as an append-mode watermarked streaming query and foreachBatch ranks
    each micro-batch of closed windows on emit (rank is not incrementally
    maintainable inside one query), with the emitted union pinned equal to
    this batch relation.

    Parity engineering: values sum as exact integer cents (the shared-
    daily-cents convention), the rank's tie-break is the unique user_id —
    both engines produce the identical leaderboard with no float ordering.

    Scale shape: one hash aggregate keyed by (window, type, user) — epoch-
    aligned event-time bucketing, map-side combinable — then a top-k window
    whose partition count is windows × types; WindowGroupLimit prunes to
    k=3 per partition before the sort materializes. Nothing global, no
    skew (the window key spreads hot types across time)."""
    return rank_leaderboard(leaderboard_cents(load(spark, sf_dir, "events")))
