"""Slowly-changing-dimension history operators (SCD-2 build + point-in-time
join) — the lakehouse dimension-versioning family.

Reference analog: ``genesapi/storage.py (upstream)`` keeps versioned cube
files with a last-modified watermark; these operators are the relational
generalization — build explicit validity intervals from a change stream, then
align facts to the version that was current at fact time (the same
time-alignment problem q_join_asof solves, but against a materialized
interval dimension instead of a raw event stream).

Scale notes (100 TB): the SCD-2 build is ONE shuffle (window over user_id);
the point-in-time join is a plain equi-join on the entity key with a residual
interval predicate — co-partition both sides by the key (bucketing at rest)
and no row ever fans out to more than one version because the intervals
partition time. Never plan PIT alignment as a theta join: key-equi + residual
stays a hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from genesapi_cli_spark.io import load
from genesapi_cli_spark.registry import register

#: integer cents snap for the 2-decimal `value` column — exact cross-engine.
_CENTS = "CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"


def build_scd2(ev: DataFrame) -> DataFrame:
    """signup events → SCD-2 attribute history per user.

    Each signup sets the user's attribute (the event ``value``, snapped to
    integer cents). Versions are ordered by (ts_us, event_id) — a total
    order, so LEAD is deterministic; ``valid_to_us`` is NULL on the open
    (current) version.
    """
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.row_number().over(w).alias("version"),
        F.expr(_CENTS).alias("v_cents"),
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us").over(w).alias("valid_to_us"),
        F.when(F.lead("ts_us").over(w).isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_current"),
    )


_SCD2_ORACLE = f"""
WITH s AS (
  SELECT user_id, epoch_us(ts) AS us, event_id, {_CENTS} AS v_cents
  FROM events WHERE event_type = 'signup'
)
SELECT user_id,
       ROW_NUMBER() OVER w AS version,
       v_cents,
       us AS valid_from_us,
       LEAD(us) OVER w AS valid_to_us,
       CASE WHEN LEAD(us) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
FROM s
WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
"""


@register("q_scd2_history", oracle=_SCD2_ORACLE)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 (type-2 slowly-changing dimension) build: turn a change stream
    into versioned validity intervals [valid_from, valid_to) with an
    is_current flag — the standard dimension-history layout every warehouse
    maintains. One window shuffle; q_cdc_apply is the keep-latest (type-1)
    sibling, this one keeps full history."""
    return build_scd2(load(spark, sf_dir, "events"))


_PIT_ORACLE = f"""
WITH dim AS (
  SELECT user_id,
         ROW_NUMBER() OVER w AS version,
         {_CENTS} AS v_cents,
         epoch_us(ts) AS valid_from_us,
         LEAD(epoch_us(ts)) OVER w AS valid_to_us
  FROM events WHERE event_type = 'signup'
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), facts AS (
  SELECT event_id, user_id, epoch_us(ts) AS f_us, {_CENTS} AS p_cents
  FROM events WHERE event_type = 'purchase'
)
SELECT f.event_id, f.user_id, f.f_us, f.p_cents, d.version, d.v_cents
FROM facts f JOIN dim d
  ON f.user_id = d.user_id
 AND d.valid_from_us <= f.f_us
 AND (d.valid_to_us IS NULL OR f.f_us < d.valid_to_us)
"""


@register("q_join_pit", oracle=_PIT_ORACLE)
def q_join_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) join: enrich each purchase with the dimension
    version that was valid at purchase time. The feature-store alignment
    primitive (training-data correctness depends on it — joining the CURRENT
    version instead leaks the future).

    Plan: equi-join on user_id + residual interval predicate. Intervals
    partition time per user, so each fact matches at most one version — no
    dedup pass needed, and the join stays a hash/sort-merge join on the
    entity key (broadcast when the dimension is small). Purchases before the
    first signup have no valid version and drop (inner semantics,
    documented).
    """
    ev = load(spark, sf_dir, "events")
    dim = build_scd2(ev).select(
        F.col("user_id").alias("d_user"),
        "version",
        "v_cents",
        "valid_from_us",
        "valid_to_us",
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts_us").alias("f_us"),
        F.expr(_CENTS).alias("p_cents"),
    )
    return facts.join(
        dim,
        (F.col("user_id") == F.col("d_user"))
        & (F.col("valid_from_us") <= F.col("f_us"))
        & (F.col("valid_to_us").isNull() | (F.col("f_us") < F.col("valid_to_us"))),
        "inner",
    ).select("event_id", "user_id", "f_us", "p_cents", "version", "v_cents")


# --- q_snapshot_diff --------------------------------------------------------

_SNAPDIFF_ORACLE = """
WITH oldv AS (
  SELECT o_orderkey AS k,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % 10 <> 7
), newv AS (
  SELECT o_orderkey AS k,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
           + CASE WHEN o_orderkey % 5 = 0
                  THEN CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) // 10
                  ELSE 0 END AS cents
  FROM orders WHERE o_orderkey % 10 <> 3
), diff AS (
  SELECT CASE WHEN o.k IS NULL THEN 'I'
              WHEN n.k IS NULL THEN 'D'
              ELSE 'U' END AS op,
         COALESCE(o.cents, 0) AS old_cents,
         COALESCE(n.cents, 0) AS new_cents
  FROM oldv o FULL OUTER JOIN newv n ON o.k = n.k
  WHERE o.k IS NULL OR n.k IS NULL OR o.cents <> n.cents
)
SELECT op,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(old_cents) AS BIGINT) AS sum_old_cents,
       CAST(SUM(new_cents) AS BIGINT) AS sum_new_cents
FROM diff
GROUP BY op
"""


@register("q_snapshot_diff", oracle=_SNAPDIFF_ORACLE)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — derive a changelog (insert/update/delete rows) from
    two table states. The INVERSE of q_cdc_apply (which replays a changelog
    into a state): this is how a lake computes incremental downstream feeds
    when the upstream only publishes full snapshots.

    The two snapshots are deterministic transforms of the orders table (old
    drops keys ≡7 mod 10; new drops keys ≡3 mod 10 and bumps prices of keys
    ≡0 mod 5 by exactly cents÷10 — integer arithmetic, so the U-detection
    compares exact int64s, never floats). Plan: one FULL OUTER join on the
    key — at 100 TB co-partition both snapshots on the key (bucketed at
    rest) and the diff is a zero-extra-shuffle zip; unchanged rows are
    filtered before the rollup so the changelog aggregate only sees deltas.
    """
    orders = load(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    oldv = orders.filter(F.col("o_orderkey") % 10 != 7).select(
        F.col("o_orderkey").alias("ko"), cents.alias("old_cents")
    )
    newv = orders.filter(F.col("o_orderkey") % 10 != 3).select(
        F.col("o_orderkey").alias("kn"),
        (
            cents
            + F.when(F.col("o_orderkey") % 5 == 0, F.expr(
                "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) div 10"
            ))
            .otherwise(F.lit(0).cast("bigint"))
        ).alias("new_cents"),
    )
    diff = (
        oldv.join(newv, oldv.ko == newv.kn, "full")
        .filter(
            F.col("ko").isNull()
            | F.col("kn").isNull()
            | (F.col("old_cents") != F.col("new_cents"))
        )
        .select(
            F.when(F.col("ko").isNull(), F.lit("I"))
            .when(F.col("kn").isNull(), F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            F.coalesce("old_cents", F.lit(0)).alias("old_cents"),
            F.coalesce("new_cents", F.lit(0)).alias("new_cents"),
        )
    )
    return diff.groupBy("op").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("old_cents").alias("sum_old_cents"),
        F.sum("new_cents").alias("sum_new_cents"),
    )
