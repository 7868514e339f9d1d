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
