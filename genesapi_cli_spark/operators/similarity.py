"""Similarity-search + multimodal-column operators (SURVEY.md §2.10).

These are the embedding-space primitives of an LLM-data pipeline: brute-force
cosine top-k (the correctness baseline), label-blocked threshold pairs (the
ANN-free scale pattern), and a text⋈vector multimodal join.

Scale notes:
- the query side of top-k is tiny and broadcast; candidates stream — the plan
  is a broadcast nested-loop + per-query top-k window, never a full shuffle of
  the embedding table. For 100 TB-scale ANN, the same skeleton takes an
  IVF/LSH bucket id as the equi-join key (see q_sim_threshold_pairs, which
  already demonstrates the blocked-join form: candidates restricted to equal
  blocking keys, pair count bounded per block).
- all vector math is JVM higher-order functions over array<double>
  (zip_with/aggregate) — no Python in the loop; embeddings never leave the
  executors; only scalars (similarities, norms) reach the result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from genesapi_cli_spark.io import load
from genesapi_cli_spark.registry import register


def as_double(col) -> Column:
    """array<float> → array<double> so all arithmetic is double (matches the
    oracle's ::DOUBLE[] cast; float accumulation would diverge)."""
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate — sequential left-to-right fold,
    the same order DuckDB's list_dot_product uses → bit-identical."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


# --- q_sim_cosine_topk ------------------------------------------------------

_TOPK_ORACLE = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
), q AS (
  SELECT vec_id AS query_id, emb AS qemb FROM e WHERE vec_id < 10
), c AS (
  SELECT vec_id AS neighbor_id, emb AS cemb FROM e WHERE vec_id >= 10
), scored AS (
  SELECT query_id, neighbor_id,
         list_dot_product(qemb, cemb)
           / (SQRT(list_dot_product(qemb, qemb)) * SQRT(list_dot_product(cemb, cemb))) AS cos
  FROM q CROSS JOIN c
), ranked AS (
  SELECT query_id, neighbor_id,
         FLOOR(cos * 10000 + 0.5) / 10000 AS cos_r,
         ROW_NUMBER() OVER (
           PARTITION BY query_id
           ORDER BY FLOOR(cos * 10000 + 0.5) / 10000 DESC, neighbor_id
         ) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos_r, rank FROM ranked WHERE rank <= 5
"""


@register("q_sim_cosine_topk", oracle=_TOPK_ORACLE)
def q_sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for query vectors (vec_id < 10)
    among the rest. Ranking is on the deterministically-rounded similarity
    (then neighbor_id) so last-ulp float differences can't flip the top-k."""
    e = load(spark, sf_dir, "embeddings").select("vec_id", as_double("embedding").alias("emb"))
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    c = e.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("cemb")
    )
    scored = F.broadcast(q).crossJoin(c).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qemb"), F.col("cemb")).alias("cos"),
    )
    rounded = scored.withColumn("cos_r", F.floor(F.col("cos") * 10000 + F.lit(0.5)) / 10000)
    w = Window.partitionBy("query_id").orderBy(F.col("cos_r").desc(), "neighbor_id")
    return (
        rounded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "cos_r", "rank")
    )


# --- q_sim_threshold_pairs --------------------------------------------------

_THRESHOLD = 0.25

_PAIRS_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings
)
SELECT a.label AS label,
       COUNT(*) AS n_pairs,
       MIN(a.vec_id) AS min_vec_a
FROM e a JOIN e b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE FLOOR((list_dot_product(a.emb, b.emb)
      / (SQRT(list_dot_product(a.emb, a.emb)) * SQRT(list_dot_product(b.emb, b.emb))))
      * 10000 + 0.5) / 10000 > {_THRESHOLD}
GROUP BY a.label
"""


@register("q_sim_threshold_pairs", oracle=_PAIRS_ORACLE)
def q_sim_threshold_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-similarity pairs within label blocks (cos > 0.25), counted per
    label. The label equality is the equi-join key — the pair space is bounded
    per block, which is exactly the structure an IVF/LSH bucket id gives at
    100 TB (this query IS the scale pattern, with label standing in for the
    learned bucket)."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double("embedding").alias("emb")
    )
    a = e.select(
        F.col("vec_id").alias("vec_a"), F.col("label").alias("label"), F.col("emb").alias("ea")
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"), F.col("label").alias("label_b"), F.col("emb").alias("eb")
    )
    return (
        a.join(b, (F.col("label") == F.col("label_b")) & (F.col("vec_a") < F.col("vec_b")))
        .filter(
            F.floor(cosine(F.col("ea"), F.col("eb")) * 10000 + F.lit(0.5)) / 10000 > _THRESHOLD
        )
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_pairs"), F.min("vec_a").alias("min_vec_a"))
    )


# --- q_multimodal_join ------------------------------------------------------

_MULTIMODAL_ORACLE = """
WITH e AS (
  SELECT vec_id, label,
         SQRT(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS l2
  FROM embeddings
)
SELECT label,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
       CAST(SUM(CAST(l2 AS DECIMAL(27,7))) AS DOUBLE) / COUNT(*) AS avg_l2
FROM documents JOIN e ON doc_id = vec_id
GROUP BY label
"""


@register("q_multimodal_join", oracle=_MULTIMODAL_ORACLE)
def q_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text ⋈ vector multimodal plan: documents joined to embeddings on
    doc_id=vec_id, per-label text stats + mean embedding L2 norm. The raw
    vector is projected away before the result (scalars only leave the plan)."""
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.sqrt(dot(as_double("embedding"), as_double("embedding"))).alias("l2"),
    )
    return (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
            (F.sum(F.col("l2").cast("decimal(27,7)")).cast("double") / F.count(F.lit(1))).alias(
                "avg_l2"
            ),
        )
    )
