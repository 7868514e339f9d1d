"""Graph analytics over relational edge lists: degree distributions and
triangle counting on the co-purchase graph.

Reference analog: the reference models region hierarchies and cube
cross-references implicitly (``genesapi/schema.py`` upstream aggregates a
catalog *tree*); these operators make the graph surface explicit the way a
recommendations / entity-resolution pipeline needs it — nodes and edges as
DataFrames, structural metrics as joins and aggregates (no graph runtime:
at 100 TB the edge list IS the scalable representation, and Catalyst plans
the traversals as hash joins).

Scale notes: the co-purchase edge list is generated in-row from baskets
(Σk² fan-out, never O(n²) — q_affinity_pairs documents the whale-basket
cap). Degree is one hash aggregate over the (symmetrized) edge endpoints.
Triangle counting joins edges along the canonical orientation a<b<c, so
each triangle is produced exactly once and the join fan-out is bounded by
per-node degree — the standard distributed triangle algorithm (node-iterator
on an oriented edge list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from genesapi_cli_spark.io import load
from genesapi_cli_spark.registry import register

#: SQL shared by both graph oracles: the ≥2-support co-purchase edge list,
#: canonically oriented part_a < part_b (mirrors q_affinity_pairs).
_EDGES_SQL = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), edges AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= 2
)
"""


def copurchase_edges(li: DataFrame) -> DataFrame:
    """≥2-support co-purchase edges (pa < pb), generated in-row per basket."""
    baskets = (
        li.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(parts, (x, i) -> "
                "transform(slice(parts, i + 2, size(parts)), "
                "y -> struct(x AS pa, y AS pb))))"
            )
        ).alias("p")
    ).select("p.pa", "p.pb")
    return (
        pairs.groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
        .select("pa", "pb")
    )


_DEGREE_ORACLE = f"""{_EDGES_SQL}, deg AS (
  SELECT node, COUNT(*) AS degree
  FROM (SELECT pa AS node FROM edges UNION ALL SELECT pb AS node FROM edges)
  GROUP BY node
)
SELECT degree, COUNT(*) AS n_nodes
FROM deg
GROUP BY degree
"""


@register("q_graph_degree", oracle=_DEGREE_ORACLE)
def q_graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-purchase graph (how many parts have k
    co-purchase partners) — the first structural profile any graph pipeline
    computes, and the skew diagnostic that decides whether downstream joins
    need hub-salting.

    Plan: symmetrize the oriented edge list with a cheap UNION ALL of two
    projections (no join), then two hash aggregates. At 100 TB the edge list
    shuffles once on node; hubs are the documented skew risk.
    """
    # The edge pipeline (basket collect + pair explode + support agg) feeds
    # BOTH union branches; a lazy localCheckpoint materializes it once and
    # the branches read the cached blocks (Catalyst does not dedupe repeated
    # non-exchange subtrees). Same pattern as connected_components; at scale
    # a derived edge table this hot would be persisted to the lake instead.
    edges = copurchase_edges(load(spark, sf_dir, "lineitem")).localCheckpoint(
        eager=False
    )
    nodes = edges.select(F.col("pa").alias("node")).unionAll(
        edges.select(F.col("pb").alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


_TRIANGLES_ORACLE = f"""{_EDGES_SQL}
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles,
       (SELECT COUNT(*) FROM edges) AS n_edges
FROM edges e1
JOIN edges e2 ON e2.pa = e1.pb
JOIN edges e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
"""


@register("q_graph_triangles", oracle=_TRIANGLES_ORACLE)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the co-purchase graph — the clustering-coefficient
    numerator (community density, link-spam detection, graph QA).

    The canonical orientation pa < pb makes every triangle a<b<c appear
    EXACTLY once as (a,b)+(b,c)+(a,c), so the count needs no /6 correction
    and — the scale property — the wedge join (a,b)⋈(b,c) fans out by
    out-degree of the MIDDLE node under the orientation, which truncates hub
    explosion (classic oriented node-iterator). Two hash joins on node keys,
    one global count.
    """
    # One materialization of the edge pipeline for the four consumers
    # (3 join branches + the edge count) — see q_graph_degree.
    edges = copurchase_edges(load(spark, sf_dir, "lineitem")).localCheckpoint(
        eager=False
    )
    e1 = edges.select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    e2 = edges.select(F.col("pa").alias("b2"), F.col("pb").alias("c"))
    e3 = edges.select(F.col("pa").alias("a3"), F.col("pb").alias("c3"))
    wedges = e1.join(e2, F.col("b") == F.col("b2"))
    tri = wedges.join(
        e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3"))
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return tri.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles")).crossJoin(
        F.broadcast(n_edges)
    )
