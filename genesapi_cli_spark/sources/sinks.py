"""Document serialization + NDJSON sink (SURVEY.md §2.1 `q_sink_ndjson`).

Reference analog: ``genesapi/serialize.py (upstream)`` — facts nested into
JSON documents keyed by a content-hash ``fact_id``, written as NDJSON and bulk
indexed into Elasticsearch. Spark-first: the nested document is a single
``to_json(struct(...))`` projection (JVM-side), the identity hash is
``sha2(canonical string)``, the sink is ``df.write.json`` (NDJSON is Spark's
native JSON output — one doc per line). The idempotent-upsert property of the
ES sink maps to deterministic fact_ids + an exactly-once checkpointed file
sink in streaming mode (streaming/runtime.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from genesapi_cli_spark.io import load, spread
from genesapi_cli_spark.registry import register


def order_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested JSON document per order: customer metadata enriched in
    (broadcast join) and line items nested as an array — the wide/nested
    'document' shape of the reference, built columnar."""
    # spread(): the local single-row-group parquet would otherwise run the
    # heavy collect_list partial agg and the to_json/sha2 projection on ONE
    # core; repartitioning by the join/group key costs one small shuffle and
    # parallelizes the whole doc build (no-op on pre-split cluster inputs).
    orders = spread(load(spark, sf_dir, "orders"), "o_orderkey")
    customer = load(spark, sf_dir, "customer")
    lineitem = spread(load(spark, sf_dir, "lineitem"), "l_orderkey")
    items = lineitem.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag"
                )
            )
        ).alias("items")
    )
    doc_struct = F.struct(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("total"),
        F.col("o_orderdate").cast("date").cast("string").alias("date"),
        F.struct(
            F.col("c_custkey").alias("id"),
            F.col("c_name").alias("name"),
            F.col("c_mktsegment").alias("segment"),
        ).alias("customer"),
        F.col("items"),
    )
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(items, orders.o_orderkey == items.l_orderkey, "left")
        .select(
            F.col("o_orderkey"),
            F.to_json(doc_struct).alias("doc"),
        )
        .withColumn("fact_id", F.sha2(F.col("doc"), 256))
    )


def write_ndjson(df: DataFrame, path: str) -> None:
    """NDJSON sink (one JSON document per line), the reference's on-disk
    output format. ``maxRecordsPerFile`` caps file sizes at lake scale."""
    df.write.mode("overwrite").option("maxRecordsPerFile", 1_000_000).json(path)


#: The oracle reconstructs Spark's to_json byte-for-byte in DuckDB string
#: concatenation (field order = struct order, no whitespace, shortest-repr
#: doubles — both engines print shortest round-trip form, and the data stays
#: under Jackson's 1e7 scientific-notation switch), then compares doc length
#: AND sha256 — a full-document equality proof, not just a row count.
_NDJSON_ORACLE = """
WITH items AS (
  SELECT l_orderkey,
         '[' || string_agg(
           '{"l_linenumber":' || l_linenumber ||
           ',"l_quantity":' || CAST(l_quantity AS VARCHAR) ||
           ',"l_extendedprice":' || CAST(l_extendedprice AS VARCHAR) ||
           ',"l_returnflag":"' || l_returnflag || '"}',
           ',' ORDER BY l_linenumber, l_quantity, l_extendedprice, l_returnflag
         ) || ']' AS items_json
  FROM lineitem GROUP BY l_orderkey
), docs AS (
  SELECT o.o_orderkey,
         '{"order_id":' || o.o_orderkey ||
         ',"status":"' || o.o_orderstatus ||
         '","total":' || CAST(o.o_totalprice AS VARCHAR) ||
         ',"date":"' || strftime(o.o_orderdate, '%Y-%m-%d') ||
         '","customer":{"id":' || c.c_custkey ||
         ',"name":"' || c.c_name ||
         '","segment":"' || c.c_mktsegment || '"}' ||
         COALESCE(',"items":' || i.items_json, '') || '}' AS doc
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  LEFT JOIN items i ON o.o_orderkey = i.l_orderkey
)
SELECT o_orderkey,
       CAST(LENGTH(doc) AS INTEGER) AS doc_len,
       sha256(doc) AS fact_id
FROM docs
"""


@register("q_sink_ndjson", oracle=_NDJSON_ORACLE)
def q_sink_ndjson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serialize nested order documents; declared result is (key, doc length,
    fact_id) where fact_id = sha256 of the serialized document — the oracle
    rebuilds the exact JSON in DuckDB, so this proves byte-identical docs;
    document structure is also golden-tested in tests/test_ops_edge.py."""
    docs = order_documents(spark, sf_dir)
    return docs.select("o_orderkey", F.length("doc").alias("doc_len"), "fact_id")


def bulk_sink(df: DataFrame, send_batch, batch_size: int = 500) -> int:
    """Batched external sink — the Spark-native form of the reference's
    Elasticsearch ``helpers.parallel_bulk`` loop (upstream indexing path):
    ``foreachPartition`` gives one connection per partition (per executor
    task), rows are buffered into bounded batches, and ``send_batch`` is the
    pluggable transport (ES bulk POST, HTTP, JDBC executemany…).

    At 100 TB this is the correct shape: no driver-side collect, connection
    count = partition count (tune with repartition), batch size bounds both
    sink-request size and executor memory. Exactly-once comes from
    deterministic document ids (fact_id) + idempotent upsert on the sink
    side, mirroring the reference. Returns the number of batches sent
    (driver-side count via accumulator).
    """
    spark = df.sparkSession
    acc = spark.sparkContext.accumulator(0)

    def _per_partition(rows):
        batch = []
        for row in rows:
            batch.append(row)
            if len(batch) >= batch_size:
                send_batch(batch)
                acc.add(1)
                batch = []
        if batch:
            send_batch(batch)
            acc.add(1)

    df.foreachPartition(_per_partition)
    return acc.value


# --- q_source_orc ------------------------------------------------------------

_ORC_PATH = "/tmp/genesapi_spark/orc_roundtrip"

_ORC_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_cents,
       CAST(MIN(l_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(l_orderkey) AS BIGINT) AS max_key
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("q_source_orc", oracle=_ORC_ORACLE)
def q_source_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip proof: lineitem's core columns are written to ORC
    (Spark's second first-class columnar format — zlib by default here,
    predicate pushdown and column pruning work the same as parquet) and
    read BACK, and the declared result aggregates the read-back copy. The
    oracle aggregates the original parquet — hash-matching proves the
    write→read cycle preserved every row and value exactly.

    Scale shape: the write is maxRecordsPerFile-capped like every lake
    sink here; the read-back aggregate is one map-side-combined pass. The
    exact-cents sum makes value fidelity (not just row count) part of the
    certificate."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_returnflag",
        "l_quantity",
        F.expr("CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    path = f"{_ORC_PATH}_{os.path.basename(sf_dir.rstrip('/'))}"
    li.write.mode("overwrite").option("maxRecordsPerFile", 1_000_000).orc(path)
    back = spark.read.orc(path)
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("sum_qty"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
            F.min("l_orderkey").cast("bigint").alias("min_key"),
            F.max("l_orderkey").cast("bigint").alias("max_key"),
        )
        .orderBy("l_returnflag")
    )


# --- q_sink_partitioned ------------------------------------------------------

_PART_PATH = "/tmp/genesapi_spark/partitioned_docs"

_PART_ORACLE = """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE lang = 'en'
GROUP BY source
ORDER BY source
"""


@register("q_sink_partitioned", oracle=_PART_ORACLE)
def q_sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned lake write + partition-pruned read-back: documents
    are written `partitionBy(lang)` (the layout that turns every
    lang-filtered scan into a directory prune), then read back with a
    `lang = 'en'` predicate and aggregated per source. The oracle computes
    the same slice from the original table, proving the partitioned cycle
    lost nothing and the partition column round-trips through directory
    encoding.

    Scale shape: at 100 TB partitioning by a low-cardinality column like
    lang is exactly right (5-50 directories, each internally splittable);
    the read-back plan shows PartitionFilters: [isnotnull(lang), (lang =
    en)] with only the en/ directory listed — the pruning this layout
    exists for (pytest pins the single-partition read)."""
    docs = load(spark, sf_dir, "documents")
    path = f"{_PART_PATH}_{os.path.basename(sf_dir.rstrip('/'))}"
    docs.write.mode("overwrite").partitionBy("lang").option(
        "maxRecordsPerFile", 1_000_000
    ).parquet(path)
    back = spark.read.parquet(path).filter(F.col("lang") == "en")
    return (
        back.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .orderBy("source")
    )


# --- q_schema_evolution ------------------------------------------------------

_EVOLVE_PATH = "/tmp/genesapi_spark/schema_evolution"

_EVOLVE_ORACLE = """
SELECT * FROM (VALUES
  (1, CAST(10 AS BIGINT), CAST(NULL AS VARCHAR)),
  (2, CAST(20 AS BIGINT), CAST(NULL AS VARCHAR)),
  (3, CAST(30 AS BIGINT), 'x'),
  (4, CAST(40 AS BIGINT), 'y')
) AS t(id, v, tag)
"""


@register("q_schema_evolution", oracle=_EVOLVE_ORACLE)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet schema-evolution certificate: generation 1 writes (id, v),
    generation 2 adds a `tag` column, and a `mergeSchema` read returns the
    UNION schema with NULLs backfilled for the old files — the append-only
    lake evolution path (no history rewrite, no migration job). The VALUES
    oracle pins the exact merged relation, proving both the schema union
    and the NULL semantics; the richer multi-generation proof lives in
    tests/test_layout.py.

    At 100 TB this is the only sane way to add a column: new files carry
    it, old files stay untouched, and readers that don't select `tag`
    never pay for the merge (schema pruning)."""
    import os

    base = f"{_EVOLVE_PATH}_{os.path.basename(sf_dir.rstrip('/'))}"
    spark.createDataFrame([(1, 10), (2, 20)], "id int, v bigint").write.mode(
        "overwrite"
    ).parquet(f"{base}/gen=1")
    spark.createDataFrame(
        [(3, 30, "x"), (4, 40, "y")], "id int, v bigint, tag string"
    ).write.mode("overwrite").parquet(f"{base}/gen=2")
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(f"{base}/gen=1", f"{base}/gen=2")
        .select("id", "v", "tag")
        .orderBy("id")
    )
