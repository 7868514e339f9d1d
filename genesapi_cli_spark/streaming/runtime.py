"""Structured Streaming runtime binding (SURVEY.md §2.9 runtime row).

Mounts the SAME transforms from :mod:`streaming.windows` on a file-based
``readStream`` source: NDJSON event files → event-time windows with a
watermark → memory/foreachBatch/file sinks. This is the continuous form of
the reference's sync loop (``genesapi/cli.py`` sync subcommand, upstream):
instead of re-running a nightly batch, new files are discovered per
micro-batch and the same declarative aggregations advance incrementally with
checkpointed exactly-once state.

Scale notes: state store size is bounded by the watermark (late rows beyond
it are dropped and their state evicted); output modes: ``update`` for
dashboards, ``append`` + file sink with checkpoint for exactly-once lake
writes. On a cluster the file source scales by listing parallelism and the
aggregation state is range-partitioned by group key — identical plan shape to
the batch mount.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: NDJSON wire schema for streamed events (ts as epoch micros — integer time).
EVENT_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


#: NDJSON wire schema for streamed documents (the corpus-ingest path).
DOC_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def documents_file_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source document stream with the documents table's column
    contract — the corpus-ingest front for streaming curation operators
    (pack-on-ingest, dedup-on-ingest). One NDJSON file per micro-batch by
    default so tests can assert per-batch behavior."""
    return (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(source_dir)
    )


def events_file_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source event stream with the same column contract as io.load
    ('events'): ts (timestamp), ts_us (long). One NDJSON file per micro-batch
    by default so tests can assert per-batch behavior."""
    raw = (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(source_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.col("ts_us")))


def with_watermark(ev: DataFrame, delay: str = "1 hour") -> DataFrame:
    """Event-time watermark: rows later than max(ts) - delay are dropped and
    window state older than that is evicted."""
    return ev.withWatermark("ts", delay)


def run_to_memory(
    result: DataFrame,
    name: str,
    output_mode: str = "update",
    timeout_s: int = 120,
):
    """Run a streaming aggregation to a memory sink until all available input
    is processed (test harness path). Returns the query handle; read results
    via ``spark.sql(f"SELECT * FROM {name}")``."""
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q


def write_ndjson_stream(result: DataFrame, out_dir: str, checkpoint_dir: str):
    """Exactly-once NDJSON sink: append mode + checkpoint — the streaming form
    of the reference's NDJSON document sink (serialize.py upstream)."""
    return (
        result.writeStream.format("json")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
