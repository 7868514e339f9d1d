"""Multimodal-column plumbing (BASELINE.json mandate: image/audio/video as
opaque binary columns with typed metadata).

The pattern at 100 TB: media lives in parquet as ``binary`` payload columns
next to a typed metadata struct (mime, byte length, dims, sample rate…).
Decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages: each Python batch sees a bounded slice of rows, the
payload bytes cross Py4J exactly once via Arrow, and everything upstream and
downstream of the UDF stays JVM-side (pruning, partitioning, joins). Real
codec libraries (PIL/ffmpeg/torchaudio) are NOT in this container, so the
codec call itself is stubbed (``decode_image`` raises NotImplementedError;
the query path uses a deterministic byte-level feature) — the Spark-side
plumbing (schema, Arrow batch shape, UDF signature, partition behavior) is
real and oracle-checked.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from genesapi_cli_spark.io import load
from genesapi_cli_spark.registry import oracle_dec_avg, register


def decode_image(payload: bytes) -> "object":
    """STUB — real image decode (PIL/libjpeg) is unavailable in this
    environment. The mapInPandas plumbing around it is real; swap this body
    for ``PIL.Image.open(io.BytesIO(payload))`` where codecs exist."""
    raise NotImplementedError("image codecs not available in this environment")


def _decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched 'decode': derives deterministic byte-level features from
    the binary payload (length + a cheap content feature). This is the exact
    batch shape a real decoder uses — bytes in, fixed feature columns out —
    with the codec call replaced by arithmetic on the payload length."""
    for pdf in batches:
        n_bytes = pdf["payload"].map(len).astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "lang": pdf["lang"],
                "mime": pdf["mime"],
                "n_bytes": n_bytes,
                "feat": (n_bytes % 97).astype("float64") / 97.0,
            }
        )


_DECODE_ORACLE = f"""
WITH assets AS (
  SELECT doc_id, lang, 'text/plain' AS mime,
         octet_length(encode(text)) AS n_bytes,
         CAST(octet_length(encode(text)) % 97 AS DOUBLE) / 97.0 AS feat
  FROM documents
)
SELECT lang, mime,
       COUNT(*) AS n_assets,
       SUM(n_bytes) AS total_bytes,
       MIN(n_bytes) AS min_bytes,
       MAX(n_bytes) AS max_bytes,
       {oracle_dec_avg('feat', 'avg_feat')}
FROM assets
GROUP BY lang, mime
"""


@register("q_multimodal_decode", oracle=_DECODE_ORACLE)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode pipeline: build (payload binary, metadata struct)
    assets from documents, run the Arrow-batched decode stage (mapInPandas),
    roll features up per (lang, mime).

    Plan shape: projection → mapInPandas (one Arrow exchange) → small
    groupBy. At 100 TB the payload column is pruned everywhere except the
    decode stage input, and partition count bounds decoder memory: each batch
    holds spark.sql.execution.arrow.maxRecordsPerBatch payloads.
    """
    docs = load(spark, sf_dir, "documents")
    assets = docs.select(
        "doc_id",
        "lang",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        # typed metadata struct rides NEXT TO the payload — queries that only
        # need metadata never touch the bytes (column pruning does the rest)
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.encode(F.col("text"), "UTF-8")).alias("n_bytes"),
        ).alias("meta"),
    )
    decoded = assets.select("doc_id", "lang", "mime", "payload").mapInPandas(
        _decode_features,
        schema="doc_id long, lang string, mime string, n_bytes long, feat double",
    )
    return decoded.groupBy("lang", "mime").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min("n_bytes").alias("min_bytes"),
        F.max("n_bytes").alias("max_bytes"),
        (F.sum(F.col("feat").cast("decimal(27,7)")).cast("double") / F.count(F.lit(1))).alias(
            "avg_feat"
        ),
    )
