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


# --- q_multimodal_framesample -----------------------------------------------

FRAME_BYTES = 32
FRAME_STRIDE = 4  # sample every 4th frame


def sample_video_frames(payload: bytes) -> "object":
    """STUB — real frame extraction (ffmpeg/pyav) is unavailable in this
    environment. The mapInPandas plumbing around it is real; swap this body
    for an av.open(...) keyframe iterator where codecs exist."""
    raise NotImplementedError("video codecs not available in this environment")


def _frame_sample(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
    """Row-EXPLODING Arrow stage: one input row (payload) → many output rows
    (sampled frames). This is the defining batch shape of frame sampling —
    output cardinality is data-dependent, so it must be mapInPandas (UDTF-
    like), not a scalar pandas_udf. The 'frame' is a fixed-width byte slice;
    features are slice length + first-byte code (pure byte arithmetic
    standing in for the codec call, oracle-checkable)."""
    for pdf in batches:
        out_doc, out_lang, out_idx, out_len, out_code = [], [], [], [], []
        for doc_id, lang, payload in zip(pdf["doc_id"], pdf["lang"], pdf["payload"]):
            n_frames = (len(payload) + FRAME_BYTES - 1) // FRAME_BYTES
            for i in range(0, n_frames, FRAME_STRIDE):
                chunk = payload[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                out_doc.append(doc_id)
                out_lang.append(lang)
                out_idx.append(i)
                out_len.append(len(chunk))
                out_code.append(chunk[0])
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out_doc, dtype="int64"),
                "lang": pd.Series(out_lang, dtype="object"),
                "frame_idx": pd.Series(out_idx, dtype="int64"),
                "frame_len": pd.Series(out_len, dtype="int64"),
                "first_code": pd.Series(out_code, dtype="int64"),
            }
        )


_FRAMESAMPLE_ORACLE = f"""
WITH base AS (
  SELECT doc_id, lang, text,
         CAST(ceil(octet_length(encode(text)) / {FRAME_BYTES}.0) AS INT) AS nf
  FROM documents
), frames AS (
  SELECT doc_id, lang, i AS frame_idx,
         octet_length(encode(substr(text, i * {FRAME_BYTES} + 1, {FRAME_BYTES})))
           AS frame_len,
         ascii(substr(text, i * {FRAME_BYTES} + 1, 1)) AS first_code
  FROM base, LATERAL (SELECT unnest(generate_series(0, nf - 1)) AS i) _
  WHERE i % {FRAME_STRIDE} = 0
)
SELECT lang,
       COUNT(*) AS n_frames,
       COUNT(DISTINCT doc_id) AS n_docs,
       CAST(SUM(frame_len) AS BIGINT) AS sum_frame_bytes,
       CAST(SUM(first_code) AS BIGINT) AS sum_first_codes
FROM frames
GROUP BY lang
"""


@register("q_multimodal_framesample", oracle=_FRAMESAMPLE_ORACLE)
def q_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-frame sampling plumbing: binary payloads chunk into fixed-width
    'frames'; every FRAME_STRIDE-th frame is extracted with byte-level
    features, then rolled up per language. Complements q_multimodal_decode
    (1 row in → 1 row out) with the OTHER multimodal batch shape: 1 row in →
    N rows out, where N is data-dependent.

    The oracle reproduces the byte arithmetic with substr/ascii on the same
    (all-ASCII) text, so even the stubbed codec path is value-checked, not
    just row-counted. At 100 TB: payload column pruned except at this stage;
    Arrow batch size bounds peak frame memory; downstream rollup is a
    map-side-combined hash agg on the exploded (small) feature rows.
    """
    docs = load(spark, sf_dir, "documents")
    assets = docs.select(
        "doc_id", "lang", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    frames = assets.mapInPandas(
        _frame_sample,
        schema="doc_id long, lang string, frame_idx long, frame_len long, first_code long",
    )
    return frames.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("frame_len").cast("long").alias("sum_frame_bytes"),
        F.sum("first_code").cast("long").alias("sum_first_codes"),
    )
