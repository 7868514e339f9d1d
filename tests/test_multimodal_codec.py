"""Codec-branch tests for the multimodal decode stage: the SAME mapInPandas
stage must run with either body (real PIL decode / byte-level fallback) and
produce an identical schema, so swapping codecs in changes zero plan shape."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from genesapi_cli_spark.operators.multimodal import (
    HAVE_IMAGE_CODEC,
    _codec_or_byte_features,
    _decode_features,
)

_SCHEMA = "doc_id long, lang string, mime string, n_bytes long, feat double"


def _asset_df(spark, payloads):
    return spark.createDataFrame(
        [(i, "en", "application/octet-stream", p) for i, p in enumerate(payloads)],
        "doc_id long, lang string, mime string, payload binary",
    )


def test_codec_stage_schema_matches_stub_stage(spark):
    """Both stage bodies yield the same schema on arbitrary (undecodable)
    payloads — the codec branch falls back per-row instead of dying."""
    df = _asset_df(spark, [b"abc", b"", b"\x00" * 100])
    stub = df.mapInPandas(_decode_features, schema=_SCHEMA)
    codec = df.mapInPandas(_codec_or_byte_features, schema=_SCHEMA)
    assert stub.schema == codec.schema
    srows = {r.doc_id: r for r in stub.collect()}
    crows = {r.doc_id: r for r in codec.collect()}
    assert set(srows) == set(crows) == {0, 1, 2}
    for k in srows:
        assert srows[k].n_bytes == crows[k].n_bytes
        # byte fallback features agree whenever the codec can't decode
        assert srows[k].feat == pytest.approx(crows[k].feat)


@pytest.mark.skipif(not HAVE_IMAGE_CODEC, reason="PIL not installed")
def test_codec_stage_real_decode_branch(spark):
    """With PIL present, a real PNG decodes and feat = pixel count."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (12, 7)).save(buf, format="PNG")
    df = _asset_df(spark, [buf.getvalue()])
    (row,) = df.mapInPandas(_codec_or_byte_features, schema=_SCHEMA).collect()
    assert row.feat == 12 * 7
    assert row.n_bytes == len(buf.getvalue())
