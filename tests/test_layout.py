"""Z-order layout: multi-dimensional file skipping (sources/layout.py)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from genesapi_cli_spark.io import load
from genesapi_cli_spark.sources.layout import with_zvalue, zorder_write

from .conftest import SMOKE_SF_DIR


def _file_boxes(spark, path, cols):
    boxes = []
    for f in sorted(glob.glob(path + "/part-*.parquet")):
        df = spark.read.parquet(f)
        r = df.agg(
            *[F.min(c).alias(f"mn_{c}") for c in cols],
            *[F.max(c).alias(f"mx_{c}") for c in cols],
        ).collect()[0]
        boxes.append({c: (r[f"mn_{c}"], r[f"mx_{c}"]) for c in cols})
    return boxes


def _n_intersecting(boxes, preds):
    n = 0
    for b in boxes:
        if all(b[c][0] <= hi and b[c][1] >= lo for c, (lo, hi) in preds.items()):
            n += 1
    return n


def test_zvalue_is_monotone_per_dimension(spark):
    """Fixing one dimension, z must grow with the other (bit-interleave
    sanity): z(q, v1) < z(q, v2) when v1 < v2 at equal q."""
    df = spark.createDataFrame(
        [(a, b) for a in (0, 1000) for b in (0, 500, 1000)], "x long, y long"
    )
    z = with_zvalue(df, ["x", "y"]).collect()
    by_x = {}
    for r in z:
        by_x.setdefault(r.x, []).append((r.y, r["__z"]))
    for x, pairs in by_x.items():
        pairs.sort()
        zs = [p[1] for p in pairs]
        assert zs == sorted(zs)


def test_zorder_skips_files_on_both_dims(spark, tmp_path):
    """A 2-dim box predicate must prune files under z-order; a linear
    user_id sort cannot prune on the value dimension at all."""
    ev = load(spark, SMOKE_SF_DIR, "events").select("user_id", "value", "event_id")
    n_files = 16

    zpath = str(tmp_path / "zorder")
    zorder_write(ev, ["user_id", "value"], zpath, n_files=n_files)

    lpath = str(tmp_path / "linear")
    (
        ev.repartitionByRange(n_files, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    zboxes = _file_boxes(spark, zpath, ["user_id", "value"])
    lboxes = _file_boxes(spark, lpath, ["user_id", "value"])
    assert len(zboxes) >= 8 and len(lboxes) >= 8

    # value-only predicate: linear layout reads EVERY file; z-order must not.
    value_pred = {"value": (0.0, 10.0)}
    assert _n_intersecting(lboxes, value_pred) == len(lboxes)
    assert _n_intersecting(zboxes, value_pred) < len(zboxes)

    # 2-dim box: z-order must touch strictly fewer files than linear.
    box = {"user_id": (0, 200), "value": (0.0, 25.0)}
    assert _n_intersecting(zboxes, box) < _n_intersecting(lboxes, box)

    # identical content either way
    assert (
        spark.read.parquet(zpath).count()
        == spark.read.parquet(lpath).count()
        == ev.count()
    )


def test_zorder_roundtrip_content(spark, tmp_path):
    out = str(tmp_path / "z2")
    ev = load(spark, SMOKE_SF_DIR, "events").select("event_id", "user_id", "value")
    zorder_write(ev, ["user_id", "value"], out, n_files=8)
    back = spark.read.parquet(out)
    assert sorted(back.columns) == sorted(ev.columns)
    a = ev.agg(F.bit_xor(F.xxhash64("event_id", "user_id")).alias("h")).collect()[0].h
    b = back.agg(F.bit_xor(F.xxhash64("event_id", "user_id")).alias("h")).collect()[0].h
    assert a == b
