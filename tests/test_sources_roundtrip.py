"""Source-format coverage beyond parquet: CSV and JSON/NDJSON read paths
with explicit schemas round-trip the same rows (SURVEY.md §2.1 — the
reference's storage is text-based, so text sources are first-class here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from genesapi_cli_spark.io import load

from .conftest import SMOKE_SF_DIR


def _key_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_csv_roundtrip_with_schema(spark, tmp_path):
    """orders → CSV (header) → read back with explicit schema: identical
    rows, no inference drift. Explicit schemas are mandatory at scale —
    inference reads the data twice and can flip types between runs."""
    orders = load(spark, SMOKE_SF_DIR, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = str(tmp_path / "orders_csv")
    orders.write.mode("overwrite").option("header", True).csv(path)
    back = (
        spark.read.schema("o_orderkey long, o_orderstatus string, o_totalprice double")
        .option("header", True)
        .csv(path)
    )
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    assert _key_rows(back, cols) == _key_rows(orders, cols)


def test_ndjson_roundtrip_nested(spark, tmp_path):
    """Nested struct + array survives an NDJSON round-trip with an explicit
    schema — the document shape of the reference's serialize output."""
    docs = (
        load(spark, SMOKE_SF_DIR, "orders")
        .limit(100)
        .select(
            "o_orderkey",
            F.struct(
                F.col("o_orderstatus").alias("status"),
                F.col("o_totalprice").alias("total"),
            ).alias("meta"),
            F.array(F.col("o_orderkey"), F.col("o_orderkey") + 1).alias("refs"),
        )
    )
    path = str(tmp_path / "docs_ndjson")
    docs.write.mode("overwrite").json(path)
    back = spark.read.schema(
        "o_orderkey long, meta struct<status:string,total:double>, refs array<bigint>"
    ).json(path)
    got = sorted((r.o_orderkey, r.meta.status, r.meta.total, tuple(r.refs)) for r in back.collect())
    exp = sorted((r.o_orderkey, r.meta.status, r.meta.total, tuple(r.refs)) for r in docs.collect())
    assert got == exp


def test_csv_malformed_rows_quarantined(spark, tmp_path):
    """PERMISSIVE mode + columnNameOfCorruptRecord: bad rows land in the
    corrupt-record column instead of failing the load — the value-cleaning
    posture of the reference's parser (bad tokens never kill the batch)."""
    p = tmp_path / "m.csv"
    p.write_text("k,v\n1,10\nbad_row_only_one_col\n2,20\n")
    df = (
        spark.read.schema("k int, v int, _corrupt string")
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(str(p))
    )
    rows = df.collect()
    good = {(r.k, r.v) for r in rows if r._corrupt is None}
    bad = [r._corrupt for r in rows if r._corrupt is not None]
    assert good == {(1, 10), (2, 20)}
    assert bad == ["bad_row_only_one_col"]


def test_orc_roundtrip(spark, tmp_path):
    """ORC source/sink parity: write nation to ORC, read back, all rows and
    schema survive (the lake-format escape hatch when parquet isn't the
    interchange)."""
    nation = load(spark, SMOKE_SF_DIR, "nation")
    path = str(tmp_path / "nation_orc")
    nation.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == nation.schema
    assert _key_rows(back, ["n_nationkey", "n_name", "n_regionkey"]) == _key_rows(
        nation, ["n_nationkey", "n_name", "n_regionkey"]
    )


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-style partitioned layout (the 100 TB lake pattern): writing
    orders partitioned by year and filtering on the partition column must
    prune at planning time — the scan's PartitionFilters carries the
    predicate and only one year's files are read."""
    import os

    from genesapi_cli_spark.plans.inspect import formatted_plan

    orders = load(spark, SMOKE_SF_DIR, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    orders.write.mode("overwrite").partitionBy("o_year").parquet(path)
    years = sorted(d for d in os.listdir(path) if d.startswith("o_year="))
    assert len(years) > 1  # layout actually split
    df = spark.read.parquet(path).filter(F.col("o_year") == 1995)
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan and "o_year" in plan
    expected = load(spark, SMOKE_SF_DIR, "orders").filter(
        F.year("o_orderdate") == 1995
    )
    assert df.count() == expected.count()


def test_range_partitioned_write_enables_data_skipping(spark, tmp_path):
    """Range-partition + sortWithinPartitions before write → per-file key
    ranges must NOT overlap. This is the data-skipping layout: with disjoint
    min/max per file, a point/range predicate prunes every other file at
    scan time (parquet row-group stats), the difference between reading one
    file and all of 100 TB."""
    out = str(tmp_path / "range_parted")
    li = load(spark, SMOKE_SF_DIR, "lineitem")
    (
        li.repartitionByRange(4, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(out)
    )
    import glob

    ranges = []
    for f in glob.glob(out + "/part-*.parquet"):
        st = spark.read.parquet(f).agg(
            F.min("l_orderkey").alias("lo"), F.max("l_orderkey").alias("hi")
        ).collect()[0]
        if st.lo is not None:
            ranges.append((st.lo, st.hi))
    ranges.sort()
    assert len(ranges) >= 2
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"file ranges overlap: ({lo1},{hi1}) vs ({lo2},{hi2})"


def test_small_file_compaction(spark, tmp_path):
    """Compaction: many tiny files → few sized files with identical content.
    The small-files problem is the classic long-running-pipeline failure
    (NameNode pressure, per-file open cost dominating); the fix is a
    periodic rewrite with a row budget per file."""
    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    li = load(spark, SMOKE_SF_DIR, "lineitem")
    li.repartition(32).write.mode("overwrite").parquet(src)
    import glob

    n_small = len(glob.glob(src + "/part-*.parquet"))
    assert n_small >= 16

    frag = spark.read.parquet(src)
    n_rows = frag.count()
    target_files = max(1, n_rows // 5000)
    frag.repartition(target_files).write.mode("overwrite").parquet(dst)
    n_compact = len(glob.glob(dst + "/part-*.parquet"))
    assert n_compact <= target_files
    # content-identical (order-insensitive): same count + same checksum
    a = frag.agg(F.bit_xor(F.xxhash64(*frag.columns)).alias("h")).collect()[0].h
    b_df = spark.read.parquet(dst)
    b = b_df.agg(F.bit_xor(F.xxhash64(*b_df.columns)).alias("h")).collect()[0].h
    assert spark.read.parquet(dst).count() == n_rows
    assert a == b


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution: a long-lived lake accretes columns; old files must
    stay readable (missing column → NULL) and new files must surface the
    added column via mergeSchema — without rewriting 100 TB of history."""
    base = str(tmp_path / "evolving")
    v1 = load(spark, SMOKE_SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    v1.write.mode("overwrite").parquet(base + "/batch=1")
    v2 = load(spark, SMOKE_SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice", F.lit("eu-west").alias("region_tag")
    )
    v2.write.mode("overwrite").parquet(base + "/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert "region_tag" in merged.columns and "batch" in merged.columns
    assert merged.count() == v1.count() * 2
    # old rows carry NULL for the new column; new rows carry the value
    nulls = merged.filter(F.col("region_tag").isNull()).count()
    assert nulls == v1.count()


def test_binaryfile_source_ingests_raw_assets(spark, tmp_path):
    """binaryFile source: raw asset files (images/audio stand-ins) ingest as
    (path, modificationTime, length, content binary) rows — the entry point
    of a multimodal pipeline BEFORE any decode stage. Glob filtering prunes
    at listing time, so a 100 TB asset lake never lists non-matching files."""
    assets = tmp_path / "assets"
    assets.mkdir()
    payloads = {}
    for i in range(6):
        name = f"img_{i}.fakejpg" if i % 2 == 0 else f"clip_{i}.fakewav"
        data = bytes([i] * (10 + i))
        (assets / name).write_bytes(data)
        payloads[name] = data

    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.fakejpg")
        .load(str(assets))
    )
    rows = df.select("path", "length", "content").collect()
    assert len(rows) == 3  # glob pruned the .fakewav files
    for r in rows:
        name = r.path.rsplit("/", 1)[-1]
        assert bytes(r.content) == payloads[name]
        assert r.length == len(payloads[name])
