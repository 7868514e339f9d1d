"""Delimited-text (CSV) source with dirty-data semantics.

Reference analog: the reference ingests semicolon-delimited GENESIS "Quader"
text (``sources/cube.py`` handles that grammar); this module covers the
*generic* delimited-ingest surface a user of the reference also needs —
RFC-4180 quoting, embedded delimiters, doubled-quote escapes, NULL tokens,
and fault-tolerant typing of malformed fields.

Spark-first: parsing is the built-in ``from_csv`` expression (uniVocity
parser, JVM-side, codegen-adjacent — never a Python loop). On a real lake
the same options go to ``spark.read.csv`` and each file split parses in
parallel; ``from_csv`` is the streaming/column form of the identical parser,
so the semantics proven here carry to the file source unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from genesapi_cli_spark.io import load
from genesapi_cli_spark.registry import register

#: Embedded fixture lines — each exercises one CSV hazard.
CSV_LINES = (
    "1,widget,3,19.99",                # plain row
    '2,"gadget, deluxe",5,120.50',     # quoted field with embedded delimiter
    '3,"quoted ""name""",2,7.25',      # RFC-4180 doubled-quote escape
    "4,NA,NA,0.99",                    # explicit NULL token
    "5,empty,,",                       # trailing empty fields -> NULL
    "6,bad-int,xx,5.00",               # malformed int -> NULL (PERMISSIVE)
)

CSV_SCHEMA = "id INT, name STRING, qty INT, price DOUBLE"

CSV_OPTIONS = {"nullValue": "NA", "mode": "PERMISSIVE", "escape": '"'}


def parse_csv_lines(spark: SparkSession, lines=CSV_LINES) -> DataFrame:
    """Parse raw CSV lines into typed rows with the module's dialect."""
    df = spark.createDataFrame([(ln,) for ln in lines], "line string")
    return df.select(
        F.from_csv("line", CSV_SCHEMA, CSV_OPTIONS).alias("r")
    ).select("r.*")


_CSV_ORACLE = """
SELECT * FROM (VALUES
  (1, 'widget',         3,    19.99),
  (2, 'gadget, deluxe', 5,    120.50),
  (3, 'quoted "name"',  2,    7.25),
  (4, CAST(NULL AS VARCHAR), CAST(NULL AS INT), 0.99),
  (5, 'empty', CAST(NULL AS INT), CAST(NULL AS DOUBLE)),
  (6, 'bad-int', CAST(NULL AS INT), 5.00)
) AS t(id, name, qty, price)
"""


@register("q_source_csv", oracle=_CSV_ORACLE)
def q_source_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV ingest semantics, oracle-proved: the embedded fixture covers
    quoted delimiters, doubled-quote escapes, a NULL token, empty trailing
    fields, and a malformed integer under PERMISSIVE mode (field→NULL, row
    kept). The oracle is the hand-written expected relation — hash-matching
    it proves the parser dialect end to end, the same way the cube-text
    parser is fixture-proved."""
    return parse_csv_lines(spark)


# --- q_source_jsonl ---------------------------------------------------------

JSONL_LINES = (
    '{"id": 1, "name": "alpha", "tags": [1, 2], "meta": {"lang": "en", "score": 0.5}}',
    '{"id": 2, "name": "beta", "tags": [], "meta": {"lang": "de", "score": 1.25}}',
    '{"id": 3, "name": null, "tags": [7], "meta": {"lang": null, "score": null}}',
    '{"id": 4, "name": "delta"}',
    '{"id": 5, "name": "epsilon", "tags": [3, 3, 9], "meta": {"lang": "en", "score": -2.0}}',
)

JSONL_SCHEMA = (
    "id INT, name STRING, tags ARRAY<INT>, "
    "meta STRUCT<lang: STRING, score: DOUBLE>"
)


def parse_jsonl_lines(spark: SparkSession, lines=JSONL_LINES) -> DataFrame:
    """Parse JSONL lines into typed NESTED rows, then flatten: missing
    fields → NULL, arrays keep order and multiplicity, struct fields
    project as columns (the Dremel nested-columnar shape, PAPERS.md)."""
    df = spark.createDataFrame([(ln,) for ln in lines], "line string")
    r = df.select(F.from_json("line", JSONL_SCHEMA).alias("r")).select("r.*")
    return r.select(
        "id",
        "name",
        F.size("tags").alias("n_tags"),
        F.coalesce(
            F.aggregate("tags", F.lit(0), lambda acc, x: acc + x), F.lit(0)
        ).alias("tag_sum"),
        F.col("meta.lang").alias("lang"),
        F.col("meta.score").alias("score"),
    )


_JSONL_ORACLE = """
SELECT * FROM (VALUES
  (1, 'alpha',   2,  3, 'en', 0.5),
  (2, 'beta',    0,  0, 'de', 1.25),
  (3, CAST(NULL AS VARCHAR), 1, 7, CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE)),
  (4, 'delta', CAST(NULL AS INT), 0, CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE)),
  (5, 'epsilon', 3, 15, 'en', -2.0)
) AS t(id, name, n_tags, tag_sum, lang, score)
"""


@register("q_source_jsonl", oracle=_JSONL_ORACLE)
def q_source_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL (newline-delimited JSON) ingest semantics, oracle-proved:
    nested struct and array fields against an explicit schema, missing
    object → NULL struct (size() of a NULL array is NULL under ANSI mode —
    asserted as-is), null leaves, and an
    in-row array fold. The hand-written expected relation pins every rule;
    on a lake the same schema goes to spark.read.json and parses per split."""
    return parse_jsonl_lines(spark)


# --- q_source_fixed_width ---------------------------------------------------

#: columns: id[1:4] code[5:10] amount[11:18] (2 implied decimals) sep[19] date[20:27]
FIXED_LINES = (
    "0001STAT0100012345_20240115",
    "0002STAT0200000000_20240116",
    "0003GEOX01-0003210_20240117",
    "0004STAT01        _20240118",
)


def parse_fixed_width(spark: SparkSession, lines=FIXED_LINES) -> DataFrame:
    """Fixed-width record parse: pure substring/trim/try_cast projection —
    the GENESIS-era mainframe export shape, handled entirely in codegen
    (no regex, no Python)."""
    df = spark.createDataFrame([(ln,) for ln in lines], "line string")
    return df.select(
        F.substring("line", 1, 4).cast("int").alias("rec_id"),
        F.trim(F.substring("line", 5, 6)).alias("code"),
        F.expr(
            "try_cast(trim(substring(line, 11, 8)) AS BIGINT)"
        ).alias("amount_cents"),
        F.to_date(F.substring("line", 20, 8), "yyyyMMdd").alias("rec_date"),
    )


_FIXED_ORACLE = """
SELECT * FROM (VALUES
  (1, 'STAT01',  CAST(12345 AS BIGINT), DATE '2024-01-15'),
  (2, 'STAT02',  CAST(0 AS BIGINT),     DATE '2024-01-16'),
  (3, 'GEOX01',  CAST(-3210 AS BIGINT), DATE '2024-01-17'),
  (4, 'STAT01',  CAST(NULL AS BIGINT),  DATE '2024-01-18')
) AS t(rec_id, code, amount_cents, rec_date)
"""


@register("q_source_fixed_width", oracle=_FIXED_ORACLE)
def q_source_fixed_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width (positional) record ingest, oracle-proved: substring
    slicing, zero-padded and sign-prefixed numerics, blank→NULL via
    try_cast, and yyyyMMdd date parsing — all codegen projections. The
    statistical-office export lineage of the reference makes this dialect
    first-class next to CSV/JSONL."""
    return parse_fixed_width(spark)


# --- q_source_xml -----------------------------------------------------------

#: GENESIS-style XML fact records (Destatis also publishes table exports as
#: XML): attributes + child elements, a missing element, a nested block, and
#: a malformed number — the same edge coverage as the CSV/JSONL fixtures.
XML_RECORDS = (
    '<fact code="12411" year="2014"><region>01001</region>'
    "<value>43520</value><quality>e</quality></fact>",
    '<fact code="12411" year="2014"><region>01002</region>'
    "<quality>x</quality></fact>",
    '<fact code="12411" year="2015"><region>01001</region>'
    "<value>44100.5</value><quality>e</quality>"
    "<meta><source>census</source></meta></fact>",
    '<fact code="12411" year="bad"><region>01003</region>'
    "<value>not-a-number</value><quality>g</quality></fact>",
)

XML_SCHEMA = (
    "_code STRING, _year INT, region STRING, value DOUBLE, quality STRING, "
    "meta STRUCT<source: STRING>"
)


def parse_xml_records(spark: SparkSession, records=XML_RECORDS) -> DataFrame:
    """Parse XML fact records with Spark 4's native from_xml: attributes map
    via the ``_`` prefix convention, missing elements → NULL, malformed
    numerics → NULL (PERMISSIVE), nested blocks project as struct fields.
    At lake scale the same schema feeds ``spark.read.format("xml")`` with a
    rowTag and parses per split — this fixture pins the value semantics."""
    df = spark.createDataFrame([(r,) for r in records], "x string")
    r = df.select(F.from_xml("x", XML_SCHEMA).alias("r")).select("r.*")
    return r.select(
        F.col("_code").alias("code"),
        F.col("_year").alias("year"),
        "region",
        "value",
        "quality",
        F.col("meta.source").alias("meta_source"),
    )


_XML_ORACLE = """
SELECT * FROM (VALUES
  ('12411', 2014, '01001', CAST(43520 AS DOUBLE), 'e', CAST(NULL AS VARCHAR)),
  ('12411', 2014, '01002', CAST(NULL AS DOUBLE), 'x', CAST(NULL AS VARCHAR)),
  ('12411', 2015, '01001', CAST(44100.5 AS DOUBLE), 'e', 'census'),
  (CAST(NULL AS VARCHAR), CAST(NULL AS INT), CAST(NULL AS VARCHAR),
   CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR))
) AS t(code, year, region, value, quality, meta_source)
"""


@register("q_source_xml", oracle=_XML_ORACLE)
def q_source_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingest semantics, oracle-proved against the hand-written expected
    relation: attribute extraction, missing element → NULL, nested struct
    projection — the XML twin of q_source_csv / q_source_jsonl. Pinned
    dialect difference vs CSV: from_xml under PERMISSIVE nulls the WHOLE
    record when a typed attribute is malformed (year="bad" → all-NULL row),
    where from_csv nulls only the offending field — the fixture asserts
    that asymmetry so it can never silently change under a Spark upgrade."""
    return parse_xml_records(spark)


# --- q_source_calendar -------------------------------------------------------

_CAL_ORACLE = """
WITH days AS (
  SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-12-31',
                                     INTERVAL 1 DAY)) AS DATE) AS d
)
SELECT d,
       CAST(year(d) AS INT) AS y,
       CAST(month(d) AS INT) AS m,
       CAST(quarter(d) AS INT) AS q,
       CAST(dayofyear(d) AS INT) AS doy,
       CAST((date_diff('day', DATE '1970-01-01', d) + 3) % 7 + 1 AS INT)
         AS iso_dow,
       CAST(CASE WHEN (date_diff('day', DATE '1970-01-01', d) + 3) % 7 + 1 >= 6
                 THEN 1 ELSE 0 END AS INT) AS is_weekend,
       CAST(day(last_day(d)) AS INT) AS month_len
FROM days
ORDER BY d
"""


@register("q_source_calendar", oracle=_CAL_ORACLE)
def q_source_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-dimension generator: one year of dates with the attributes
    every warehouse date dim carries (year/month/quarter/day-of-year,
    ISO weekday, weekend flag, month length) — generated declaratively
    from a date sequence, no source file at all, and doubling as a DATE
    FUNCTION PARITY certificate: the weekday deliberately avoids the
    engines' dayofweek() (Spark counts Sunday=1, DuckDB Sunday=0 — a
    silent off-by-one) in favor of portable epoch-day arithmetic
    ((days_since_1970 + 3) % 7 + 1 = ISO 1..7); year/month/quarter/
    dayofyear/last_day are probed-identical and used directly.

    Scale shape: a generated dimension is driver-free and tiny forever;
    at 100 TB you materialize it once and broadcast it into every
    time-rollup join (q_window_gap_fill already builds its densify spine
    the same way)."""
    days = spark.sql(
        "SELECT explode(sequence(DATE '2024-01-01', DATE '2024-12-31',"
        " INTERVAL 1 DAY)) AS d"
    )
    epoch_days = F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
    iso_dow = ((epoch_days + 3) % 7 + 1).cast("int")
    return days.select(
        "d",
        F.year("d").cast("int").alias("y"),
        F.month("d").cast("int").alias("m"),
        F.quarter("d").cast("int").alias("q"),
        F.dayofyear("d").cast("int").alias("doy"),
        iso_dow.alias("iso_dow"),
        F.when(iso_dow >= 6, 1).otherwise(0).cast("int").alias("is_weekend"),
        F.dayofmonth(F.last_day(F.col("d"))).cast("int").alias("month_len"),
    ).orderBy("d")


# --- q_source_format_sniff ------------------------------------------------------

_SNIFF_ORACLE = """
WITH sniffed AS (
  SELECT CASE
           WHEN ltrim(text) LIKE '{%' OR ltrim(text) LIKE '[%' THEN 'json'
           WHEN ltrim(text) LIKE '<%' THEN 'xml'
           WHEN LENGTH(text) - LENGTH(replace(text, ',', '')) >= 2 THEN 'csv'
           ELSE 'plain'
         END AS fmt,
         n_chars
  FROM documents
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM sniffed
)
SELECT fmt,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(FLOOR(CAST(COUNT(*) AS DOUBLE) / MAX(nn) * 1000000 + 0.5)
            AS BIGINT) AS share_micro
FROM sniffed CROSS JOIN tot
GROUP BY fmt
"""


@register("q_source_format_sniff", oracle=_SNIFF_ORACLE)
def q_source_format_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-based format sniffing over an untyped text-blob column — the
    ingest-router stage every mixed-source lake runs before parsing:
    leading '{'/'[' → JSON, leading '<' → XML/HTML, ≥2 commas → CSV-ish,
    else plain text; the per-format census (count, bytes, share) decides
    which parser fleet each slice is routed to. Precedence is the
    documented JSON > XML > CSV > plain ladder, applied identically in
    both engines (a real router also tries strict parses on a sample —
    the dialect-proof queries q_source_csv/jsonl/xml are exactly those
    parsers downstream of this router).

    Parity: pure deterministic string predicates (ltrim prefix, comma
    count via length difference) and exact bigint rollups; the share is
    one micro-snapped division by the broadcast total.

    Scale shape: one pushed-down scan, per-row predicates inside
    whole-stage codegen, one map-side-combined aggregate; the 1-row total
    broadcasts. The text column dies at the projection — only (fmt,
    n_chars) reaches the Exchange."""
    docs = load(spark, sf_dir, "documents")
    lt = F.ltrim(F.col("text"))
    sniffed = docs.select(
        F.when(lt.startswith("{") | lt.startswith("["), "json")
        .when(lt.startswith("<"), "xml")
        .when(
            F.length("text") - F.length(F.regexp_replace("text", ",", "")) >= 2,
            "csv",
        )
        .otherwise("plain")
        .alias("fmt"),
        "n_chars",
    )
    tot = sniffed.agg(F.count(F.lit(1)).cast("bigint").alias("nn"))
    return (
        sniffed.crossJoin(F.broadcast(tot))
        .groupBy("fmt")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.floor(
                F.count(F.lit(1)).cast("double") / F.max("nn") * 1000000
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("share_micro"),
        )
    )
