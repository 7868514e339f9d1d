"""Scalar function surface (SURVEY.md §2.8): string / date / math / array /
JSON / conditional families.

Reference analog: region-code and label munging plus GENESIS time parsing in
``genesapi/util.py (upstream)``, value typing (GANZ/FEST/PROZ) in the cube
parser, and the ``props`` JSON handling of the serialized documents.

All expressions are built-in ``pyspark.sql.functions`` — JVM-side, inside
whole-stage codegen; nothing here crosses into Python. Parity traps handled:
engine round() is never used (floor-form r4 instead); transcendentals (ln,
log10, pow) are r4-wrapped because libm implementations may differ in the last
ulp; date outputs are cast to DATE on both sides; dayofweek is avoided
(numbering differs across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from genesapi_cli_spark.io import load, spread
from genesapi_cli_spark.registry import oracle_r4, r4, register

# --- q_fn_string ------------------------------------------------------------

_STRING_ORACLE = """
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       LOWER(p_brand) AS brand_lower,
       SUBSTRING(p_name, 1, 5) AS name_head,
       TRIM(CONCAT(' ', p_name, ' ')) AS name_trim,
       CONCAT_WS('|', p_brand, p_type) AS brand_type,
       LENGTH(p_name) AS name_len,
       REPLACE(p_name, ' ', '_') AS name_snake,
       regexp_extract(p_name, '^(\\w+)', 1) AS first_word
FROM part
"""


@register("q_fn_string", oracle=_STRING_ORACLE)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family (label munging in genesapi/util.py upstream). substring
    is 1-based in both engines; regexp_extract returns '' on no-match in both."""
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
    )


# --- q_fn_date --------------------------------------------------------------

_DATE_ORACLE = """
SELECT o_orderkey,
       EXTRACT(year FROM o_orderdate) AS o_year,
       EXTRACT(quarter FROM o_orderdate) AS o_quarter,
       EXTRACT(month FROM o_orderdate) AS o_month,
       EXTRACT(day FROM o_orderdate) AS o_day,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       CAST(o_orderdate AS DATE) + 30 AS plus_30d,
       date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch0,
       last_day(CAST(o_orderdate AS DATE)) AS month_end
FROM orders
WHERE o_orderkey <= 5000
"""


@register("q_fn_date", oracle=_DATE_ORACLE)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime family (GENESIS JAHR/STAG time parsing in util.py upstream).
    All date-valued outputs cast to DATE on both sides; dayofweek avoided."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 5000)
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).alias("o_year"),
        F.quarter(d).alias("o_quarter"),
        F.month(d).alias("o_month"),
        F.dayofmonth(d).alias("o_day"),
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.date_add(d.cast("date"), 30).alias("plus_30d"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch0"
        ),
        F.last_day(d.cast("date")).alias("month_end"),
    )


# --- q_fn_math --------------------------------------------------------------

_MATH_ORACLE = f"""
SELECT l_orderkey, l_linenumber,
       ABS(l_extendedprice - 30000) AS abs_dev,
       CAST(CEIL(l_extendedprice / 1000) AS BIGINT) AS price_ceil_k,
       CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_floor_k,
       {oracle_r4('SQRT(l_extendedprice)', 'price_sqrt')},
       {oracle_r4('LN(l_extendedprice + 1)', 'price_ln')},
       {oracle_r4('LOG10(l_extendedprice + 1)', 'price_log10')},
       {oracle_r4('POW(1 + l_discount, 2)', 'disc_pow2')},
       MOD(CAST(l_quantity AS BIGINT), 7) AS qty_mod7,
       CAST(SIGN(l_extendedprice - 30000) AS INT) AS dev_sign
FROM lineitem
WHERE l_orderkey <= 2000
"""


@register("q_fn_math", oracle=_MATH_ORACLE)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family (value typing GANZ/FEST/PROZ in the cube parser upstream).
    sqrt is IEEE-correctly-rounded (bit-exact across engines); ln/log10/pow go
    through libm and may differ in the last ulp → r4-wrapped."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    p = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(p - 30000).alias("abs_dev"),
        F.ceil(p / 1000).cast("bigint").alias("price_ceil_k"),
        F.floor(p / 1000).cast("bigint").alias("price_floor_k"),
        r4(F.sqrt(p), "price_sqrt"),
        r4(F.log(p + 1), "price_ln"),
        r4(F.log10(p + 1), "price_log10"),
        r4(F.pow(1 + F.col("l_discount"), 2), "disc_pow2"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
        F.signum(p - 30000).cast("int").alias("dev_sign"),
    )


# --- q_fn_array -------------------------------------------------------------

_ARRAY_ORACLE = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_words,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_words,
       list_contains(string_split(text, ' '), 'data') AS has_data,
       list_sort(string_split(text, ' '))[1] AS first_word_sorted
FROM documents
"""


@register("q_fn_array", oracle=_ARRAY_ORACLE)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over tokenized documents (arrays are the Dremel-style
    nested columnar shape, PAPERS.md). split/size/distinct/contains/sort —
    all JVM higher-order functions, no Python."""
    docs = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct_words"),
        F.array_contains(words, "data").alias("has_data"),
        F.sort_array(words).getItem(0).alias("first_word_sorted"),
    )


# --- q_fn_json --------------------------------------------------------------

_JSON_ORACLE = """
SELECT event_type,
       COUNT(*) AS n,
       MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_k
FROM events
GROUP BY event_type
"""


@register("q_fn_json", oracle=_JSON_ORACLE)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction + typed aggregation over event props (the document
    serialization JSON of the reference). Integer sums are exact; avg is one
    double division on identical operands."""
    ev = load(spark, sf_dir, "events")
    k_int = F.get_json_object("props", "$.k").cast("int")
    k_long = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(k_int).alias("min_k"),
        F.max(k_int).alias("max_k"),
        F.sum(k_long).alias("sum_k"),
        (F.sum(k_long).cast("double") / F.count(F.lit(1))).alias("avg_k"),
    )


# --- q_fn_conditional -------------------------------------------------------

_COND_ORACLE = """
SELECT o_orderkey,
       CASE WHEN o_totalprice < 100000 THEN 'low'
            WHEN o_totalprice < 300000 THEN 'mid'
            ELSE 'high' END AS tier,
       GREATEST(o_totalprice, 150000.0) AS at_least_150k,
       LEAST(o_totalprice, 150000.0) AS at_most_150k,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING-MASKED') AS status_masked
FROM orders
WHERE o_orderkey <= 5000
"""


@register("q_fn_conditional", oracle=_COND_ORACLE)
def q_fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN tiering + greatest/least/coalesce/nullif (the reference's
    quality-flag routing)."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 5000)
    p = F.col("o_totalprice")
    return orders.select(
        "o_orderkey",
        F.when(p < 100000, "low").when(p < 300000, "mid").otherwise("high").alias("tier"),
        F.greatest(p, F.lit(150000.0)).alias("at_least_150k"),
        F.least(p, F.lit(150000.0)).alias("at_most_150k"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING-MASKED")).alias(
            "status_masked"
        ),
    )


# --- q_fn_trycast -----------------------------------------------------------

_TRYCAST_ORACLE = """
WITH dirty AS (
  SELECT o_orderpriority,
         CASE o_orderkey % 4
           WHEN 0 THEN CAST(o_orderkey AS VARCHAR)
           WHEN 1 THEN ' ' || CAST(o_custkey AS VARCHAR) || ' '
           WHEN 2 THEN o_orderpriority
           ELSE '' END AS s_int,
         CASE o_orderkey % 3
           WHEN 0 THEN CAST(o_orderkey AS VARCHAR) || '.5'
           WHEN 1 THEN '1e3'
           ELSE 'n/a' END AS s_dbl,
         CASE o_orderkey % 3
           WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
           WHEN 1 THEN '2024-13-01'
           ELSE o_orderstatus END AS s_date
  FROM orders
)
SELECT o_orderpriority,
       COUNT(TRY_CAST(s_int AS BIGINT))            AS n_int_ok,
       CAST(SUM(TRY_CAST(s_int AS BIGINT)) AS BIGINT) AS sum_int,
       COUNT(TRY_CAST(s_dbl AS DOUBLE))            AS n_dbl_ok,
       CAST(SUM(CAST(TRY_CAST(s_dbl AS DOUBLE) AS DECIMAL(18,7))) AS DOUBLE) AS sum_dbl,
       COUNT(TRY_CAST(s_date AS DATE))             AS n_date_ok,
       MIN(TRY_CAST(s_date AS DATE))               AS min_date,
       COUNT(*)                                    AS n
FROM dirty
GROUP BY o_orderpriority
"""


@register("q_fn_trycast", oracle=_TRYCAST_ORACLE)
def q_fn_trycast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fault-tolerant parsing (TRY_CAST): the dirty-input path of every
    ingest pipeline — malformed ints/doubles/dates become NULL instead of
    failing the job (Spark 4 runs ANSI mode, so a plain CAST would THROW on
    the first bad row of 100 TB; try_cast is the scale-safe idiom).

    Parity trap (probed): decimal-strings like '4.5' → int differ between
    engines (DuckDB rounds to 5, Spark ANSI try_cast yields NULL), so the
    generated dirt avoids that case; whole numbers, whitespace-padded,
    scientific notation, invalid dates, and garbage all agree.

    spread() parallelizes the parse: three try_casts (one a full date
    parse) per row are CPU work that would otherwise serialize on the
    local single-row-group scan; pre-partitioning on the grouping key
    also feeds the aggregate shuffle-free.
    """
    orders = spread(load(spark, sf_dir, "orders"), "o_orderpriority")
    k = F.col("o_orderkey")
    s_int = (
        F.when(k % 4 == 0, k.cast("string"))
        .when(k % 4 == 1, F.concat(F.lit(" "), F.col("o_custkey").cast("string"), F.lit(" ")))
        .when(k % 4 == 2, F.col("o_orderpriority"))
        .otherwise(F.lit(""))
    )
    s_dbl = (
        F.when(k % 3 == 0, F.concat(k.cast("string"), F.lit(".5")))
        .when(k % 3 == 1, F.lit("1e3"))
        .otherwise(F.lit("n/a"))
    )
    s_date = (
        F.when(k % 3 == 0, F.date_format("o_orderdate", "yyyy-MM-dd"))
        .when(k % 3 == 1, F.lit("2024-13-01"))
        .otherwise(F.col("o_orderstatus"))
    )
    dirty = orders.select(
        "o_orderpriority",
        s_int.try_cast("bigint").alias("v_int"),
        s_dbl.try_cast("double").alias("v_dbl"),
        s_date.try_cast("date").alias("v_date"),
    )
    return dirty.groupBy("o_orderpriority").agg(
        F.count("v_int").alias("n_int_ok"),
        F.sum("v_int").cast("bigint").alias("sum_int"),
        F.count("v_dbl").alias("n_dbl_ok"),
        F.sum(F.col("v_dbl").cast("decimal(18,7)")).cast("double").alias("sum_dbl"),
        F.count("v_date").alias("n_date_ok"),
        F.min("v_date").alias("min_date"),
        F.count(F.lit(1)).alias("n"),
    )


# --- q_fn_url ---------------------------------------------------------------

_URL_ORACLE = """
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.example.org/docs/' || CAST(doc_id AS VARCHAR)
           || '?lang=' || lang || '&v=2' AS url
  FROM documents
)
SELECT doc_id,
       regexp_extract(url, '^https?://([^/]+)', 1) AS host,
       regexp_extract(url, '^https?://[^/]+(/[^?#]*)', 1) AS path,
       regexp_extract(url, '\\?(.*)$', 1) AS query,
       regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang_param,
       regexp_extract(url, '^(https?)://', 1) AS protocol
FROM u
"""


@register("q_fn_url", oracle=_URL_ORACLE)
def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition (host / path / query / single param / protocol) —
    the provenance-tracking projection of a web-scale corpus pipeline
    (CommonCrawl-style source attribution, per-domain quotas, param
    stripping).

    Uses Spark's builtin parse_url (JVM, codegen'd) rather than regexes;
    the oracle mirrors with RE2 extracts. parse_url returns NULL on
    missing components and '' only when present-but-empty — the synthetic
    URLs here always carry every component, so both engines agree.
    """
    docs = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.org/docs/"),
        F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"), F.lit("&v=2"),
    )
    u = docs.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
    )


# --- q_fn_date_edges ---------------------------------------------------------

_DATE_EDGES_ORACLE = """
SELECT * FROM (VALUES
  (1, DATE '2024-02-29', DATE '2025-01-29', DATE '2024-03-29'),
  (2, DATE '2023-03-28', DATE '2024-02-28', DATE '2023-04-28'),
  (3, DATE '2024-03-29', DATE '2025-02-28', DATE '2024-04-29'),
  (4, DATE '2025-01-28', DATE '2025-12-28', DATE '2025-02-28')
) AS t(case_id, plus_month, plus_year, plus_two_months)
"""


@register("q_fn_date_edges", oracle=_DATE_EDGES_ORACLE)
def q_fn_date_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-arithmetic edge certificate: month/year addition over the
    dates where naive day arithmetic breaks — leap day (2024-02-29),
    month-length mismatches (Jan 31 + 1 month), and year-boundary clamps —
    pinned as a VALUES oracle. Both engines clamp to the target month's
    last day (2024-01-29 + 1 month = 2024-02-29; 2024-02-29 + 12 months =
    2025-02-28), and this query makes that agreement an executable
    contract for every +INTERVAL/add_months in the registry (gap-fill
    spines, SCD validity windows, cohort offsets).

    The probe dates are literals; Spark evaluates add_months/constant
    folding at plan time — zero data read."""
    rows = [
        (1, "2024-01-29"),  # +1 month lands on the leap day (clamp-free hit)
        (2, "2023-02-28"),  # Feb-end base: +12 months re-clamps in Feb 2024
        (3, "2024-02-29"),  # leap-day base: +12 months clamps to Feb 28
        (4, "2024-12-28"),  # year-boundary rollover
    ]
    base = spark.createDataFrame(rows, "case_id int, base string")
    d = F.col("base").cast("date")
    out = base.select(
        "case_id",
        F.add_months(d, 1).alias("plus_month"),
        F.add_months(d, 12).alias("plus_year"),
        F.add_months(d, 2).alias("plus_two_months"),
    )
    return out


# --- q_fn_regexp (portable-regex-subset certificate) -------------------------

_REGEXP_ORACLE = """
WITH x AS (
  SELECT p_partkey,
         lower(p_name) AS nm,
         p_brand,
         lower(p_type) AS ty,
         CAST(('0' || regexp_extract(p_brand, '#([0-9]+)', 1)) AS BIGINT)
           AS brand_num,
         regexp_extract(lower(p_name), '^([a-z]+)', 1) AS first_word,
         length(regexp_replace(lower(p_name), '[aeiou]+', '_', 'g'))
           AS devowel_len,
         CASE WHEN regexp_matches(lower(p_name), '(ring|widget|gear)')
              THEN 1 ELSE 0 END AS is_mech,
         CASE WHEN regexp_matches(lower(p_type), '^(economy|standard)$')
              THEN 1 ELSE 0 END AS is_basic_tier,
         CASE WHEN regexp_matches(p_brand, '^Brand#[0-9]{1,2}$')
              THEN 1 ELSE 0 END AS brand_wellformed
  FROM part
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(brand_num) AS BIGINT) AS sum_brand_num,
       CAST(SUM(length(first_word)) AS BIGINT) AS sum_first_word_len,
       CAST(SUM(devowel_len) AS BIGINT) AS sum_devowel_len,
       CAST(SUM(is_mech) AS BIGINT) AS n_mech,
       CAST(SUM(is_basic_tier) AS BIGINT) AS n_basic_tier,
       CAST(SUM(brand_wellformed) AS BIGINT) AS n_brand_wellformed
FROM x
"""


@register("q_fn_regexp", oracle=_REGEXP_ORACLE)
def q_fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PORTABLE-REGEX-SUBSET certificate: extraction with a capture group,
    global replacement, partial-match predicates, anchors, alternation,
    bounded quantifiers, and character classes — exercised over part
    strings and checksummed on both engines. The subset pinned here is
    what this repo allows itself in hot paths (normalization in the
    dedup ladder, redaction, langid): character classes, `+`/`{m,n}`
    quantifiers, `^`/`$` anchors, alternation groups, and numbered
    capture groups.

    Portability notes the certificate encodes: Spark regexps run on
    java.util.regex and DuckDB on RE2 — lookarounds, backreferences and
    possessive quantifiers diverge or are unsupported and are BANNED
    from this codebase; `regexp_replace` is global-by-default in Spark
    but first-match in DuckDB (the oracle passes the 'g' flag — same
    convention as every normalization oracle here); a no-match
    `regexp_extract` returns '' on both engines (the '0'||… guard makes
    the numeric cast total). All reported values are exact integers.
    """
    part = load(spark, sf_dir, "part")
    nm = F.lower(F.col("p_name"))
    x = part.select(
        F.concat(F.lit("0"), F.regexp_extract("p_brand", "#([0-9]+)", 1))
        .cast("bigint")
        .alias("brand_num"),
        F.length(F.regexp_extract(nm, "^([a-z]+)", 1)).alias("first_word_len"),
        F.length(F.regexp_replace(nm, "[aeiou]+", "_")).alias("devowel_len"),
        nm.rlike("(ring|widget|gear)").cast("int").alias("is_mech"),
        F.lower(F.col("p_type"))
        .rlike("^(economy|standard)$")
        .cast("int")
        .alias("is_basic_tier"),
        F.col("p_brand").rlike("^Brand#[0-9]{1,2}$").cast("int").alias(
            "brand_wellformed"
        ),
    )
    return x.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("brand_num").cast("bigint").alias("sum_brand_num"),
        F.sum("first_word_len").cast("bigint").alias("sum_first_word_len"),
        F.sum("devowel_len").cast("bigint").alias("sum_devowel_len"),
        F.sum("is_mech").cast("bigint").alias("n_mech"),
        F.sum("is_basic_tier").cast("bigint").alias("n_basic_tier"),
        F.sum("brand_wellformed").cast("bigint").alias("n_brand_wellformed"),
    )


# --- q_fn_uuid --------------------------------------------------------------

_UUID_ORACLE = """
WITH d AS (
  SELECT o_orderkey, sha256('order:' || CAST(o_orderkey AS VARCHAR)) AS h
  FROM orders WHERE o_orderkey % 997 = 0
), ids AS (
  SELECT o_orderkey,
         substr(h, 1, 8) || '-' || substr(h, 9, 4) || '-5' ||
         substr(h, 14, 3) || '-8' || substr(h, 18, 3) || '-' ||
         substr(h, 21, 12) AS uid
  FROM d
)
SELECT o_orderkey, uid,
       CAST(length(uid) AS BIGINT) AS uid_len
FROM ids
"""


@register("q_fn_uuid", oracle=_UUID_ORACLE)
def q_fn_uuid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic UUIDv5-style surrogate-key minting: a namespaced
    sha-256 digest reformatted as 8-4-4-4-12 hex with the version nibble
    pinned to 5 and the variant nibble to 8 — the stable-id primitive every
    ingestion pipeline needs when upstream keys must not leak and random
    UUIDs would break idempotent re-runs (same input row → same id on every
    engine, run, and partition layout; contrast F.uuid(), which is
    nondeterministic by design and banned from declared queries).

    Parity: sha2/sha256 hex output is byte-identical across engines;
    everything else is substring concatenation. The deterministic
    o_orderkey % 997 filter keeps the declared sample small at any SF.

    Scale shape: pure per-row projection — no shuffle at all; the filter
    pushes to the scan.
    """
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 997 == 0)
    h = F.sha2(F.concat(F.lit("order:"), F.col("o_orderkey").cast("string")), 256)
    uid = F.concat(
        F.substring(h, 1, 8),
        F.lit("-"),
        F.substring(h, 9, 4),
        F.lit("-5"),
        F.substring(h, 14, 3),
        F.lit("-8"),
        F.substring(h, 18, 3),
        F.lit("-"),
        F.substring(h, 21, 12),
    )
    return orders.select(
        "o_orderkey",
        uid.alias("uid"),
        F.length(uid).cast("bigint").alias("uid_len"),
    )
