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
