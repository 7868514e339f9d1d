"""Multi-dimensional data layout (Z-order clustering) for write-side
data skipping.

A linear sort layout gives perfect file-skipping on ONE leading column and
none on the others. Z-ordering interleaves the bits of k quantized columns
into a single clustering key, so file-level min/max bounding boxes shrink in
EVERY dimension — a predicate on any subset of the z-columns prunes files.
This is the layout Delta/Iceberg `OPTIMIZE ZORDER BY` applies; here it is
expressed with plain Spark built-ins so any parquet lake gets it:

    zorder_write(df, ["user_id", "value"], out_path, n_files=16)

Design for 100 TB:
- Quantization bounds come from ONE tiny agg job (global min/max per
  column — at scale use sampled or maintained statistics instead).
- The z-value is a pure codegen'd long expression (shift/or over 16-bit
  planes, built as a single expr string — no Python in the row path).
- ``repartitionByRange(z)`` range-partitions on the z-key (sampled range
  bounds, balanced output files) and ``sortWithinPartitions`` makes
  row-group stats tight inside each file.

Reference analog: none (the upstream CLI writes unclustered NDJSON);
this is part of the lake-layout surface a Spark-native engine owns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: bits kept per dimension; k dims × BITS must stay < 63 (long z-value).
BITS = 16


def _z_expr(cols: list[str], bits: int = BITS) -> str:
    """Bit-interleaving expression: z = Σ_{i<bits, j<k} bit_i(col_j) << (i*k+j).

    The per-plane terms touch disjoint bits, so OR == SUM and the whole
    thing folds into one codegen'd long expression. Built as a SQL string:
    node-by-node Column construction over Py4J is seconds-slow for wide
    trees (measured), one expr() parse is not.
    """
    k = len(cols)
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            terms.append(f"(shiftleft(shiftright(__q_{c}, {i}) & 1, {i * k + j}))")
    return " + ".join(terms)


def with_zvalue(df: DataFrame, cols: list[str], bits: int = BITS) -> DataFrame:
    """Add a ``__z`` column interleaving ``cols`` (numeric), quantized to
    ``bits``-bit ranks via global min/max scaling."""
    if not 1 <= len(cols) <= 3:
        raise ValueError("zorder supports 1-3 columns")
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    out = df
    top = (1 << bits) - 1
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        span = (mx - mn) or 1.0
        out = out.withColumn(
            f"__q_{c}",
            F.least(
                F.lit(top),
                F.floor((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * top),
            ).cast("long"),
        )
    out = out.withColumn("__z", F.expr(_z_expr(cols, bits)))
    return out.drop(*[f"__q_{c}" for c in cols])


def zorder_write(df: DataFrame, cols: list[str], path: str, n_files: int = 16) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``."""
    z = with_zvalue(df, cols)
    (
        z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
