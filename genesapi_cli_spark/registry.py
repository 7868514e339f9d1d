"""The query contract registry.

Every operator from SURVEY.md §2 registers here as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus (unless rows-only) the
equivalent ANSI SQL for the DuckDB 1.0 oracle. ``__spark_entry__.py`` exposes
the registry to the driver; ``tests/test_oracle.py`` replicates the driver's
row-count + schema + order-insensitive value comparison locally so no query is
declared before it hash-matches.

Parity conventions enforced across the codebase (SURVEY.md §5.3 / §7.5):
- every computed column aliased identically on both sides;
- float outputs rounded to 4 decimals on both sides;
- large SUMs of doubles go through an exact decimal cast (``dec_sum``) so the
  result is independent of partition/summation order — double addition is not
  associative, and Spark's partial aggregation order differs from DuckDB's;
- timestamps leave declared queries as epoch longs or DATE casts, never raw
  engine-specific timestamp renderings; never emit raw float vectors.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None => rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name`` with an optional oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


# --- shared parity helpers -------------------------------------------------

#: Decimal type for order-independent double sums: 7 fractional digits and
#: an 11-digit integer part — ample for every per-ROW operand summed through
#: this helper (prices ≤ ~5e5, quantities, rates; NOT for squared per-user
#: totals — experiments.py keeps decimal(27,7) for its x², s²/n terms).
#: Precision 18 matters for throughput: Spark stores decimals ≤ 18 digits as
#: a compact long inside UnsafeRow and adds them on the long fast path,
#: while > 18 digits falls back to JVM BigDecimal per row (~3× slower on a
#: lineitem-scale sum, measured round 4). The SUM result widens to
#: decimal(28,7) so group totals stay exact to ~1e21; values are
#: bit-identical to the former decimal(27,7) because the scale-7 rounding
#: of each double is unchanged and no operand overflows the narrower type
#: (any overflow would throw under ANSI mode, not corrupt).
DEC = "decimal(18,7)"

#: Escape hatch for operands that exceed DEC's ~1e11 integer range —
#: money-scale SQUARES and squared per-group totals (o_totalprice² ≈ 3.6e11,
#: per-user revenue² and s²/n terms in experiments.py): 20 integer digits.
#: This is NOT the default because precision > 18 leaves Spark's compact-long
#: fast path (~3× slower per sum, measured round 4). Routing an out-of-range
#: operand through DEC does not corrupt — ANSI mode throws loudly — but the
#: fix is one word: use DEC_WIDE. tests/test_dec_guard.py pins both halves
#: of this contract.
DEC_WIDE = "decimal(27,7)"


def dec_sum(col: Column | str, alias: str) -> Column:
    """Order-independent SUM of a double expression.

    Casting each double to decimal(18,7) is deterministic (round-to-nearest;
    exact ties are measure-zero for binary doubles), decimal addition is exact
    and associative, and the final decimal→double cast is deterministic — so
    Spark and DuckDB agree bit-for-bit regardless of partitioning. NOTE: no
    engine ``round()`` anywhere — Spark and DuckDB round() disagree near
    .00005 boundaries even on identical doubles (observed empirically).
    DuckDB mirror: :func:`oracle_dec_sum`.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def oracle_dec_sum(expr: str, alias: str) -> str:
    """DuckDB-side mirror of :func:`dec_sum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,7))) AS DOUBLE) AS {alias}"


def dec_avg(col: Column | str, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum → double, then one double
    division by the group count — identical IEEE ops on both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(F.lit(1))).alias(alias)


def oracle_dec_avg(expr: str, alias: str) -> str:
    """DuckDB-side mirror of :func:`dec_avg`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,7))) AS DOUBLE) / COUNT(*) AS {alias}"


def r4(col: Column, alias: str) -> Column:
    """Deterministic 4-decimal rounding: floor(x*1e4 + 0.5)/1e4 — plain IEEE
    multiply/add/floor/divide, bit-identical across engines (unlike engine
    round()). Use only on values that are already bit-identical across
    engines. DuckDB mirror: :func:`oracle_r4`.
    """
    return (F.floor(col * 10000 + F.lit(0.5)) / 10000).alias(alias)


def oracle_r4(expr: str, alias: str) -> str:
    """DuckDB-side mirror of :func:`r4`."""
    return f"FLOOR(({expr}) * 10000 + 0.5) / 10000 AS {alias}"
