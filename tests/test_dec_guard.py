"""DEC range-guard contract (round-4 advice item).

The decimal(18,7) fast path (`registry.DEC`) silently requires every operand
routed through `dec_sum`/`dec_avg` to stay under ~1e11 in magnitude. That
invariant used to live only in docstrings; these tests make it executable:

1. an out-of-range operand THROWS under ANSI mode (the guard is loud — a
   future contributor routing money-scale squares through DEC gets a hard
   failure at the first gate run, never silent corruption);
2. the documented escape hatch `DEC_WIDE` (decimal(27,7)) absorbs the same
   operand exactly — so the fix for a legitimate wide operand is one word.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from genesapi_cli_spark.registry import DEC, DEC_WIDE, dec_sum

#: o_totalprice² scale — the documented first operand class that overflows
#: DEC's 11 integer digits (3.6e11 > 99_999_999_999.9999999).
MONEY_SQUARE = 3.6e11


def test_dec_overflow_throws_not_corrupts(spark):
    df = spark.range(3).select(F.lit(MONEY_SQUARE).alias("x"))
    with pytest.raises(Exception) as exc:
        df.select(dec_sum("x", "s")).collect()
    msg = str(exc.value)
    assert "NUMERIC_VALUE_OUT_OF_RANGE" in msg or "cannot be represented" in msg


def test_dec_in_range_operand_is_exact(spark):
    # The documented bound: operands < ~1e11 sum exactly on the fast path.
    df = spark.range(3).select(F.lit(99_999_999_999.5).alias("x"))
    [row] = df.select(dec_sum("x", "s")).collect()
    assert row.s == 3 * 99_999_999_999.5


def test_dec_wide_covers_money_scale_squares(spark):
    df = spark.range(3).select(F.lit(MONEY_SQUARE).alias("x"))
    [row] = df.select(
        F.sum(F.col("x").cast(DEC_WIDE)).cast("double").alias("s")
    ).collect()
    assert row.s == 3 * MONEY_SQUARE


def test_dec_types_are_what_the_perf_ledger_assumes(spark):
    # The fast path exists only at precision <= 18; widening DEC past it
    # (or narrowing DEC_WIDE below the squared-total range) should be a
    # deliberate, test-visible decision.
    assert DEC == "decimal(18,7)"
    assert DEC_WIDE == "decimal(27,7)"
