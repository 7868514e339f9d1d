"""Plan inspection helpers — the feedback loop for SURVEY.md §4: after a query
is correct, its physical plan must be the plan you'd want at 100 TB (pushed
filters, pruned columns, broadcast dims, no stray shuffles)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan (what ``df.explain('formatted')`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001 — no public API
        df._jdf.queryExecution(), "formatted"
    )


def assert_in_plan(df: DataFrame, *needles: str) -> str:
    plan = formatted_plan(df)
    for needle in needles:
        assert needle in plan, f"expected {needle!r} in plan:\n{plan}"
    return plan


def assert_not_in_plan(df: DataFrame, *needles: str) -> str:
    plan = formatted_plan(df)
    for needle in needles:
        assert needle not in plan, f"did not expect {needle!r} in plan:\n{plan}"
    return plan
