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


#: plan operators whose counts define the global snapshot fingerprint
#: (tests/test_plan_snapshot.py and scripts/snap_add.py share this list).
FINGERPRINT_OPS = [
    "Exchange (",
    "Sort (",
    "Window (",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "Expand (",
    "Generate (",
]

#: queries whose fn() performs real side effects at plan-construction time
#: (multi-generation parquet writes, saveAsTable, layout-stats collects) —
#: fingerprinting them would run the writes, not just plan the query.
FINGERPRINT_SKIP: set[str] = {
    "q_layout_bucketed",
    "q_layout_compaction",
    "q_layout_edges",
    "q_layout_zorder",
    "q_scan_dpp",
    "q_source_commit_log",
    "q_source_time_travel",
}


def plan_fingerprint(plan: str) -> dict[str, int]:
    """Counts of the scale-relevant operators in a formatted plan."""
    fp = {op.rstrip(" (").strip(): plan.count(op) for op in FINGERPRINT_OPS}
    return {k: v for k, v in fp.items() if v}
