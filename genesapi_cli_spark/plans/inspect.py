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


# --- unpartitioned-window lint ----------------------------------------------

#: Logical nodes that bound the cardinality of everything above them: a
#: subtree is "collapsed" when every path from a window down to a leaf
#: passes one of these, so an unpartitioned window above it sorts an
#: entity/value/day-level relation, not raw facts.
_COLLAPSING_NODES = {
    "Aggregate",
    "Deduplicate",
    "Distinct",
    "GlobalLimit",
    "LocalLimit",
    "LocalRelation",
    "OneRowRelation",
    "Range",
}

#: Adjudicated exceptions to the global-window lint — every entry must name
#: the bound that makes the single-task sort safe. A new query landing here
#: without a documented bound is a review failure, not a config tweak.
GLOBAL_WINDOW_OK: dict[str, str] = {
    # nation is a 25-row dimension table by construction (TPC-H spec);
    # the demonstration ORDER BY + row_number sorts a dimension, not facts.
    "q_sort_order": "nation dimension input, <=25 rows by construction",
    # input is the checkpointed day-level shared_daily_cents rollup
    # (operators/timeseries.py) — bounded by calendar days x event types;
    # the localCheckpoint hides its Aggregate from the logical plan as a
    # LogicalRDD, so the walk cannot see the collapse.
    "q_window_rolling_corr": "checkpointed day-level rollup input "
    "(shared_daily_cents), bounded by calendar days",
}


def _jchildren(node) -> list:
    seq = node.children()
    return [seq.apply(i) for i in range(seq.length())]


def _first_fact_leaf(node) -> str | None:
    """Name of the first leaf reachable WITHOUT passing a collapsing node,
    or None if every path is collapsed. Checkpointed inputs (LogicalRDD)
    count as facts: the checkpoint hides whatever produced them, and an
    explicit GLOBAL_WINDOW_OK entry is the honest way to bless one."""
    name = node.getClass().getSimpleName()
    if name in _COLLAPSING_NODES:
        return None
    kids = _jchildren(node)
    if not kids:
        return name
    for k in kids:
        leaf = _first_fact_leaf(k)
        if leaf:
            return leaf
    return None


def global_fact_windows(df: DataFrame) -> list[str]:
    """All Window nodes in the optimized logical plan that have an EMPTY
    partition spec above a non-collapsed (fact-scale) subtree. Spark plans
    such a window as ONE task holding the entire relation — the named
    100 TB scale-killer (single-task sort, OOM) this lint exists to catch;
    the fix is the tie-block/block-offset decomposition
    (q_feature_lift, q_multimodal_shards show the machinery)."""
    plan = df._jdf.queryExecution().optimizedPlan()  # noqa: SLF001
    bad: list[str] = []

    def walk(node) -> None:
        name = node.getClass().getSimpleName()
        if name == "Window" and node.partitionSpec().isEmpty():
            leaf = _first_fact_leaf(_jchildren(node)[0])
            if leaf:
                bad.append(f"{node.simpleString(120)} [leaf={leaf}]")
        for k in _jchildren(node):
            walk(k)

    walk(plan)
    return bad
