"""Global physical-plan fingerprint regression harness.

`tests/plan_snapshot.json` records, for EVERY registry query, the counts of
the plan operators that matter at scale (exchanges, sorts, joins by
strategy, generators). Any code or dependency change that silently degrades
a plan — an extra shuffle, a broadcast falling back to sort-merge, an
equi-join decaying to nested-loop — fails this test before it ever ships,
for all queries, not just the hand-asserted ones in test_plans.py.

Regenerate intentionally with:

    GRAFT_REGEN_PLAN_SNAPSHOT=1 python -m pytest tests/test_plan_snapshot.py -q

and review the JSON diff like any other code change.
"""

from __future__ import annotations

import json
import os

import pytest

import genesapi_cli_spark
from genesapi_cli_spark.plans.inspect import (
    FINGERPRINT_SKIP as SKIP,
    GLOBAL_WINDOW_OK,
    formatted_plan,
    global_fact_windows,
    plan_fingerprint as _fingerprint,
)
from genesapi_cli_spark.registry import REGISTRY

from .conftest import ORACLE_SF_DIR

genesapi_cli_spark.load_all()

from genesapi_cli_spark.operators import (  # noqa: E402 — after load_all
    aggregates,
    dedup,
    graph,
    multimodal,
    similarity,
    text,
    timeseries,
)

#: Session-memoized shared relations are localCheckpointed, so consumers
#: fingerprint only the post-checkpoint stump — these builders expose each
#: shared subtree's UN-checkpointed plan so a bad edit to it still trips
#: the gate, independent of which consumer runs first.
SHARED_BUILDERS = {
    "shared::ranked_cents": aggregates.build_ranked_cents,
    "shared::daily_cents": timeseries.build_daily_cents,
    "shared::payload_frames": multimodal.build_payload_frames,
    "shared::normed_embeddings": similarity.build_normed_embeddings,
    "shared::ham_signatures": similarity.build_ham_signatures,
    "shared::portable_bands": dedup.build_portable_bands,
    "shared::copurchase_edges": graph.build_copurchase_edges,
    "shared::minhash_pairs": text.build_minhash_pairs,
}

SNAPSHOT_PATH = os.path.join(os.path.dirname(__file__), "plan_snapshot.json")


def _load_snapshot() -> dict:
    with open(SNAPSHOT_PATH) as fh:
        return json.load(fh)


def test_plan_fingerprints_match_snapshot(spark):
    regen = os.environ.get("GRAFT_REGEN_PLAN_SNAPSHOT") == "1"
    got: dict[str, dict[str, int]] = {}
    lint: dict[str, list[str]] = {}
    for name, q in sorted(REGISTRY.items()):
        if name in SKIP:
            continue
        df = q.fn(spark, ORACLE_SF_DIR)
        got[name] = _fingerprint(formatted_plan(df))
        bad = global_fact_windows(df)
        if bad and name not in GLOBAL_WINDOW_OK:
            lint[name] = bad
    for name, build in sorted(SHARED_BUILDERS.items()):
        df = build(spark, ORACLE_SF_DIR)
        got[name] = _fingerprint(formatted_plan(df))
        bad = global_fact_windows(df)
        if bad and name not in GLOBAL_WINDOW_OK:
            lint[name] = bad

    # Unpartitioned-window lint, same planning pass as the fingerprints: an
    # empty partition spec above a non-collapsed subtree is a single-task
    # global sort at scale — only documented GLOBAL_WINDOW_OK entries pass.
    assert not lint, (
        "fact-level global window (single-task sort at scale) — use the "
        f"tie-block decomposition or document a bound: {json.dumps(lint, indent=1)}"
    )

    if regen or not os.path.exists(SNAPSHOT_PATH):
        with open(SNAPSHOT_PATH, "w") as fh:
            json.dump(got, fh, indent=1, sort_keys=True)
        pytest.skip(f"snapshot regenerated with {len(got)} fingerprints")

    want = _load_snapshot()
    assert set(got) == set(want), (
        f"registry/snapshot drift: +{sorted(set(got) - set(want))} "
        f"-{sorted(set(want) - set(got))} — regenerate intentionally"
    )
    diffs = {n: (want[n], got[n]) for n in want if want[n] != got[n]}
    assert not diffs, f"plan fingerprints changed: {json.dumps(diffs, indent=1)}"


def test_global_window_lint_catches_fact_level_sort(spark):
    """The lint must go red on exactly the shape it exists for: a window
    with no partition keys directly over a raw table scan (single-task
    global sort at scale), and stay green once the same rank is computed
    with the tie-block decomposition's partitioned window."""
    from pyspark.sql import Window, functions as F

    from genesapi_cli_spark.io import load

    orders = load(spark, ORACLE_SF_DIR, "orders")
    bad = orders.select(
        "o_orderkey", F.row_number().over(Window.orderBy("o_totalprice")).alias("rk")
    )
    assert global_fact_windows(bad), "fact-level global window not flagged"

    good = orders.select(
        "o_orderkey",
        F.row_number()
        .over(Window.partitionBy("o_orderpriority").orderBy("o_totalprice"))
        .alias("rk"),
    )
    assert not global_fact_windows(good)

    # collapsed input: global window above an aggregate is the adjudicated
    # value-distribution shape and must pass.
    collapsed = (
        orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("o_orderpriority", F.row_number().over(Window.orderBy("n")).alias("rk"))
    )
    assert not global_fact_windows(collapsed)
