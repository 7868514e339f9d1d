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
    formatted_plan,
    plan_fingerprint as _fingerprint,
)
from genesapi_cli_spark.registry import REGISTRY

from .conftest import ORACLE_SF_DIR

genesapi_cli_spark.load_all()

SNAPSHOT_PATH = os.path.join(os.path.dirname(__file__), "plan_snapshot.json")


def _load_snapshot() -> dict:
    with open(SNAPSHOT_PATH) as fh:
        return json.load(fh)


def test_plan_fingerprints_match_snapshot(spark):
    regen = os.environ.get("GRAFT_REGEN_PLAN_SNAPSHOT") == "1"
    got: dict[str, dict[str, int]] = {}
    for name, q in sorted(REGISTRY.items()):
        if name in SKIP:
            continue
        df = q.fn(spark, ORACLE_SF_DIR)
        got[name] = _fingerprint(formatted_plan(df))

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
