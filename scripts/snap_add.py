#!/usr/bin/env python
"""Incrementally add/refresh plan-snapshot fingerprints for NAMED queries:

    python scripts/snap_add.py q_new_one q_new_two

Fingerprints only the named registry entries (same FINGERPRINT_OPS as
tests/test_plan_snapshot.py) and merges them into tests/plan_snapshot.json.
Use the full GRAFT_REGEN_PLAN_SNAPSHOT=1 pytest run when a change touches
shared subtrees; this helper exists so adding N new queries doesn't cost a
400-plan refingerprint per batch.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import genesapi_cli_spark
from genesapi_cli_spark.plans.inspect import (
    FINGERPRINT_SKIP as SKIP,
    formatted_plan,
    plan_fingerprint as _fingerprint,
)
from genesapi_cli_spark.registry import REGISTRY
from genesapi_cli_spark.session import build_session

SNAPSHOT_PATH = os.path.join(HERE, "tests", "plan_snapshot.json")
from tests.conftest import ORACLE_SF_DIR  # noqa: E402 — single source of truth


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: snap_add.py <query> [query ...]")
        return 2
    genesapi_cli_spark.load_all()
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"not registered: {unknown}")
        return 2
    spark = build_session(
        app_name="snap-add", master="local[4]", shuffle_partitions=8
    )
    with open(SNAPSHOT_PATH) as fh:
        snap = json.load(fh)
    for n in names:
        if n in SKIP:
            print(f"{n}: in SKIP set, not fingerprinted")
            snap.pop(n, None)
            continue
        df = REGISTRY[n].fn(spark, ORACLE_SF_DIR)
        snap[n] = _fingerprint(formatted_plan(df))
        print(f"{n}: {snap[n]}")
    with open(SNAPSHOT_PATH, "w") as fh:
        json.dump(snap, fh, indent=1, sort_keys=True)
    print(f"snapshot now has {len(snap)} fingerprints")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
