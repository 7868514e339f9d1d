#!/usr/bin/env python
"""Fail if CORRECTNESS_LOCAL.json is stale or incomplete — the guard the
round-11 verdict asked for (VERDICT.md "Next round" #4): the committed
full-registry differential ledger is the compensator for the driver's
fixed-window 50-query sample, so it must (a) cover every registry key,
(b) be all-green, and (c) certify a HEAD that is not older than the last
commit touching the package (an operator edit after the ledger run means
the ledger no longer proves anything about current behavior).

Exit 0 = fresh; exit 1 = stale/incomplete with a reason on stdout.

    python scripts/ledger_fresh.py            # check repo-root ledger
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(HERE, "CORRECTNESS_LOCAL.json")
    with open(path) as f:
        ledger = json.load(f)
    meta = ledger.get("_meta", {})
    ledger_head = meta.get("head", "")
    if not ledger_head:
        print("STALE: ledger has no _meta.head")
        return 1

    import genesapi_cli_spark

    genesapi_cli_spark.load_all()
    from genesapi_cli_spark.registry import REGISTRY

    keys = set(REGISTRY)
    in_ledger = {k for k in ledger if not k.startswith("_")}
    missing = sorted(keys - in_ledger)
    extra = sorted(in_ledger - keys)
    if missing:
        print(f"INCOMPLETE: {len(missing)} registry keys absent from ledger: {missing[:10]}")
        return 1
    if extra:
        print(f"DRIFT: {len(extra)} ledger keys no longer registered: {extra[:10]}")
        return 1
    bad = sorted(
        k
        for k in in_ledger
        if not (
            ledger[k].get("rows_match")
            and ledger[k].get("schema_match")
            and ledger[k].get("hash_match", True)
        )
    )
    if bad:
        print(f"RED: {len(bad)} ledger rows not green: {bad[:10]}")
        return 1

    # Freshness: no commit after the certified HEAD may touch the package
    # or the entry/oracle surface. (Docs/tests/ledgers can move freely.)
    try:
        touched = subprocess.run(
            [
                "git",
                "diff",
                "--name-only",
                f"{ledger_head}..HEAD",
                "--",
                "genesapi_cli_spark/",
                "__spark_entry__.py",
            ],
            cwd=HERE,
            capture_output=True,
            text=True,
            check=True,
        ).stdout.split()
    except subprocess.CalledProcessError as exc:
        print(f"STALE: certified head {ledger_head[:12]} not in history ({exc.stderr.strip()})")
        return 1
    if touched:
        print(
            f"STALE: {len(touched)} package files changed since certified head "
            f"{ledger_head[:12]}: {touched[:10]} — rerun scripts/correctness_local.py"
        )
        return 1
    dirty = subprocess.run(
        ["git", "status", "--porcelain", "--", "genesapi_cli_spark/", "__spark_entry__.py"],
        cwd=HERE,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split("\n")
    dirty = [ln for ln in dirty if ln.strip()]
    if dirty:
        print(
            f"STALE: {len(dirty)} uncommitted package edits in the working tree: "
            f"{dirty[:10]} — commit and rerun scripts/correctness_local.py"
        )
        return 1
    print(
        f"FRESH: {len(in_ledger)} keys, all green, certified at {ledger_head[:12]} "
        f"({meta.get('utc', '?')}), no package edits since"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
