#!/usr/bin/env python
"""Write CORRECTNESS_LOCAL.json — the committed full-registry analog of the
driver's CORRECTNESS_r{N}.json (which samples ~50 queries per round): every
registered query differentially checked against its DuckDB oracle at sf0.01,
with the same per-query fields (rows_match / schema_match / hash_match /
spark_rows / oracle_rows / err) plus a _meta header pinning the git HEAD the
run certifies. Run at final HEAD each round and commit the file:

    python scripts/correctness_local.py            # writes CORRECTNESS_LOCAL.json
    python scripts/correctness_local.py out.json   # custom path
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from genesapi_cli_spark.oracle import check_all  # noqa: E402
from genesapi_cli_spark.session import build_session  # noqa: E402

SCHEMA_MARKERS = (
    "columns differ",
    "declared-type kind differs",
    "kind differs",
    "duplicate spark column",
    "forbidden DuckDB type",
)


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(HERE, "CORRECTNESS_LOCAL.json")
    sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    spark = build_session(
        app_name="genesapi-correctness-local", master="local[8]", shuffle_partitions=8
    )
    t0 = time.time()
    results = check_all(spark, sf_dir)

    out: dict = {}
    n_ok = 0
    for r in sorted(results, key=lambda r: r.name):
        err = next((e for e in r.errors if e.startswith("exception:")), None)
        schema_ok = not any(m in e for e in r.errors for m in SCHEMA_MARKERS)
        out[r.name] = {
            "rows_match": err is None and r.spark_rows == r.oracle_rows
            if r.mode == "oracle"
            else err is None and r.spark_rows >= 0,
            "schema_match": err is None and schema_ok,
            "hash_match": r.ok and r.mode == "oracle",
            "spark_rows": r.spark_rows,
            "oracle_rows": r.oracle_rows,
            "err": err,
        }
        n_ok += r.ok

    try:
        head = subprocess.check_output(
            ["git", "-C", HERE, "rev-parse", "HEAD"], text=True
        ).strip()
    except Exception:
        head = None
    out["_meta"] = {
        "head": head,
        "sf_dir": sf_dir,
        "n_queries": len(results),
        "n_pass": n_ok,
        "wall_sec": round(time.time() - t0, 1),
        "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"{n_ok}/{len(results)} passed in {out['_meta']['wall_sec']}s -> {out_path}")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
