#!/usr/bin/env python
"""Local performance proxy (BASELINE.md): time each query's DuckDB oracle SQL
at sf0.1 and merge with Spark timings from bench.py into BENCH_LOCAL.json.
Usage: python scripts/duckdb_proxy.py '<spark bench json line>'"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import genesapi_cli_spark
from genesapi_cli_spark.oracle import duckdb_connect
from genesapi_cli_spark.registry import REGISTRY

SF_DIR = "/root/testdata/sf0.1"


def main() -> int:
    genesapi_cli_spark.load_all()
    con = duckdb_connect(SF_DIR)
    duck: dict[str, float] = {}
    for name, q in sorted(REGISTRY.items()):
        if not q.oracle:
            continue
        # min-of-2, matching bench.py's per-query protocol on the Spark side
        # (SCALE.md 6b: single runs on this host swing with unrelated load).
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            con.sql(q.oracle).fetchall()
            runs.append(time.perf_counter() - t0)
        duck[name] = round(min(runs), 3)
    out = {"sf": 0.1, "duckdb": duck}
    if len(sys.argv) > 1:
        spark_bench = json.loads(sys.argv[1])
        out["spark"] = spark_bench["queries"]
        out["spark_total"] = spark_bench["value"]
    out["duckdb_total"] = round(sum(duck.values()), 3)
    with open("BENCH_LOCAL.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"duckdb_total": out["duckdb_total"], "n": len(duck)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
