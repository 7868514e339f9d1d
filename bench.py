#!/usr/bin/env python
"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Timing = full query wall time (plan + execute + materialize via noop sink), on
a warm shared SparkSession — the same way a user would run repeated queries.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import genesapi_cli_spark
from genesapi_cli_spark.registry import REGISTRY
from genesapi_cli_spark.session import build_session


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    genesapi_cli_spark.load_all()

    only = set(sys.argv[1:]) or None
    spark = build_session(app_name="genesapi-bench")

    # JVM/codegen warmup so the first measured query isn't charged startup
    # cost: a trivial agg, a local-relation createDataFrame (first use spins
    # up Python→JVM conversion), and a parquet footer read.
    materialize(spark.range(1000).selectExpr("sum(id) AS s"))
    materialize(spark.createDataFrame([(1, "w")], "a int, b string"))
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    total = 0.0
    for name, q in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            materialize(q.fn(spark, sf_dir))
            dt = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001
            print(f"# ERROR {name}: {type(e).__name__}: {e}", file=sys.stderr)
            dt = float("nan")
        timings[name] = round(dt, 3)
        total += dt if dt == dt else 0.0

    print(
        json.dumps(
            {
                "metric": "suite_wall_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
