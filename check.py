#!/usr/bin/env python
"""CLI oracle check: ``python check.py [query ...]`` — runs the driver-style
differential check for all (or named) registered queries at sf0.01."""

from __future__ import annotations

import sys
import time

from genesapi_cli_spark.oracle import check_all
from genesapi_cli_spark.session import build_session


def main() -> int:
    names = set(sys.argv[1:]) or None
    sf_dir = "/root/testdata/sf0.01"
    spark = build_session(app_name="genesapi-check", master="local[8]", shuffle_partitions=8)
    t0 = time.time()
    results = check_all(spark, sf_dir, names)
    n_ok = sum(r.ok for r in results)
    for r in results:
        print(r)
    print(f"\n{n_ok}/{len(results)} passed in {time.time() - t0:.1f}s at {sf_dir}")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
