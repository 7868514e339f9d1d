#!/usr/bin/env python
"""Many-cube directory-ingest rehearsal (round-10, VERDICT item 6).

Generates N synthetic GENESIS-Quader cube files (one statistic per file —
the upstream storage layout: one cube per export file), mounts the whole
directory through the ``genesapi_cube`` Python DataSource (one
InputPartition per file, executors parse their own files), and measures:

1. parse throughput at N and 3N files — the marginal exponent must stay
   < 1.25 for the "parse scales with partitions" claim;
2. the catalog/schema build (q_genesis_schema's aggregation shape) over the
   full multi-cube relation — the one-shuffle metadata pass.

Merges a ``q_source_cube_ds@multicube`` row into BENCH_SCALE.json.

Usage: python scripts/cube_scale.py [base_files=128]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402

from genesapi_cli_spark.session import build_session  # noqa: E402
from genesapi_cli_spark.sources.cube_datasource import (  # noqa: E402
    CubeTextDataSource,
)

FACTS_PER_CUBE = 2500  # D;QEI lines per file (x2 measures = 5000 rows/file)


def write_cube(path: str, stat: int) -> None:
    """One synthetic cube: 1 GES axis, JAHR time, 2 measures, FACTS_PER_CUBE
    fact lines across 5 years x 2 sexes x 250 regions."""
    lines = [
        "K;DQ;FACH-SCHL;GHH-ART;TS-GED;KTX;PROD-STAND",
        f"D;DQ;{stat:05d}BJ001;;N;Synthetic;01.01.2024",
        "K;DQA;NAME;RHF-BSR;RHF-ACHSE",
        "D;DQA;DINSG;1;1",
        "D;DQA;GES;2;2",
        "K;DQZ;NAME;ZI-RHF-BSR",
        "D;DQZ;JAHR;3",
        "K;DQI;NAME;ME-NAME;DST;TYP",
        "D;DQI;BEVSTD;Anzahl;JAHRESSUMME;GANZ",
        "D;DQI;FLAECHE;qkm;JAHRESSUMME;FEST",
        "K;QEI;FACH-SCHL;FACH-SCHL;ZI-WERT;WERT;QUALITAET;GESPERRT",
    ]
    n = 0
    for year in range(2015, 2025):
        for sex in ("GESM", "GESW"):
            for region in range(1, 251):
                if n >= FACTS_PER_CUBE:
                    break
                v1 = (stat * 7 + year * 3 + region) % 100000
                v2 = ((stat + region) % 997) / 10.0
                lines.append(
                    f"D;QEI;{region:05d};{sex};{year};{v1};e;;{v2};e;"
                )
                n += 1
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines))


def gen_dir(root: str, n_files: int) -> str:
    d = os.path.join(root, f"cubes_{n_files}")
    os.makedirs(d, exist_ok=True)
    for i in range(n_files):
        write_cube(os.path.join(d, f"{10000 + i}BJ001.cube"), 10000 + i)
    return d


def measure(spark, path: str) -> dict:
    """min-of-2 wall for (a) full parse + fact count/sum, (b) the schema
    aggregation shape of q_genesis_schema over the same mount."""
    out = {}
    for name, run in (
        (
            "parse",
            lambda df: df.agg(
                F.count(F.lit(1)), F.sum("value"), F.count_distinct("cube")
            ).collect(),
        ),
        (
            "schema",
            lambda df: df.groupBy("statistic", "measure")
            .agg(
                F.count(F.lit(1)).alias("n_facts"),
                F.count("value").alias("n_values"),
                F.countDistinct("region_id").alias("n_regions"),
                F.min("year").alias("year_min"),
                F.max("year").alias("year_max"),
            )
            .count(),
        ),
    ):
        best = None
        for _ in range(2):
            df = spark.read.format("genesapi_cube").load(path)
            t0 = time.time()
            run(df)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    return out


def main() -> int:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        app_name="cube-scale", master=f"local[{cpus}]", shuffle_partitions=32
    )
    spark.dataSource.register(CubeTextDataSource)
    root = tempfile.mkdtemp(prefix="cube_scale_")
    try:
        row = {"facts_per_cube": FACTS_PER_CUBE * 2}
        for n in (base, 3 * base):
            d = gen_dir(root, n)
            row[f"files_{n}"] = measure(spark, d)
        t1 = row[f"files_{base}"]["parse"]
        t3 = row[f"files_{3 * base}"]["parse"]
        row["exp_marginal_parse"] = round(math.log(t3 / t1) / math.log(3), 3)
        s1 = row[f"files_{base}"]["schema"]
        s3 = row[f"files_{3 * base}"]["schema"]
        row["exp_marginal_schema"] = round(math.log(s3 / s1) / math.log(3), 3)
        path = os.path.join(HERE, "BENCH_SCALE.json")
        d = json.load(open(path))
        d.setdefault("queries", {})["q_source_cube_ds@multicube"] = row
        json.dump(d, open(path, "w"), indent=1, sort_keys=True)
        print(json.dumps(row))
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
