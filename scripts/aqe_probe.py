#!/usr/bin/env python
"""AQE evidence probe: demonstrate — with captured final adaptive plans —
that the two runtime re-planning behaviors SCALE.md leans on actually fire
on this engine's data at locally reachable scale:

1. PARTITION COALESCING: a 32-partition shuffle whose post-shuffle data is
   small gets its reducers coalesced (`AQEShuffleRead coalesced` in the
   final plan).
2. SKEW-JOIN SPLIT: a sort-merge join keyed on `documents.lang` (the 'en'
   key holds ~41% of rows — the engine's profiled skew) gets its oversized
   partition split (`isSkewed=true` / skew counts in the final plan).

Threshold honesty: Spark's default skew trigger is 256 MB per partition —
production-sized. Local sf3 documents are ~10 MB total, so the probe
lowers skewedPartitionThresholdInBytes/advisoryPartitionSizeInBytes to
make the SAME mechanism fire on ~MB partitions; the mechanism, not the
threshold, is what 100 TB behavior depends on (defaults fire there
unaided). Broadcast is disabled for the skew probe only — at real scale
the build side exceeds the broadcast threshold on its own.

Writes its findings into BENCH_SCALE.json under the "aqe" key (or a
standalone AQE_PROBE.json with --out).

Usage: python scripts/aqe_probe.py [--sf-dir scale_data/sf3] [--out BENCH_SCALE.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def final_plan(df) -> str:
    """Final ADAPTIVE physical plan — only meaningful AFTER an action."""
    return df._jdf.queryExecution().executedPlan().toString()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/scale_data/sf3")
    ap.add_argument("--out", default="BENCH_SCALE.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from genesapi_cli_spark.io import load
    from genesapi_cli_spark.session import build_session

    spark = build_session(app_name="genesapi-aqe-probe", shuffle_partitions=32)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")

    evidence: dict = {"sf_dir": args.sf_dir}

    # --- 1. coalesce probe: 32-way shuffle, tiny reduce side ---------------
    agg = (
        load(spark, args.sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"))
    )
    agg.write.format("noop").mode("overwrite").save()
    plan = final_plan(agg)
    evidence["coalesce_observed"] = "coalesced" in plan
    evidence["coalesce_plan_lines"] = [
        ln.strip() for ln in plan.splitlines() if "AQEShuffleRead" in ln
    ][:4]

    # --- 2. skew-join probe: lang-keyed SMJ, 'en' ≈ 41% of documents -------
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k"
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128k")
    try:
        docs = load(spark, args.sf_dir, "documents")
        langs = docs.groupBy("lang").agg(
            F.count(F.lit(1)).cast("bigint").alias("lang_docs")
        )
        joined = (
            docs.join(langs, "lang")
            .groupBy("source")
            .agg(
                F.sum("lang_docs").alias("w"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        joined.write.format("noop").mode("overwrite").save()
        plan = final_plan(joined)
        skew_lines = [
            ln.strip()
            for ln in plan.splitlines()
            if "Skew" in ln or "isSkew" in ln or "skewed" in ln
        ]
        evidence["skew_split_observed"] = (
            "isSkew=true" in plan or "skewed=" in plan or bool(skew_lines)
        )
        evidence["skew_plan_lines"] = skew_lines[:4] or [
            ln.strip() for ln in plan.splitlines() if "SortMergeJoin" in ln
        ][:2]
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        )
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")

    evidence["note"] = (
        "skew thresholds lowered (256k/128k advisory) so the 256MB-default "
        "mechanism fires on MB-scale local partitions; broadcast disabled "
        "for the skew probe only — see module docstring"
    )

    if os.path.exists(args.out):
        with open(args.out) as f:
            ledger = json.load(f)
    else:
        ledger = {}
    ledger["aqe"] = evidence
    with open(args.out, "w") as f:
        json.dump(ledger, f, indent=1, sort_keys=True)
    print(json.dumps(evidence, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
