#!/usr/bin/env python
"""Scale rehearsal: run the most bench-expensive queries at several locally
generated scale factors (scripts/gen_scale.py) and fit per-query scaling
exponents, writing BENCH_SCALE.json.

What this measures (and SCALE.md could previously only assert from plans):
does each query's wall time grow ~linearly in input size, or is something
super-linear hiding behind the sf0.1 fixed-overhead floor?

Protocol:
- One warm SparkSession for the whole ledger (bench.py protocol), but with
  the REAL-CLUSTER config — shuffle.partitions=32 + AQE on — not bench.py's
  local-floor shuffle=3: cross-sf comparability beats absolute smallness,
  and AQE coalescing is itself one of the behaviors under test.
- Per (query, sf): run twice, keep the minimum (bench.py protocol; machine
  load swings single runs ±2-4×).
- sf order: smallest→largest so memo/first-touch costs land on the cheap
  end (conservative for exponents: any residual warm-up inflates SMALL-sf
  times, which biases the fitted exponent DOWN — so we also report the
  marginal exponent over the top two sfs, where the floor is negligible).
- Exponents: least-squares slope of log t vs log sf over all sfs
  (`exp_all`), and the two largest sfs only (`exp_marginal`). exp_marginal
  is the one that answers "what happens at 100×": fixed overhead has
  amortized out and the asymptotic term dominates.

Queries: the top-N most expensive from BENCH_DETAIL.json (N=30 default),
minus NONSCALING inputs (the embedded GENESIS cube literal does not grow
with sf — its exponent would measure the constant, not the engine).

Usage: python scripts/bench_scale.py [--sfs 0.1,0.3,1,3] [--top 30]
       [--queries q_a,q_b] [--out BENCH_SCALE.json]
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE_ROOT = os.environ.get("SPARK_GRAFT_SCALE_ROOT", "/root/repo/scale_data")

#: Queries whose driving input is a fixed-size embedded fixture, not the
#: sf-scaled lake — a scaling exponent over sf would be meaningless.
NONSCALING = {"q_source_cube_ds", "q_source_cube_text", "q_source_cube_write"}

#: Per-query sf ceiling for shapes with a MEASURED super-linear exponent at
#: their contract parameters: the ledger still reports their exponent from
#: the sfs below the cap (the quadratic is established there), without
#: burning tens of minutes re-proving it at the top sf. Each cap must be
#: paired with a VARIANT row showing the engine's scale path for the same
#: query (see VARIANTS).
#: round-10: q_dedup_prefix_filter's cap removed — the corpus-calibrated
#: shingle width made the registered default ~linear on the degenerate
#: closed-vocabulary corpus (marginal exponent 0.57 at sf1→sf3).
#: round-11: q_dedup_ngram_jaccard capped at sf3 — the EXACT ground-truth
#: Jaccard legitimately enumerates every shared-shingle candidate pair,
#: and on the degenerate 31-word synthetic corpus the blocks go
#: whale-sized by sf10 (>49 GB of sort spill exhausted this host's disk).
#: Its scale path IS q_dedup_eval's budgeted audit (swept to sf10 at
#: marginal 0.589) plus the documented stop-shingle escape hatch; the
#: exact row exists to pin correctness, not to run at corpus scale.
#: q_dedup_threshold_sweep shares the identical shingle equi-join shape
#: (its docstring says so) and spilled 57 GB at sf10 before the cap.
SF_CAP: dict[str, float] = {
    "q_dedup_ngram_jaccard": 3,
    "q_dedup_threshold_sweep": 3,
}

#: Extra ledger rows: (name suffix, base query, session confs) — the scale-
#: path parameterizations of capped queries, benched across ALL sfs.
VARIANTS = [
    (
        "q_dedup_prefix_filter@w5",
        "q_dedup_prefix_filter",
        {"spark.genesapi.pf.shingle": "5"},
    ),
    # The documented scale setting of q_dedup_eval's in-plan block sampler
    # (round 9): the audit needs a fixed block BUDGET — an MAE estimate
    # wants a constant number of audited pairs, not a constant FRACTION of
    # an ever-growing corpus — so the production rate scales ~1/corpus
    # (rate·sf held constant; here 0.015 at sf1). A fixed fraction on the
    # closed-vocab synthetic corpus keeps candidate volume super-linear
    # because every pair shares MANY blocks. Conf values may be callables
    # of sf for exactly this budget-style setting.
    (
        "q_dedup_eval@budget",
        "q_dedup_eval",
        {
            "spark.genesapi.dedup.eval.block_sample": (
                lambda sf: "%.6f" % min(1.0, 0.015 / sf)
            )
        },
    ),
]


def pick_queries(top_n: int) -> list[str]:
    with open(os.path.join(os.path.dirname(__file__), "..", "BENCH_DETAIL.json")) as f:
        detail = json.load(f)
    ranked = sorted(detail["queries"].items(), key=lambda kv: -kv[1])
    out = [q for q, _ in ranked if q not in NONSCALING][:top_n]
    return out


def fit_exponent(sfs: list[float], times: list[float]) -> float | None:
    pts = [(math.log(s), math.log(t)) for s, t in zip(sfs, times) if t > 0]
    if len(pts) < 2:
        return None
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    denom = n * sxx - sx * sx
    if denom == 0:
        return None
    return (n * sxy - sx * sy) / denom


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sfs", default="0.1,0.3,1,3")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--out", default="BENCH_SCALE.json")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--no-variants",
        action="store_true",
        help="skip the VARIANTS rows (targeted re-measures of named queries)",
    )
    args = ap.parse_args()

    sfs = [float(s) for s in args.sfs.split(",")]
    qnames = (
        args.queries.split(",") if args.queries else pick_queries(args.top)
    )

    import genesapi_cli_spark
    from genesapi_cli_spark.registry import REGISTRY
    from genesapi_cli_spark.session import build_session

    genesapi_cli_spark.load_all()
    missing = [q for q in qnames if q not in REGISTRY]
    if missing:
        print("unknown queries:", missing, file=sys.stderr)
        return 2

    # ONE FRESH SESSION PER SF, 32g heap: a single session across all sfs
    # accumulates every memoized localCheckpoint's blocks, so the largest
    # sf (which runs last) pays everyone's memory pressure — measured
    # round 8: the same five queries read exp_marginal 1.3-1.7 in a shared
    # 8g session and 0.56-1.11 in fresh 32g sessions. Per-sf isolation
    # makes the exponent measure the QUERY, not the harness's heap state.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    rows: list[tuple[str, str, dict]] = [(q, q, {}) for q in qnames]
    if not args.no_variants:
        rows += [
            (name, base, confs) for name, base, confs in VARIANTS if base in REGISTRY
        ]
    results: dict[str, dict] = {name: {"times": {}} for name, _, _ in rows}
    for sf in sfs:
        tag = "%g" % sf
        sf_dir = f"{SCALE_ROOT}/sf{tag}"
        if not os.path.isdir(sf_dir):
            print(f"missing {sf_dir} — run scripts/gen_scale.py {tag}", file=sys.stderr)
            return 2
        spark = build_session(
            app_name=f"genesapi-bench-scale-sf{tag}", shuffle_partitions=32
        )
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        for name, base, confs in rows:
            if sf > SF_CAP.get(name, float("inf")):
                results[name]["capped_at"] = SF_CAP[name]
                continue
            fn = REGISTRY[base].fn
            for k, v in confs.items():
                spark.conf.set(k, v(sf) if callable(v) else v)
            try:
                best = None
                for _ in range(args.runs):
                    t0 = time.monotonic()
                    materialize(fn(spark, sf_dir))
                    dt = time.monotonic() - t0
                    best = dt if best is None else min(best, dt)
            except Exception as e:  # noqa: BLE001 — record, don't kill the sweep
                results[name][f"error_sf{tag}"] = f"{type(e).__name__}: {e}"[:300]
                print(f"sf{tag:>4} {name:32s} ERROR {type(e).__name__}", flush=True)
                # a dead JVM poisons every later row — bail out of this sf
                try:
                    spark.sql("SELECT 1").collect()
                except Exception:
                    print(f"session lost at sf{tag}; aborting this sf", flush=True)
                    break
                continue
            finally:
                for k in confs:
                    try:
                        spark.conf.unset(k)
                    except Exception:  # noqa: BLE001 — dead session
                        pass
            results[name]["times"][tag] = round(best, 4)
            print(f"sf{tag:>4} {name:32s} {best:7.2f}s", flush=True)
            # prompt Python GC: a finished query's round/intermediate
            # localCheckpoint blocks are freed only when their Python
            # DataFrame objects are collected (Py4J finalizers) — without
            # this, late queries in a pass inherit every earlier query's
            # pinned blocks and read inflated (measured: q_dedup_eval
            # exp_marginal 2.07 in-pass vs 1.11 isolated at the same sf).
            import gc as _gc

            _gc.collect()
        spark.stop()

    sup = []
    for name, _, _ in rows:
        tags = [t for t in ("%g" % s for s in sfs) if t in results[name]["times"]]
        xs = [float(t) for t in tags]
        times = [results[name]["times"][t] for t in tags]
        results[name]["exp_all"] = (
            round(fit_exponent(xs, times), 3) if len(xs) >= 2 else None
        )
        if len(xs) >= 2:
            results[name]["exp_marginal"] = round(
                fit_exponent(xs[-2:], times[-2:]), 3
            )
            if results[name]["exp_marginal"] is not None and results[name][
                "exp_marginal"
            ] > 1.25:
                sup.append(name)

    ledger = {
        "protocol": (
            "min-of-%d per (query, sf), ONE FRESH warm local[32] session "
            "PER SF (32g heap) so the top sf does not inherit the smaller "
            "sfs' checkpoint blocks, "
            "shuffle.partitions=32 + AQE on (real-cluster config, unlike "
            "bench.py's local-floor shuffle=3); data = scripts/gen_scale.py "
            "deterministic hash-synthetic tables mirroring driver testdata "
            "domains (FIXTURES.md); exp_marginal = log-log slope over the "
            "two largest sfs (fixed overhead amortized out) — the number "
            "that answers 'what happens at 100x'"
        ) % args.runs,
        "sfs": sfs,
        "n_queries": len(rows),
        "sf_caps": SF_CAP,
        "superlinear_marginal_gt_1.25": sup,
        "queries": results,
    }
    with open(args.out, "w") as f:
        json.dump(ledger, f, indent=1, sort_keys=True)
    print(json.dumps({"out": args.out, "superlinear": sup}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
