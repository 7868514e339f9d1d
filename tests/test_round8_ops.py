"""Round-8 continuation invariants: CC auto-deepening continuation
correctness (property-based vs union-find), multi-probe LSH recall
domination, and an engine-independent M4 brute-force recomputation."""

from __future__ import annotations

import math

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from genesapi_cli_spark.io import load
from tests.conftest import SMOKE_SF_DIR

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# random small graphs: chains force continuation (start rounds=2 certifies
# diameter 4 only), plus arbitrary extra edges for merge-heavy shapes
EDGES = st.lists(
    st.tuples(st.integers(0, 25), st.integers(0, 25)).filter(lambda t: t[0] != t[1]),
    min_size=1,
    max_size=30,
)


def _union_find(pairs):
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@given(edges=EDGES)
@_slow
def test_cc_auto_continuation_equals_union_find(spark, edges):
    """connected_components_auto must land on the exact min-label components
    for ANY graph with the starting depth deliberately too shallow
    (rounds=2 certifies diameter ≤ 4; a 26-node chain needs more), so the
    init_labels CONTINUATION path is exercised, not just the happy path."""
    from genesapi_cli_spark.operators.dedup import connected_components_auto

    # chain guarantees a deep component alongside hypothesis' random edges
    chain = [(i, i + 1) for i in range(25)]
    pairs = sorted(set(tuple(sorted(e)) for e in edges) | set(chain))
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    cc = connected_components_auto(df, rounds=2)
    got = {r.node: r.label for r in cc.collect()}
    n_unconverged = sum(1 for r in cc.collect() if r.prev != r.label)
    assert n_unconverged == 0
    assert got == _union_find(pairs)


def test_multiprobe_dominates_single_probe(spark):
    """Multi-probe candidates are a strict superset of the single-probe
    bucket, so per query: the multiprobe top-1 snapped cosine is >= the
    single-probe top-1, every single-probe survivor that multiprobe also
    ranks keeps the same snapped cosine, and probe_dist=0 rows reproduce
    single-probe scoring exactly."""
    import genesapi_cli_spark
    from genesapi_cli_spark.registry import REGISTRY

    genesapi_cli_spark.load_all()
    single = REGISTRY["q_sim_ann_lsh"].fn(spark, SMOKE_SF_DIR).collect()
    multi = REGISTRY["q_sim_ann_multiprobe"].fn(spark, SMOKE_SF_DIR).collect()
    s_top = {}
    for r in single:
        if r.rn == 1:
            s_top[r.query_id] = r.cos_r
    m_top = {}
    m_pairs = {}
    for r in multi:
        if r.rn == 1:
            m_top[r.query_id] = r.cos_r
        m_pairs[(r.query_id, r.neighbor_id)] = (r.cos_r, r.probe_dist)
    assert set(s_top) <= set(m_top)  # multiprobe never loses a query
    for q, c in s_top.items():
        assert m_top[q] >= c
    for r in single:
        hit = m_pairs.get((r.query_id, r.neighbor_id))
        if hit is not None:
            assert hit == (r.cos_r, 0)  # same bucket, same snapped score


def test_m4_equals_bruteforce(spark):
    """q_time_m4 must equal an engine-independent pandas recomputation:
    exact integer bucketing, then first/last by (ts_us, event_id) and
    min/max values per (series, bucket) — independent of both the Spark
    aggregate strategy and the DuckDB oracle windows."""
    import genesapi_cli_spark
    from genesapi_cli_spark.operators.timeseries import _M4_BUCKETS
    from genesapi_cli_spark.registry import REGISTRY

    genesapi_cli_spark.load_all()
    got = {
        (r.event_type, r.bucket): (
            r.n_points, r.t_first, r.v_first, r.t_last, r.v_last, r.v_min, r.v_max
        )
        for r in REGISTRY["q_time_m4"].fn(spark, SMOKE_SF_DIR).collect()
    }
    pdf = (
        load(spark, SMOKE_SF_DIR, "events")
        .select("event_type", "ts_us", "event_id", "value")
        .toPandas()
    )
    want = {}
    for et, g in pdf.groupby("event_type"):
        t0, t1 = int(g["ts_us"].min()), int(g["ts_us"].max())
        g = g.assign(bucket=((g["ts_us"] - t0) * _M4_BUCKETS) // (t1 - t0 + 1))
        for b, gb in g.groupby("bucket"):
            gb = gb.sort_values(["ts_us", "event_id"])
            want[(et, int(b))] = (
                len(gb),
                int(gb["ts_us"].iloc[0]),
                float(gb["value"].iloc[0]),
                int(gb["ts_us"].iloc[-1]),
                float(gb["value"].iloc[-1]),
                float(gb["value"].min()),
                float(gb["value"].max()),
            )
    assert got == want


def test_ks_stream_state_survives_restart(spark, tmp_path):
    """The stateful monitors must RESUME from the state store: run the KS
    drift monitor over batch 1 with a checkpoint, STOP the query, add batch
    2, and restart against the same checkpoint — the file source replays
    nothing (progress log) and the restored state folds batch 2 on top, so
    the final verdict equals the batch q_events_ks over ALL rows. This is
    the production restart path (deploys, preemptions), not just the
    single-process availableNow run the equivalence tests use."""
    import json as _json

    import genesapi_cli_spark
    from genesapi_cli_spark.registry import REGISTRY
    from genesapi_cli_spark.streaming.runtime import events_file_stream
    from genesapi_cli_spark.streaming.stateful import ks_stream

    genesapi_cli_spark.load_all()

    want = REGISTRY["q_events_ks"].fn(spark, SMOKE_SF_DIR).collect()[0]
    ev = (
        load(spark, SMOKE_SF_DIR, "events")
        .select("event_id", "ts_us", "event_type", "value")
        .collect()
    )
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def dump(rows, name):
        (src / name).write_text(
            "\n".join(
                _json.dumps(
                    {
                        "event_id": r.event_id,
                        "ts_us": r.ts_us,
                        "user_id": 0,
                        "event_type": r.event_type,
                        "value": r.value,
                        "props": None,
                    }
                )
                for r in rows
            )
        )

    emissions: list = []

    def run_once():
        # foreachBatch: the one sink that both supports checkpoint recovery
        # and lets the test observe update-mode emissions directly (the
        # memory sink refuses to recover from a checkpoint)
        q = (
            ks_stream(events_file_stream(spark, str(src)))
            .writeStream.foreachBatch(
                lambda df, _id: emissions.extend(df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    dump([r for r in ev if r.event_id % 2 == 0], "b1.json")
    run_once()
    n_first = len(emissions)
    assert n_first >= 1  # batch 1 emitted a partial verdict
    dump([r for r in ev if r.event_id % 2 == 1], "b2.json")
    run_once()  # same checkpoint: restores state, reads ONLY b2
    assert len(emissions) > n_first
    # the post-restart emission folds restored state + batch 2 = all rows
    last = max(emissions, key=lambda r: r.na + r.nb)
    assert (last.na, last.nb, last.d_num, last.d_r4) == (
        want.na,
        want.nb,
        want.d_num,
        want.d_r4,
    )


def _scratch_events(tmp_path, select_sql):
    """Write a degenerate events.parquet derived from the smoke corpus
    (schema preserved) into a scratch sf_dir; returns the dir."""
    import duckdb

    sf = str(tmp_path)
    con = duckdb.connect()
    con.sql(
        f"COPY ({select_sql.format(src=SMOKE_SF_DIR + '/events.parquet')})"
        f" TO '{sf}/events.parquet' (FORMAT PARQUET)"
    )
    con.close()
    return sf


def test_croston_single_demand_point_emits_nothing(spark, tmp_path):
    """A series with one demand point has no interval yet: the seed row is
    dropped in both engines, so the query returns zero rows (not a crash,
    not a NULL-interval row)."""
    import genesapi_cli_spark
    from genesapi_cli_spark.registry import REGISTRY

    genesapi_cli_spark.load_all()
    sf = _scratch_events(
        tmp_path,
        "SELECT * FROM read_parquet('{src}')"
        " WHERE event_type = 'purchase' LIMIT 1",
    )
    assert REGISTRY["q_window_croston"].fn(spark, sf).count() == 0


def test_m4_single_point_series(spark, tmp_path):
    """One event per series: exactly one bucket row, first=last=min=max."""
    import genesapi_cli_spark
    from genesapi_cli_spark.registry import REGISTRY

    genesapi_cli_spark.load_all()
    sf = _scratch_events(
        tmp_path,
        "SELECT * FROM read_parquet('{src}')"
        " QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY event_id) = 1",
    )
    rows = REGISTRY["q_time_m4"].fn(spark, sf).collect()
    assert rows and all(
        r.n_points == 1
        and r.bucket == 0
        and r.t_first == r.t_last
        and r.v_first == r.v_last == r.v_min == r.v_max
        for r in rows
    )


def test_ewma_chart_zero_variance_emits_nothing(spark, tmp_path):
    """A constant-value stream has sigma = 0: the variance guard drops the
    series entirely (no rows, no NaN limits) in both engines."""
    import genesapi_cli_spark
    from genesapi_cli_spark.registry import REGISTRY

    genesapi_cli_spark.load_all()
    # constant daily TOTAL needs one fixed-value event per (stream, day) —
    # a constant per-event value alone still varies with daily event counts
    sf = _scratch_events(
        tmp_path,
        "SELECT * REPLACE (5.0 AS value) FROM read_parquet('{src}')"
        " QUALIFY ROW_NUMBER() OVER ("
        "   PARTITION BY event_type, CAST(epoch_us(ts) // 86400000000 AS BIGINT)"
        "   ORDER BY event_id) = 1",
    )
    assert REGISTRY["q_events_ewma_chart"].fn(spark, sf).count() == 0


def test_theil_perfect_equality_is_zero(spark, tmp_path):
    """One identical-totalprice order per customer => Theil T is exactly 0.0
    for every segment (the micro-snapped ln of x cancels ln(S/n) term for
    term, including the snap)."""
    import duckdb

    import genesapi_cli_spark
    from genesapi_cli_spark.registry import REGISTRY

    genesapi_cli_spark.load_all()
    sf = str(tmp_path)
    con = duckdb.connect()
    con.sql(
        f"COPY (SELECT * REPLACE (100.0 AS o_totalprice)"
        f" FROM read_parquet('{SMOKE_SF_DIR}/orders.parquet')"
        f" QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) = 1)"
        f" TO '{sf}/orders.parquet' (FORMAT PARQUET)"
    )
    con.sql(
        f"COPY (SELECT * FROM read_parquet('{SMOKE_SF_DIR}/customer.parquet'))"
        f" TO '{sf}/customer.parquet' (FORMAT PARQUET)"
    )
    con.close()
    rows = REGISTRY["q_agg_theil"].fn(spark, sf).collect()
    assert rows and all(r.theil_r4 == 0.0 for r in rows)
