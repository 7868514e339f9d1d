"""Edge-semantics unit tests for the SCD-2 / point-in-time / time-series
operators (operators/history.py, operators/timeseries.py) on literal frames
with hand-computed goldens. The differential oracle (test_oracle.py) proves
bulk parity; these pin the boundary behaviors the oracle data may not hit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from genesapi_cli_spark.operators.history import build_scd2


def _events(spark, rows):
    """rows: (event_id, ts_us, user_id, event_type, value)"""
    return spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long, event_type string, value double"
    )


def test_scd2_single_version_is_current(spark):
    ev = _events(spark, [(1, 1000, 7, "signup", 5.0)])
    out = build_scd2(ev).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.version, r.v_cents, r.valid_from_us, r.valid_to_us, r.is_current) == (
        1,
        500,
        1000,
        None,
        1,
    )


def test_scd2_intervals_abut_and_order_by_event_id_on_ts_tie(spark):
    # two versions at the SAME ts — event_id breaks the tie deterministically
    ev = _events(
        spark,
        [
            (2, 1000, 7, "signup", 1.0),
            (1, 1000, 7, "signup", 2.0),
            (3, 5000, 7, "signup", 3.0),
        ],
    )
    out = sorted(build_scd2(ev).collect(), key=lambda r: r.version)
    assert [r.v_cents for r in out] == [200, 100, 300]  # event_id 1 first
    assert [(r.valid_from_us, r.valid_to_us) for r in out] == [
        (1000, 1000),
        (1000, 5000),
        (5000, None),
    ]
    assert [r.is_current for r in out] == [0, 0, 1]


def test_pit_join_drops_pre_history_facts_and_picks_interval(spark):
    from genesapi_cli_spark.operators.history import q_join_pit
    import os
    import tempfile

    rows = [
        (1, 1_000_000, 7, "signup", 1.0),     # v1 [1s, 3s)
        (2, 3_000_000, 7, "signup", 2.0),     # v2 [3s, inf)
        (10, 500_000, 7, "purchase", 9.0),    # before any version -> dropped
        (11, 2_000_000, 7, "purchase", 9.5),  # inside v1
        (12, 3_000_000, 7, "purchase", 9.9),  # exactly at v2 start -> v2
    ]
    df = _events(spark, rows).withColumn(
        "ts", F.timestamp_micros(F.col("ts_us"))
    ).select("event_id", "ts", "user_id", "event_type", "value")
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        out = {r.event_id: r.version for r in q_join_pit(spark, d).collect()}
    assert out == {11: 1, 12: 2}


def test_ewma_first_row_equals_value_and_num_den_exact(spark):
    from genesapi_cli_spark.registry import REGISTRY
    import os
    import tempfile

    rows = [
        (1, 1_000_000, 7, "view", 2.00),
        (2, 2_000_000, 7, "view", 4.00),
    ]
    df = _events(spark, rows).withColumn(
        "ts", F.timestamp_micros(F.col("ts_us"))
    ).select("event_id", "ts", "user_id", "event_type", "value")
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        out = {
            r.event_id: r
            for r in REGISTRY["q_window_ewma"].fn(spark, d).collect()
        }
    # first row: only w=128 present -> ewma == value
    assert out[1].num == 200 * 128 and out[1].den == 128
    assert out[1].ewma == 2.0
    # second row: (400*128 + 200*64) / ((128+64)*100)
    assert out[2].num == 400 * 128 + 200 * 64 and out[2].den == 192
    assert out[2].ewma == out[2].num / (out[2].den * 100)


def test_resample_single_event_bar_ohlc_all_equal(spark):
    from genesapi_cli_spark.registry import REGISTRY
    import os
    import tempfile

    rows = [(1, 86_400_000_000 * 3 + 5, 7, "view", 3.25)]
    df = _events(spark, rows).withColumn(
        "ts", F.timestamp_micros(F.col("ts_us"))
    ).select("event_id", "ts", "user_id", "event_type", "value")
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        out = REGISTRY["q_time_resample"].fn(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r.day_idx == 3
    assert r.open == r.high == r.low == r.close == 3.25
    assert r.n_events == 1


def test_rolling_median_interpolates_even_frames(spark):
    from genesapi_cli_spark.registry import REGISTRY
    import os
    import tempfile

    rows = [
        (1, 1_000_000, 7, "view", 10.0),
        (2, 2_000_000, 7, "view", 20.0),
    ]
    df = _events(spark, rows).withColumn(
        "ts", F.timestamp_micros(F.col("ts_us"))
    ).select("event_id", "ts", "user_id", "event_type", "value")
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        out = {
            r.event_id: r.med_r4
            for r in REGISTRY["q_window_rolling_median"].fn(spark, d).collect()
        }
    assert out == {1: 10.0, 2: 15.0}


def test_csv_source_dialect(spark):
    from genesapi_cli_spark.sources.delimited import parse_csv_lines

    rows = {r.id: r for r in parse_csv_lines(spark).collect()}
    assert rows[2].name == "gadget, deluxe"
    assert rows[3].name == 'quoted "name"'
    assert rows[4].name is None and rows[4].qty is None and rows[4].price == 0.99
    assert rows[5].qty is None and rows[5].price is None
    assert rows[6].qty is None and rows[6].price == 5.0  # PERMISSIVE: field-null


def test_graph_triangle_counting_oriented(spark):
    """A 4-clique has exactly 4 triangles; the oriented join must count each
    once (no /6 correction, no double counting)."""
    from genesapi_cli_spark.operators.graph import copurchase_edges
    from pyspark.sql import functions as F

    # two orders sharing the 4-clique {1,2,3,4} -> all 6 edges reach support 2
    rows = [(o, p) for o in (10, 20) for p in (1, 2, 3, 4)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    edges = copurchase_edges(li)
    assert edges.count() == 6
    e1 = edges.select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    e2 = edges.select(F.col("pa").alias("b2"), F.col("pb").alias("c"))
    e3 = edges.select(F.col("pa").alias("a3"), F.col("pb").alias("c3"))
    tri = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .count()
    )
    assert tri == 4


def test_weighted_median_threshold_semantics(spark):
    """Weighted median = smallest price where cumulative qty reaches half the
    total: prices 1.00(x1), 2.00(x1), 3.00(x2) -> total 4, half 2, cum at
    2.00 is 2 -> median 200 cents (not 300)."""
    import os
    import tempfile

    from genesapi_cli_spark.registry import REGISTRY

    rows = [("A", 1.00, 1), ("A", 2.00, 1), ("A", 3.00, 2)]
    df = spark.createDataFrame(
        rows, "l_returnflag string, l_extendedprice double, l_quantity long"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
        out = REGISTRY["q_agg_weighted_median"].fn(spark, d).collect()
    assert len(out) == 1 and out[0].wmedian_cents == 200 and out[0].tot_qty == 4
