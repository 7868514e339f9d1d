"""Round-5 operator invariants that the data-driven oracle gate cannot
exercise: the floor-offset integer-division parity used by the graph
score queries on NEGATIVE numerators (the sf testdata's co-purchase graph
yields positive modularity/assortativity, so the sign-sensitive branch
never runs in check.py), plus structural invariants of the LTTB
downsampler and the bottom-k sampler."""

from __future__ import annotations

import math

import duckdb
import pytest

import genesapi_cli_spark
from genesapi_cli_spark.registry import REGISTRY

from .conftest import SMOKE_SF_DIR

genesapi_cli_spark.load_all()


@pytest.mark.parametrize(
    "num,den",
    [(-28, 36), (-1, 3), (-35, 36), (1, 3), (-36, 36), (0, 36), (29, 36)],
)
def test_floor_offset_div_parity_on_negative_numerators(spark, num, den):
    """q_graph_modularity / q_graph_assortativity divide a possibly-negative
    128-bit numerator by a positive denominator. Spark ``div`` truncates
    toward zero, DuckDB ``//`` floors — the queries pin both to FLOOR by
    adding 10^6*den before dividing and subtracting 10^6 after. Verify the
    offset expression equals math.floor on both engines across the sign
    range (including exact multiples, where floor == truncate)."""
    expected = math.floor(num * 1_000_000 / den)
    got_spark = spark.sql(
        f"SELECT cast(((cast({num} as decimal(38,0)) * 1000000"
        f" + 1000000 * cast({den} as decimal(38,0)))"
        f" div cast({den} as decimal(38,0))) - 1000000 as bigint) AS q"
    ).collect()[0][0]
    got_duck = duckdb.sql(
        f"SELECT CAST((({num}::HUGEINT * 1000000 + 1000000 * {den}::HUGEINT)"
        f" // {den}::HUGEINT) - 1000000 AS BIGINT)"
    ).fetchone()[0]
    assert got_spark == expected, f"spark {got_spark} != floor {expected}"
    assert got_duck == expected, f"duckdb {got_duck} != floor {expected}"
    # And confirm the UNOFFSET forms actually disagree on non-multiples —
    # i.e. the offset is load-bearing, not decorative.
    if num % den != 0 and num < 0:
        naive_spark = spark.sql(
            f"SELECT ({num} * 1000000) div {den}"
        ).collect()[0][0]
        assert naive_spark != expected


def test_lttb_emits_exactly_12_points_per_series(spark):
    rows = REGISTRY["q_time_lttb"].fn(spark, SMOKE_SF_DIR).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    assert by_type, "no series produced"
    for etype, pts in by_type.items():
        buckets = sorted(p.bucket for p in pts)
        assert buckets == list(range(12)), (etype, buckets)
        # endpoint rows carry area2 = 0 (kept by convention, not by area)
        end_areas = [p.area2 for p in pts if p.bucket in (0, 11)]
        assert end_areas == [0, 0]
        # x must be non-decreasing in bucket order (it's a downsample of a
        # time-ordered series)
        xs = [p.xs for p in sorted(pts, key=lambda p: p.bucket)]
        assert xs == sorted(xs)


def test_bottomk_is_exact_k_per_group_and_deterministic(spark):
    df = REGISTRY["q_sample_bottomk"].fn(spark, SMOKE_SF_DIR)
    rows = sorted(tuple(r) for r in df.collect())
    per_group: dict[str, int] = {}
    for source, _doc, rank, n_group in rows:
        per_group[source] = per_group.get(source, 0) + 1
        assert 1 <= rank <= 8
        assert n_group >= rank
    for source, n in per_group.items():
        assert n == 8, (source, n)
    # pure function of the key set: a second evaluation returns the same rows
    rows2 = sorted(tuple(r) for r in df.collect())
    assert rows == rows2
