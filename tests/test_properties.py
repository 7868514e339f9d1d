"""Property-based tests (SURVEY.md §5.2.3) — hypothesis generates small
corpora; Spark checks algebraic invariants."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

WORD = st.text(alphabet="abcdefg", min_size=1, max_size=6)
DOC = st.lists(WORD, min_size=1, max_size=12).map(" ".join)

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(docs=st.lists(DOC, min_size=1, max_size=12))
@_slow
def test_dedup_idempotent(spark, docs):
    """dedup(dedup(x)) == dedup(x) for sha-based exact dedup."""
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], "doc_id long, text string")

    def dedup(d):
        return d.withColumn("sha", F.sha2("text", 256)).groupBy("sha").agg(
            F.min("doc_id").alias("doc_id"), F.first("text").alias("text")
        ).drop("sha")

    once = dedup(df).collect()
    twice = dedup(dedup(df)).collect()
    assert sorted(map(tuple, once)) == sorted(map(tuple, twice))
    assert len(once) == len({d for d in docs})


@given(
    xs=st.lists(st.integers(min_value=0, max_value=5), min_size=0, max_size=10),
    ys=st.lists(st.integers(min_value=0, max_value=5), min_size=0, max_size=10),
)
@_slow
def test_union_all_count_additive(spark, xs, ys):
    a = spark.createDataFrame([(v,) for v in xs], "v int") if xs else spark.range(0).select(
        F.col("id").cast("int").alias("v")
    )
    b = spark.createDataFrame([(v,) for v in ys], "v int") if ys else spark.range(0).select(
        F.col("id").cast("int").alias("v")
    )
    assert a.unionByName(b).count() == len(xs) + len(ys)


@given(vals=st.lists(st.floats(min_value=-100, max_value=100, allow_nan=False), min_size=4, max_size=12))
@_slow
def test_topk_subset_of_group(spark, vals):
    """Window top-k rows are a subset of the group's rows and k-bounded."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(i % 2, i, v) for i, v in enumerate(vals)], "g int, k int, v double"
    )
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), "k")
    top = df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)
    per_group = {r.g: r["count"] for r in top.groupBy("g").count().collect()}
    assert all(c <= 2 for c in per_group.values())
    src = {(r.g, r.k) for r in df.collect()}
    assert {(r.g, r.k) for r in top.collect()} <= src
