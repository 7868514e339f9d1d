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


@given(docs=st.lists(DOC, min_size=2, max_size=8))
@_slow
def test_jaccard_bounds_and_identity(spark, docs):
    """Registered n-gram Jaccard: every emitted pair score is in (0.2, 1.0];
    a duplicated doc always pairs with its copy at exactly 1.0."""
    import tempfile

    from genesapi_cli_spark.operators.dedup import q_dedup_ngram_jaccard

    rows = [(i, d, "xx") for i, d in enumerate(docs)]
    rows.append((len(docs), docs[0], "xx"))  # exact copy of doc 0
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string"
        ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        out = q_dedup_ngram_jaccard(spark, tmp).collect()
    scores = {(r.doc_a, r.doc_b): r.jaccard_r for r in out}
    assert all(0.2 < v <= 1.0 for v in scores.values())
    assert scores.get((0, len(docs))) == 1.0


@given(
    vals=st.lists(
        st.tuples(st.integers(0, 3), st.floats(0, 100, allow_nan=False)),
        min_size=1,
        max_size=40,
    )
)
@_slow
def test_salted_agg_equals_direct(spark, vals):
    """Two-stage salted aggregation must be exactly equal to the direct
    groupBy for any data (decimal partials make it order-independent)."""
    df = spark.createDataFrame(
        [(k, float(v), i) for i, (k, v) in enumerate(vals)], "k int, v double, uid long"
    )
    direct = {
        (r.k): (r.n, r.s)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(27,7)")).cast("double").alias("s"),
        )
        .collect()
    }
    salted1 = (
        df.withColumn("salt", F.pmod(F.xxhash64("uid"), F.lit(4)))
        .groupBy("k", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("v").cast("decimal(27,7)")).alias("pq"),
        )
    )
    salted = {
        (r.k): (r.n, r.s)
        for r in salted1.groupBy("k")
        .agg(F.sum("pn").alias("n"), F.sum("pq").cast("double").alias("s"))
        .collect()
    }
    assert salted == direct


@given(keys=st.lists(st.integers(0, 10_000), min_size=1, max_size=60, unique=True))
@_slow
def test_hash_sample_deterministic_subset(spark, keys):
    """The sha256 hash-sample picks a stable subset: rerunning yields the
    identical key set, and it is always a subset of the input."""
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    h = F.conv(F.substring(F.sha2(F.col("k").cast("string"), 256), 1, 8), 16, 10).cast("long")
    pick = lambda: {r.k for r in df.filter(h % 10 == 0).collect()}  # noqa: E731
    first, second = pick(), pick()
    assert first == second
    assert first <= set(keys)


@given(
    toks=st.lists(st.integers(min_value=1, max_value=4000), min_size=1, max_size=60),
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pack_sequences_invariants(spark, toks):
    """Contiguous-fill packing: bin ids start at 0, are contiguous, each doc
    lands in exactly one bin, and every bin boundary respects the running
    total (bin_id == exclusive-prefix-sum div budget)."""
    budget = 2048
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(toks)], "doc_id long, n_tokens long"
    )
    from pyspark.sql import Window

    w = (
        Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = df.withColumn(
        "bin_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / budget).cast("long"),
    ).collect()

    run = 0
    expect_bins = []
    for n in toks:
        expect_bins.append(run // budget)
        run += n
    got_bins = [r.bin_id for r in sorted(packed, key=lambda r: r.doc_id)]
    assert got_bins == expect_bins
    # bins start at 0 and are non-decreasing in doc order; gaps appear only
    # when a single doc exceeds the budget (it spans skipped bins)
    assert got_bins[0] == 0
    assert all(b2 >= b1 for b1, b2 in zip(got_bins, got_bins[1:]))


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10000),
            st.integers(min_value=0, max_value=10000),
        ),
        min_size=4,
        max_size=40,
        unique=True,
    )
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_zorder_preserves_rows_and_bounds(spark, pts):
    """Z-value layout: bijective over rows (no dup/loss), z fits in the
    interleaved bit budget, and equal points get equal z."""
    from genesapi_cli_spark.sources.layout import BITS, with_zvalue

    df = spark.createDataFrame(pts, "x long, y long")
    z = with_zvalue(df, ["x", "y"]).collect()
    assert len(z) == len(pts)
    zmax = 1 << (2 * BITS)
    seen = {}
    for r in z:
        assert 0 <= r["__z"] < zmax
        key = (r.x, r.y)
        if key in seen:
            assert seen[key] == r["__z"]
        seen[key] = r["__z"]


@given(vals=st.lists(st.integers(min_value=1, max_value=1000), min_size=1, max_size=20))
@_slow
def test_pythagorean_mean_ordering(spark, vals):
    """AM ≥ GM ≥ HM on any positive sample (equality iff all equal) — the
    invariant behind q_agg_means, checked on the same expressions."""
    df = spark.createDataFrame([(v,) for v in vals], "q int")
    row = df.agg(
        (F.sum(F.col("q").cast("bigint")).cast("double") / F.count(F.lit(1))).alias("am"),
        F.expr(
            "EXP(CAST(SUM(CAST(FLOOR(LN(q) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)"
            " / COUNT(*) / 1000000.0)"
        ).alias("gm"),
        (
            F.count(F.lit(1)).cast("double") * 1000000.0
            / F.sum((F.lit(1000000.0) / F.col("q")).cast("decimal(27,7)")).cast("double")
        ).alias("hm"),
    ).collect()[0]
    # the micro-snapped ln leaves RELATIVE slack: exp(ln(x) ± 5e-7) scales
    # the mean by (1 ± 5e-7), so tolerance must scale with magnitude.
    rel = 2e-6 * row.am + 1e-9
    assert row.am + rel >= row.gm >= row.hm - rel
    if len(set(vals)) == 1:
        assert abs(row.am - row.hm) < 1e-5 * row.am + 1e-9


@given(vals=st.lists(st.integers(min_value=0, max_value=10**6), min_size=10, max_size=40))
@_slow
def test_trimmed_mean_within_bounds_and_trim_count(spark, vals):
    """The 10% trimmed mean lies within [min, max], and the trim drops
    exactly floor(n/10) rows per side (q_agg_trimmed's rank-band rule)."""
    from pyspark.sql import Window

    df = spark.createDataFrame([(v,) for v in vals], "cents long")
    w = Window.orderBy("cents")
    ranked = df.select(
        "cents",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    kept = ranked.filter(
        (F.col("rk") * 10 > F.col("n")) & ((F.col("n") - F.col("rk")) * 10 >= F.col("n"))
    )
    import math

    n = len(vals)
    # rank-band rule: bottom drops floor(n/10), top drops ceil(n/10)
    assert kept.count() == n - (n // 10) - math.ceil(n / 10)
    if kept.count():
        row = kept.agg(F.avg("cents").alias("m")).collect()[0]
        assert min(vals) <= row.m <= max(vals)


@given(
    a=st.lists(st.floats(min_value=0, max_value=10, allow_nan=False), min_size=1, max_size=15),
    b=st.lists(st.floats(min_value=0, max_value=10, allow_nan=False), min_size=1, max_size=15),
)
@_slow
def test_ks_distance_bounds(spark, a, b):
    """The integer cross-multiplied KS distance is in [0, 1]; 0 iff the two
    samples are identical multisets (q_events_ks's statistic)."""
    from pyspark.sql import Window

    rows = [(float(v), 1, 0) for v in a] + [(float(v), 0, 1) for v in b]
    df = spark.createDataFrame(rows, "v double, da int, db int")
    pts = df.groupBy("v").agg(F.sum("da").alias("da"), F.sum("db").alias("db"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = pts.select(
        F.sum("da").over(w).alias("ca"), F.sum("db").over(w).alias("cb")
    )
    na, nb = len(a), len(b)
    d_num = cum.agg(
        F.max(F.abs(F.col("ca") * nb - F.col("cb") * na)).alias("d")
    ).collect()[0].d
    assert 0 <= d_num <= na * nb
    if sorted(a) == sorted(b):
        assert d_num == 0


@given(docs=st.lists(st.tuples(st.sampled_from(["de", "en", "fr"]), st.integers(0, 10**6)),
                     min_size=3, max_size=30))
@_slow
def test_balanced_sample_exact_floor(spark, docs):
    """Every class keeps exactly min-class-count rows under the sha256 rank
    rule (q_sample_balanced)."""
    from collections import Counter
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(i, lang) for i, (lang, _) in enumerate(docs)], "doc_id long, lang string"
    )
    floor_n = min(Counter(lang for lang, _ in docs).values())
    w = Window.partitionBy("lang").orderBy(F.sha2(F.col("doc_id").cast("string"), 256), "doc_id")
    kept = df.select("lang", F.row_number().over(w).alias("rk")).filter(
        F.col("rk") <= floor_n
    )
    per_lang = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(n == floor_n for n in per_lang.values())
