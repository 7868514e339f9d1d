"""Round-10 mechanism tests: the budgeted dedup-eval default, the
prefix-filter width-calibration ladder, the winnow packing clamp, and the
incremental-clusters split invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SMOKE_SF_DIR

SF001 = "/root/testdata/sf0.01"


def test_dedup_eval_budget_rate_derivation(spark):
    """The contract row's sampling rate must clamp to 1.0 (exact path)
    whenever pair_mass <= 2*budget — at sf0.01 pair_mass ≈ 3.7k, far below
    the 250k default, so blocks_sampled must equal blocks_total and the
    audit is exact. Shrinking the budget below half the pair mass must
    engage the sampled path (blocks_sampled < blocks_total) while keeping
    the 1-row certificate shape."""
    import genesapi_cli_spark
    from genesapi_cli_spark.registry import REGISTRY

    genesapi_cli_spark.load_all()
    q = REGISTRY["q_dedup_eval"].fn
    row = q(spark, SF001).collect()[0]
    assert row.blocks_sampled == row.blocks_total > 0
    spark.conf.set("spark.genesapi.dedup.eval.pair_budget", "100")
    try:
        sampled = q(spark, SF001).collect()[0]
    finally:
        spark.conf.unset("spark.genesapi.dedup.eval.pair_budget")
    assert sampled.blocks_total == row.blocks_total
    assert 0 < sampled.blocks_sampled < sampled.blocks_total
    assert sampled.n_pairs <= row.n_pairs


def test_prefix_filter_width_ladder(spark):
    """Calibration picks w=3 where 3-gram document frequencies stay rare
    (sf0.001/sf0.01) and widens on a saturated corpus. The explicit-width
    knob must bypass calibration entirely (legacy behavior)."""
    import genesapi_cli_spark
    from genesapi_cli_spark.registry import REGISTRY

    genesapi_cli_spark.load_all()
    q = REGISTRY["q_dedup_prefix_filter"].fn
    auto = {r.lang: (r.n_candidates, r.n_matches) for r in q(spark, SF001).collect()}
    spark.conf.set("spark.genesapi.pf.shingle", "3")
    try:
        fixed3 = {
            r.lang: (r.n_candidates, r.n_matches) for r in q(spark, SF001).collect()
        }
    finally:
        spark.conf.unset("spark.genesapi.pf.shingle")
    # sf0.01 is unsaturated at w=3, so auto == explicit w=3 exactly.
    assert auto == fixed3
    # a saturated corpus (every doc shares the same 3-gram space) must
    # widen: build one where w=3 has avg df >> 8 but w=5 is rare.
    rows = [
        (i, "en", " ".join("w%d" % ((i * 7 + k) % 9) for k in range(40)))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.withColumn("source", F.lit("s")).withColumn(
            "n_chars", F.length("text")
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = q(spark, d)
        # must complete without the quadratic blowup and produce the
        # certificate shape; the 9-word vocab saturates w=3 (9^3=729
        # shingles over 200*38 gram slots) AND w=5 (9^5=59049 > slots? no:
        # 7600 slots < 59049 -> w=5 is rare), so the ladder lands on 5.
        got = out.collect()
        assert {r.lang for r in got} == {"en"}


def test_winnow_pack_clamp_preserves_hash():
    """The 2^30 packing base must unpack h32 exactly even when the gram
    position exceeds the bound (the clamp degrades only the tie-break):
    verified directly on the packing expressions with positions straddling
    the bound."""
    from genesapi_cli_spark.operators.text import _WINNOW_POS_BOUND

    for h32 in (0, 1, 4294967295):
        for i in (1, _WINNOW_POS_BOUND - 1, _WINNOW_POS_BOUND, _WINNOW_POS_BOUND + 7):
            key = h32 * _WINNOW_POS_BOUND + max(_WINNOW_POS_BOUND - 1 - i, 0)
            assert key // _WINNOW_POS_BOUND == h32
            assert key >= 0


def test_clusters_incremental_split_invariance(spark):
    """The star-edge merge must equal the full recompute for ANY old/new
    split — here checked against q_dedup_clusters (full CC over the same
    pair relation) at the smoke scale."""
    import genesapi_cli_spark
    from genesapi_cli_spark.registry import REGISTRY

    genesapi_cli_spark.load_all()
    full = {
        (r.keeper_doc, r.n_docs, r.max_doc, r.n_dropped)
        for r in REGISTRY["q_dedup_clusters"].fn(spark, SMOKE_SF_DIR).collect()
    }
    inc = {
        (r.keeper_doc, r.n_docs, r.max_doc, r.n_dropped)
        for r in REGISTRY["q_dedup_clusters_incremental"]
        .fn(spark, SMOKE_SF_DIR)
        .collect()
    }
    assert inc == full
