"""Physical-plan assertions (SURVEY.md §4.2): pushdown, pruning, broadcast,
top-k — the properties that make these plans survive a 100× scale-up."""

from __future__ import annotations

import genesapi_cli_spark
from pyspark.sql import functions as F

from genesapi_cli_spark.plans.inspect import assert_in_plan, formatted_plan
from genesapi_cli_spark.registry import REGISTRY

from .conftest import ORACLE_SF_DIR

genesapi_cli_spark.load_all()


def _df(spark, name):
    return REGISTRY[name].fn(spark, ORACLE_SF_DIR)


def test_pruned_scan_pushes_filter_and_prunes_columns(spark):
    plan = assert_in_plan(_df(spark, "q_scan_pruned"), "PushedFilters")
    assert "EqualTo(o_orderstatus,F)" in plan
    # only the two referenced columns are read
    assert "o_totalprice" not in plan and "o_custkey" not in plan


def test_q6_pushes_range_predicates(spark):
    plan = formatted_plan(_df(spark, "q_filter_range"))
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_quantity,25.0)" in plan


def test_broadcast_join_is_broadcast(spark):
    assert_in_plan(_df(spark, "q_join_broadcast"), "BroadcastHashJoin")


def test_topk_is_take_ordered(spark):
    assert_in_plan(_df(spark, "q_limit_topk"), "TakeOrderedAndProject")


def test_theta_join_not_cartesian(spark):
    plan = formatted_plan(_df(spark, "q_join_theta"))
    assert "CartesianProduct" not in plan


def test_flagship_partial_aggregation_single_shuffle(spark):
    """Q1 must be scan → partial hash agg (map-side combine) → ONE exchange →
    final hash agg, with the date filter pushed to the parquet scan."""
    plan = formatted_plan(_df(spark, "q_agg_pricing_summary"))
    assert "partial_sum" in plan  # map-side combine before the shuffle
    assert plan.count("Exchange (") == 1  # tree node; detail section spells "(n) Exchange"
    assert "LessThanOrEqual(l_shipdate" in plan  # pushed, not post-scan


def test_multiway_broadcasts_dims(spark):
    """TPC-H Q5 shape: region/nation (tiny dims) must broadcast; the plan
    must not contain a cartesian product."""
    plan = formatted_plan(_df(spark, "q_join_multiway"))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_correlated_subquery_decorrelates(spark):
    """Catalyst must rewrite the correlated scalar subquery to an aggregate
    + join — no per-row subquery execution node in the physical plan."""
    plan = formatted_plan(_df(spark, "q_subquery_correlated"))
    assert "HashAggregate" in plan
    assert "Join" in plan


def test_simhash_single_wide_aggregation(spark):
    """The 32 bit-vote sums must run as ONE aggregation (single exchange for
    the doc-level agg after the spread repartition), not 32 passes."""
    plan = formatted_plan(_df(spark, "q_dedup_simhash"))
    # one shuffle for spread(doc_id), one for the (doc,term) tf agg; the
    # doc-level 32-way agg reuses the tf partitioning (no third exchange
    # before the window's own exchange)
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan


def test_ann_bucket_join_is_equi(spark):
    """The LSH ANN query must join on the bucket id (equi-join), never a
    cartesian pair space."""
    plan = formatted_plan(_df(spark, "q_sim_ann_lsh"))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_sample_hash_scans_once(spark):
    """The deterministic sample is a pure predicate over one scan — no join,
    no extra exchange beyond the final aggregation."""
    plan = formatted_plan(_df(spark, "q_sample_hash"))
    assert "Join" not in plan
    assert plan.count("Exchange (") == 1  # only the final agg shuffles
    assert "partial_count" in plan  # map-side combine below the exchange


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key must SortMergeJoin with no
    Exchange — the co-located-join layout that makes repeated 100 TB joins
    shuffle-free."""
    from genesapi_cli_spark.io import load, write_bucketed
    from genesapi_cli_spark.plans.inspect import formatted_plan

    orders = load(spark, ORACLE_SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    li = load(spark, ORACLE_SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "b_orders", "o_orderkey", 8, str(tmp_path / "b_orders"))
    write_bucketed(li, "b_lineitem", "l_orderkey", 8, str(tmp_path / "b_lineitem"))
    # at sf0.01 the small side would auto-broadcast; hint MERGE to exercise
    # the layout the buckets exist for (at 100 TB neither side broadcasts)
    joined = spark.table("b_orders").hint("merge").join(
        spark.table("b_lineitem"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    plan = formatted_plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # bucket layout replaces the shuffle
    # result sanity: same row count as the plain join
    plain = orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
    assert joined.count() == plain.count()
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_ivf_plan_broadcasts_and_combines_mapside(spark):
    """IVF assignment must broadcast the tiny centroid table (nested-loop,
    never a shuffled cross join) and collapse the 8x argmax partials
    map-side before the per-vector shuffle."""
    plan = formatted_plan(_df(spark, "q_sim_ivf"))
    assert "BroadcastNestedLoopJoin" in plan
    assert "partial_max" in plan or "partial_first" in plan


def test_range_join_is_broadcast_hash_not_bnl(spark):
    """Bucket expansion must turn the interval join into a hash equi-join:
    no BroadcastNestedLoop anywhere, and the residual range predicate stays
    a post-join filter, not a join loop."""
    plan = formatted_plan(_df(spark, "q_join_range"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_sessionize_single_sort_for_both_windows(spark):
    """lag + running-sum share (partition, order): ONE exchange on user_id
    and no second sort pass."""
    plan = formatted_plan(_df(spark, "q_window_sessionize"))
    assert plan.count("Exchange (") <= 2  # user_id shuffle + final single-partition agg
    assert plan.count("Sort (") <= 2  # window sort (+ at most the agg's)


def test_firstlast_single_window_exec(spark):
    """All four window functions + rn must evaluate in one Window exec
    over one shuffle."""
    plan = formatted_plan(_df(spark, "q_window_firstlast"))
    assert plan.count("Exchange (") == 1


def test_skew_salted_join_is_shuffle_hash(spark):
    """The salted join must honor the SHUFFLE_HASH hint (models the
    both-sides-large case) — not fall back to sort-merge or nested loop."""
    plan = formatted_plan(_df(spark, "q_join_skew_salted"))
    assert "ShuffledHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_stratified_sample_filter_before_agg(spark):
    """The hash predicate must evaluate scan-side (a Filter under the
    partial agg), so sampled-out rows never reach the aggregate shuffle.
    Two exchanges are expected: the spread() round-robin repartition that
    parallelizes the single-row-group local scan, plus the aggregate — the
    filter must sit between them, never after the agg exchange."""
    plan = formatted_plan(_df(spark, "q_sample_stratified"))
    assert "partial_count" in plan or "partial_sum" in plan
    assert plan.count("Exchange (") == 2


def test_quantized_sim_is_broadcast_hash_join(spark):
    """Label-blocked quantized join must broadcast the tiny query side —
    no sort-merge, no nested loop; int dot stays in codegen."""
    plan = formatted_plan(_df(spark, "q_sim_quantized"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_gap_fill_aggregates_before_calendar(spark):
    """Densification must run over the DAILY aggregate (map-side combined),
    never re-shuffle raw events for the calendar join."""
    plan = formatted_plan(_df(spark, "q_window_gap_fill"))
    assert "partial" in plan  # daily agg is partial+final
    assert plan.count("Exchange (") <= 3


def test_argmax_single_exchange(spark):
    """max_by/min_by is one hash aggregate — no window, no sort, one
    shuffle of one row per group."""
    plan = formatted_plan(_df(spark, "q_agg_argmax"))
    assert plan.count("Exchange (") == 1
    assert "Window" not in plan


def test_null_safe_join_is_hash_join(spark):
    """eqNullSafe must plan as an equi (hash) join — a theta/nested-loop
    fallback would be catastrophic at scale."""
    plan = formatted_plan(_df(spark, "q_join_null_safe"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("BroadcastHashJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "SortMergeJoin" in plan
    )


def test_funnel_single_data_shuffle(spark):
    """Three stacked conditional-MIN windows must share ONE Exchange+Sort
    (the 2nd exchange is the tiny per-user→global agg, not raw data)."""
    plan = formatted_plan(_df(spark, "q_events_funnel"))
    assert plan.count("Window (") == 3
    assert plan.count("Sort (") == 1
    assert plan.count("Exchange (") == 2


def test_pack_sequences_single_shuffle(spark):
    """Prefix-sum packing + per-source agg share the source partitioning."""
    plan = formatted_plan(_df(spark, "q_pack_sequences"))
    assert plan.count("Exchange (") == 1


def test_distribution_windows_share_sort(spark):
    """rank/percent_rank/cume_dist/count over one partitioning: 1 shuffle."""
    plan = formatted_plan(_df(spark, "q_window_distribution"))
    assert plan.count("Exchange (") == 1
    assert plan.count("Sort (") == 1


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """Runtime bloom-filter join pruning: a selective dimension filter must
    inject bloom_filter_agg (build side) + might_contain (probe side) so the
    big fact scan drops non-joining rows BEFORE the shuffle — at 100 TB this
    is the difference between shuffling the whole fact table and ~the
    matching fraction. Thresholds here are forced because local testdata is
    tiny; on a cluster the defaults trigger on real selectivity."""
    from genesapi_cli_spark.io import load

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        sf = "/root/testdata/sf0.001"
        orders = load(spark, sf, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
        li = load(spark, sf, "lineitem")
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = formatted_plan(j)
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_spatial_grid_join_is_equi(spark):
    """The ε-box proximity join must plan as a HASH join on grid cells —
    the whole point of bucketing; a BroadcastNestedLoopJoin would be the
    quadratic plan the grid exists to avoid."""
    plan = formatted_plan(_df(spark, "q_join_spatial"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("BroadcastHashJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "SortMergeJoin" in plan
    )
