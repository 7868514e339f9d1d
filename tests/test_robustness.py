"""Empty-input robustness: every operator family must handle a zero-row lake
without exceptions (the first batch of a new pipeline, a fully-filtered
partition, a dry backfill window — all produce empty inputs at 100 TB)."""

from __future__ import annotations

import os

import pytest

from genesapi_cli_spark.io import TABLES
from genesapi_cli_spark.registry import REGISTRY

import genesapi_cli_spark

genesapi_cli_spark.load_all()

#: one representative per operator family (scan/join/agg/window/text/dedup/
#: similarity/funnel/pack/stream-transform) — full registry would be slow.
REPRESENTATIVES = [
    "q_scan_parquet",
    "q_join_inner",
    "q_join_null_safe",
    "q_agg_pricing_summary",
    "q_agg_corr",
    "q_agg_skewkurt",
    "q_window_running",
    "q_window_locf",
    "q_events_funnel",
    "q_pack_sequences",
    "q_text_entropy",
    "q_text_unigram_lm",
    "q_dedup_exact",
    "q_dedup_containment",
    "q_sim_cosine_topk",
    "q_sample_weighted",
    "q_vocab_coverage",
    # round-4 families
    "q_text_novelty",
    "q_dedup_stop_shingles",
    "q_stream_throttle",
    "q_embed_pca_power",
    "q_window_kalman",
    "q_agg_kmv_sketch",
    "q_agg_histogram_quantile",
    "q_agg_topk_mergeable",
    "q_feature_store_pit",
    "q_multimodal_patchify",
    "q_graph_reach2",
    "q_orders_double_charge",
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_lake")
    for t in TABLES:
        # raw read (not io.load): load() derives extra event columns, and the
        # empty lake must look like the driver's original files
        spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet").limit(0).write.mode(
            "overwrite"
        ).parquet(str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_query_survives_empty_lake(spark, empty_sf_dir, name):
    df = REGISTRY[name].fn(spark, empty_sf_dir)
    rows = df.collect()
    assert rows == [] or all(r is not None for r in rows)
