"""Shuffle-budget regression guard for every headline query.

Each operator's docstring documents the shuffles its semantics force;
this test pins that budget as a NUMBER, counted on the physical-plan
tree (``ops.observe.shuffle_count`` — tree walk, not string grep:
``toString`` re-prints cached lineage once per cache consumer, so
slot-using queries' text wildly overcounts). A refactor that adds an
exchange — a lost broadcast, a window that stopped sharing its
partitioning, a join that re-shuffled an already-partitioned side —
fails here with the delta, BEFORE it shows up as a bench regression.

Budgets are exact current values, asserted as an upper bound; going
UNDER the budget is progress (update the table with the lower number
and the reason).
"""

from __future__ import annotations

import pytest

from building_energy_data_pipeline_spark import caching
from building_energy_data_pipeline_spark.ops.observe import shuffle_count
from building_energy_data_pipeline_spark.plans.queries import (
    HEADLINE,
    REGISTRY,
)

#: max ShuffleExchange nodes allowed per headline query (measured on
#: the cold-slot plan; broadcast exchanges excluded by design)
SHUFFLE_BUDGET = {
    "q01_pricing_summary": 2,
    "q02_filtered_scan": 0,
    "q03_top_revenue_orders": 1,
    "q08_unpivot_metrics": 2,
    "q09_nullsafe_pair_join": 1,
    "q25_hourly_rollup": 1,
    # r14: 3 → 1 — dropped the pinned bk repartition (the persist-slot
    # staging already shares the signature materialization; the pin
    # shuffled the exploded band rows once per self-join branch while
    # the planner broadcast one side anyway). The one remaining
    # exchange is the dropDuplicates on (id_a, id_b).
    "q28_minhash_lsh_pairs": 1,
    "q33_quality_scores": 0,
    "q34_ann_bruteforce": 2,
    "q129_semantic_dedup": 2,
    "q143_embedding_covariance": 0,
    "q150_power_iteration": 2,
    # r13: +2 — the conditional spread_scan fan-outs ahead of the
    # exact-cosine and IVF-PQ assignment folds (single-split inputs
    # only; no-op at warehouse scale). Bought −30-40% wall on both
    # branches: the interpreted folds previously ran on ONE task.
    "q154_ivf_pq_recall": 13,
    # bitext scale shape (r11, replaced q155 as the headline): two
    # map-only cell assignments + the cell equi-join feed the same
    # 3 keyed exchanges as the cross-join form (two k-NN denominator
    # windows over the slot-staged pair table + the algebraic top-1)
    "q260_bitext_margin_ivf": 3,
    "q165_quality_classifier": 1,
    "q36_asof_join": 1,
    "q45_rollup_acctbal": 1,
    "q48_range_join_bands": 1,
    "q187_local_supplier_volume": 1,
    "q169_scd2_history": 1,
    "q173_triangle_count": 8,
    "q176_srp_lsh": 0,
    "q177_point_in_time_join": 3,
    "q109_pagerank_step": 4,
    "q118_pagerank_train": 0,
    "q112_duplicate_spans": 3,
    "q130_segment_dedup": 2,
    "q148_bm25_retrieval": 1,
    "q149_winnowing_pairs": 5,
    "q164_inverted_index": 2,
    "q178_rrf_hybrid": 1,
    "q59_explode_tokens": 2,
    # r14: q63/q233/q245/q246/q247/q248 each −1 — dropped the
    # determinism-only trailing orderBy (range exchange + sort);
    # the driver/oracle comparison canonicalizes row order.
    "q63_map_functions": 2,
    "q65_tfidf_top_terms": 5,
    "q66_label_centroids": 1,
    "q83_sequence_packing": 1,
    "q91_quantized_topk": 2,
    # r14: 5 → 3 — same pinned-bk-repartition removal as q28 (the
    # remaining three: cutoff scalar agg, pair dropDuplicates, final
    # per-new-doc aggregate).
    "q90_incremental_dedup": 3,
    "q144_dsir_proxy": 4,
    "q105_merge_upsert": 2,
    "q216_product_profit": 1,
    "q226_waiting_orders": 2,
    # IVM: CDC fold + state agg + full-outer patch + dirty recompute
    "q233_incremental_rollup": 5,
    # greedy coverage: 3 chained rounds over the slot-persisted
    # shingle table (anti-join + gain fold + winner semi-join each)
    "q234_greedy_coverage": 14,
    # r8 at-scale swaps + IVM composition (VERDICT r7 #3/#7/#8):
    # customer fold agg (fact join broadcasts) + dim sketch/exact agg
    # — the stack unpivot is narrow and the threshold join broadcast
    "q245_rfm_approx_thresholds": 1,
    # per-day distinct + register fold + window merge + exact-WAU
    # audit branch (drops with the audit in production)
    "q246_wau_hll_window": 7,
    # q233's six + the rollup Expand aggregate over state rows
    "q247_ivm_rollup_cube": 6,
    # user-grain signup/purchase folds + cohort sketch agg; the
    # threshold join back is a broadcast (not counted by design)
    "q248_latency_approx_quantiles": 2,
    # codec family: scan -> repartition (spread the single metadata
    # split across slots before the Python stages — a production
    # media scan already has file-granular splits) -> ONE fused
    # synth+decode mapInPandas stage (r13: the second Python stage
    # and the determinism-only range-sort exchange are gone — guide
    # §4.1/§2.4); q255's per-frame explode happens INSIDE the Python
    # stage, never as a shuffle
    "q249_png_roundtrip": 1,
    "q254_jpeg_roundtrip": 1,
    "q255_mjpeg_video_sums": 1,
    "q256_adpcm_audio_stats": 1,
    "q257_gif_animation_sums": 1,
    # FLAC round-trip (round 10): the codec-stage metadata
    # repartition only (r13: fused, sort dropped — the q254 shape)
    "q259_flac_roundtrip": 1,
}


def test_budget_table_covers_every_headline_query():
    # a new headline entry must declare its budget when it ships
    assert set(SHUFFLE_BUDGET) == set(HEADLINE)


@pytest.mark.parametrize("name", sorted(SHUFFLE_BUDGET))
def test_shuffle_budget(spark, sf_dir, name):
    caching.release_caches()
    got = shuffle_count(REGISTRY[name].spark(spark, sf_dir))
    assert got <= SHUFFLE_BUDGET[name], (
        f"{name}: {got} shuffle exchanges, budget "
        f"{SHUFFLE_BUDGET[name]} — a broadcast was lost or a "
        f"partitioning stopped being reused"
    )
