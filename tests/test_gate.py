"""The driver-facing gate set: ≤50 entries, subset of the registry,
never-hashed entries first, every registry entry either in the gate or
explicitly proxied by a gate entry (or rotated out after going
driver-green, with the pytest oracle gate still covering it)."""

from __future__ import annotations

from ue_big_data_project_spark.queries import (
    GATE_CAP,
    GATE_ORDER,
    all_queries,
    gate_queries,
)

# Registry entries intentionally NOT in the gate, each with the gate
# entry that exercises the same operator (see queries/__init__.py).
PROXIED = {
    "q6_forecast_revenue": "scan_filter_agg_kit",
    "q14_promo_revenue": "scan_filter_agg_kit",
    "q19_or_predicates": "scan_filter_agg_kit",
    "semi_join_late_orders": "semi_anti_join_kit",
    "anti_join_small_customers": "semi_anti_join_kit",
    "events_tumbling_window": "streaming_tumbling_window",
    "events_sessionize": "streaming_sessionize",
    "dedup_simhash": "dedup_ngram_jaccard",
    "events_hourly_by_type": "streaming_incremental_rollup",
    "cheapest_supplier_per_part": "window_top1_per_order",
    "q12_priority_by_status": "scan_filter_agg_kit",
    "asof_bucketed_prev_click": "asof_first_ship",
    # Round-7-new, post-freeze (the gate cannot grow): demux + sampled
    # frame decode; the in-gate entry covers the frame-sampling shape
    # and the JPEG sample decode is in-gate via multimodal_jpeg.
    "multimodal_mp4_frames": "multimodal_video_frames",
    # Round-7-new: incremental index maintenance; probes through the
    # same bm25_topk_indexed path the in-gate entry exercises, and its
    # oracle is the identical full-corpus TEXT_BM25_SQL.
    "text_bm25_appended": "text_bm25_indexed",
    # Round-7-new cardinality sketches (post-freeze): grouped-agg
    # shapes over generated native expressions — the in-gate kit pins
    # the operator family; the estimator math itself is hash-checked
    # by the pytest oracle on every run.
    "sketch_hll_parts_per_flag": "scan_filter_agg_kit",
    "sketch_kmv_custkeys": "scan_filter_agg_kit",
    # Sidecar-merge family twin: incremental corpus maintenance is
    # in-gate via dedup_incremental.
    "sketch_hll_merged_modes": "dedup_incremental",
    # Token explode + bounded grouped agg — the text_nlp_kit family
    # shape; the counter math is hash-checked by the pytest oracle.
    "sketch_cms_tokens": "text_nlp_kit",
    # Sketch-join + 1-row scalar assembly — the haversine/scalar-attach
    # family; estimator integers hash-checked by the pytest oracle.
    "sketch_kmv_overlap": "scan_filter_agg_kit",
    # Grouped agg + rank-window shape, in-gate via the window kit.
    "sketch_qhist_prices": "window_rank_kit",
    # foreachBatch sidecar-ingest family — in-gate via the streaming
    # incremental rollup; the register math is pytest-oracle-checked.
    "streaming_hll_distinct": "streaming_incremental_rollup",
    # Scan + global agg + 1-row scalar attach — the scan/agg kit
    # family; the trim accounting is pytest-oracle-checked.
    "pipeline_quantile_trim": "scan_filter_agg_kit",
    # Equi-join + grouped agg — the q10/q13 family shape; the planner's
    # three strategies are semantics-identical (tests/test_skew.py) and
    # the result is pytest-oracle-checked.
    "join_auto_strategy": "q13_order_count_distribution",
    # Token explode + grouped count — the text_nlp_kit family shape;
    # pre-filter == naive equality pinned by tests/test_sketch.py.
    "text_heavy_hitters": "text_nlp_kit",
    # Grouped agg + CDF window + scalar attach — the window-kit family;
    # the weighted-counter math is pytest-oracle-checked.
    "sketch_qhist_token_mass": "window_rank_kit",
}

# Rotated OUT of the gate in round 3 after two driver-green rounds
# (CORRECTNESS_r01 + r02); each names the gate entry covering the same
# operator family. All stay in all_queries() and the always-full pytest
# oracle gate (tests/test_oracle.py).
ROTATED_OUT = {
    "q15_top_supplier": "q8_market_share",  # scalar-subquery threshold + join-agg
    "q21_waiting_suppliers": "semi_anti_join_kit",  # exists/not-exists
    "q7_volume_shipping": "q8_market_share",  # multi-join agg
    "q17_small_quantity_revenue": "q18_large_orders",  # per-key agg subquery
    "q22_idle_rich_customers": "semi_anti_join_kit",  # anti-join + scalar avg
    "outer_join_customer_orders": "q13_order_count_distribution",  # left-outer
    "moving_avg_order_price": "pipeline_pack_sequences",  # running window agg
    "q16_supplier_variety": "semi_anti_join_kit",  # not-in + distinct count
    "events_set_ops": "scan_filter_agg_kit",  # union/intersect/except counts
    "events_percentiles": "q13_order_count_distribution",  # grouped distribution agg
    "events_funnel": "scan_filter_agg_kit",  # conditional step agg
    "events_dedup_first": "dedup_incremental",  # keyed first-occurrence dedup
    "events_props_json": "ref_q1_plane_bus_wait",  # parse/scalar family
    "text_scrub": "text_nlp_kit",  # regexp scalar family
    "text_stats": "text_nlp_kit",  # per-doc text metrics
    # Retired mid-round-3 to hand slots to knn_cosine_pq /
    # pipeline_chunk_documents (both r1+r2 driver-green):
    "haversine_knn": "knn_cosine_lsh",  # distance top-k family
    "scalar_kit": "ref_q1_plane_bus_wait",  # X3-X10 scalar family
    # Rotated out in round 4 (driver-green r1-r3) for the last 7
    # never-hashed entries; all still benched via BENCH_EXTRA and
    # pytest-oracle-gated:
    "dedup_exact": "dedup_incremental",  # exact-fingerprint dedup
    "pipeline_split": "pipeline_stratified_sample",  # hash-split family
    "pipeline_corpus_stats": "pipeline_profile",  # one-pass profiling
    "events_rollup": "streaming_incremental_rollup",  # rollup family
    "q1_pricing_summary": "scan_filter_agg_kit",  # grouped multi-agg
    "theta_join_next_error": "streaming_interval_join",  # non-equi join
    "knn_cosine_ivf": "knn_cosine_ivf_indexed",  # IVF (indexed twin)
    # Rotated out mid-round-4 (driver-green r1-r3) to hand slots to the
    # real-codec multimodal_bmp / multimodal_video_frames:
    "q3_shipping_priority": "q10_returned_revenue",  # join+agg+top-k limit
    "q5_region_revenue": "q8_market_share",  # multi-join region agg
    "pipeline_prep_documents": "text_nlp_kit",  # native text filter+metrics
    "salted_hot_key_agg": "scan_filter_agg_kit",  # grouped multi-agg family
    # Rotated out mid-round-4 (driver-green r2+r3) to hand slots to
    # TPC-H q2/q4 and the first gating of pipeline_scrub_boilerplate:
    "multimodal_features": "multimodal_wav",  # real-codec features twin
    "multimodal_frames": "multimodal_video_frames",  # real-codec frames twin
    "knn_cosine_brute": "knn_cosine_lsh",  # cosine top-k family
    "q9_product_profit": "q8_market_share",  # multi-join grouped agg
    "interval_overlap_join": "streaming_interval_join",  # interval join
    "q20_dominant_part_suppliers": "q2_min_cost_supplier",  # correlated agg threshold
    # Rotated out in round 5 (driver-green >= 2 rounds each) to hand
    # slots to the 13 never-hashed round-4 entries; all still benched
    # via BENCH_EXTRA and pytest-oracle-gated:
    "knn_cosine_pq": "knn_cosine_ivf_indexed",  # quantizer-train + code-scored knn
    "pipeline_chunk_documents": "pipeline_scrub_boilerplate",  # per-doc text transform
    "q11_important_parts": "q2_min_cost_supplier",  # scalar threshold + join-agg
    "pipeline_contamination": "dedup_ngram_jaccard",  # n-gram overlap family
    "pipeline_upsert_corpus": "dedup_incremental",  # keyed latest-version upsert
    "pipeline_source_quota": "pipeline_weighted_sample",  # deterministic-hash draw
    "ref_q2_affluence": "ref_q1_plane_bus_wait",  # reference scalar/agg family
    "ref_q3_bus_positions": "ref_q1_plane_bus_wait",  # reference array-walk family
    "ref_q4_bike_occupancy": "ref_q1_plane_bus_wait",  # reference agg+sort family
    "ref_wind_rolling_avg": "streaming_tumbling_window",  # windowed agg + keyed dedup
    "dedup_minhash_lsh": "dedup_ngram_jaccard",  # banded candidate-pair family
    "dedup_simhash_pairs": "dedup_ngram_jaccard",  # signature candidate-pair family
    "dedup_embedding_cosine": "knn_cosine_lsh",  # cosine-similarity family
    # Rotated out mid-round-5 (driver-green r4) to hand slots to the 5
    # round-5-new entries so the whole registry is driver-hashed:
    "text_langid": "text_nlp_kit",  # standalone twin of the kit column
    "text_tokens": "text_nlp_kit",  # standalone twin of the kit column
    "text_fingerprint": "text_nlp_kit",  # standalone twin of the kit column
    "events_pivot": "events_cube",  # grouping-sets/pivot expand family
    "q4_order_priority": "semi_anti_join_kit",  # semi-join + grouped count
}


def test_gate_within_driver_cap():
    assert len(GATE_ORDER) <= GATE_CAP
    assert len(set(GATE_ORDER)) == len(GATE_ORDER)


def test_gate_is_frozen_at_round5_set():
    """From round 6 the gate is FROZEN (round-5 verdict task 2): the
    driver must hash the SAME 50 entries every round so round-over-round
    correctness and bench deltas compare identical query sets. Editing
    GATE_ORDER is now a deliberate act that requires updating this pin
    (and accepting that the delta baseline resets)."""
    import hashlib

    frozen = hashlib.sha256("\n".join(GATE_ORDER).encode()).hexdigest()
    assert len(GATE_ORDER) == 50
    assert frozen == (
        "c308a9e9f1e4f6a2b15165bbdce1cee5bc59364a414a0e89dcfc7e7f013dfa24"
    ), "GATE_ORDER changed — the gate is frozen from round 6"


def test_gate_is_registry_subset():
    registry = all_queries()
    missing = [n for n in GATE_ORDER if n not in registry]
    assert not missing, f"gate names not in registry: {missing}"


def test_every_registry_entry_gated_or_proxied():
    gate = set(GATE_ORDER)
    assert not (set(PROXIED) & set(ROTATED_OUT))
    for name in all_queries():
        if name in gate:
            continue
        proxy = PROXIED.get(name) or ROTATED_OUT.get(name)
        assert proxy is not None, f"{name} neither in gate nor proxied"
        assert proxy in gate, f"{name}'s proxy {proxy} not in gate"


def test_gate_entries_all_have_oracles():
    # Every gate entry is fully hash-checked — none falls back to the
    # weaker rows-only check.
    for name, spec in gate_queries().items():
        assert spec.oracle, f"{name} has no DuckDB oracle"


def test_unhashed_entries_run_first():
    # CORRECTNESS_r01-r04 covered the rest of the registry; the 18
    # entries the driver has never hashed (the 13-entry round-5
    # rotation pool the round-4 verdict named in task 2, plus the 5
    # round-5-new queries) must lead the gate. Once these hash green,
    # every registry entry is cumulatively driver-verified.
    never_hashed = GATE_ORDER[:18]
    assert set(never_hashed) == {
        "text_bm25_search",
        "text_bm25_indexed",
        "text_hybrid_search",
        "graph_pagerank_nations",
        "graph_triangle_parts",
        "cdc_scd2_history",
        "knn_cosine_ivf_appended",
        "multimodal_png",
        "events_cube",
        "events_props_variant",
        "events_ewma",
        "pipeline_weighted_sample",
        "window_rank_kit",
        "multimodal_jpeg",
        "text_surprisal",
        "text_source_kl",
        "knn_cosine_ivf_probe",
        "text_bm25_probe",
    }


def test_bench_stdout_line_fits_driver_tail():
    # The driver records only the last 2000 bytes of bench stdout
    # (BENCH_r04 overflowed and came back "parsed": null). Worst-case
    # compact line: every gate entry timed at 999.99 s plus the
    # envelope bench.py emits — must fit with newline slack.
    import json

    line = json.dumps(
        {
            "metric": "engine_query_suite_seconds",
            "value": 99999.999,
            "unit": "sec",
            "queries": {name: 999.99 for name in sorted(GATE_ORDER)},
            "sf": 0.1,
            "runs_per_query": 3,
            "bench_n": 99,
            "dropped": 50,
            "full": "bench_full.json",
        },
        separators=(",", ":"),
    )
    assert len(line) <= 1900, f"bench stdout line would be {len(line)} bytes"


def test_bench_set_superset_of_gate_and_r3_comparable():
    from ue_big_data_project_spark.queries import BENCH_EXTRA, bench_queries

    bench = bench_queries()
    assert set(GATE_ORDER) <= set(bench)
    # Every round-3 gate entry (the BENCH_r03 set) is still benched.
    assert set(BENCH_EXTRA) <= set(bench)
    assert not (set(BENCH_EXTRA) & set(GATE_ORDER))
