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
    "text_langid": "text_nlp_kit",
    "text_tokens": "text_nlp_kit",
    "text_fingerprint": "text_nlp_kit",
    "q6_forecast_revenue": "scan_filter_agg_kit",
    "q14_promo_revenue": "scan_filter_agg_kit",
    "q19_or_predicates": "scan_filter_agg_kit",
    "semi_join_late_orders": "semi_anti_join_kit",
    "anti_join_small_customers": "semi_anti_join_kit",
    "events_tumbling_window": "streaming_tumbling_window",
    "events_sessionize": "streaming_sessionize",
    "dedup_simhash": "dedup_simhash_pairs",
    "events_hourly_by_type": "events_rollup",
    "cheapest_supplier_per_part": "window_top1_per_order",
    "q12_priority_by_status": "scan_filter_agg_kit",
    "asof_bucketed_prev_click": "asof_first_ship",
    "text_repetition": "text_nlp_kit",  # per-doc text metrics family
    # Persisted-index twin: identical oracle/answer as the in-flight
    # form; the pruning contract is scan-metric-tested in test_approx.
    "knn_cosine_ivf_indexed": "knn_cosine_ivf",
    # PQ/ADC: same ANN family; full-oracle-paired in the registry.
    "knn_cosine_pq": "knn_cosine_ivf",
    # Passage chunking: scan-side explode family, packing's upstream.
    "pipeline_chunk_documents": "pipeline_pack_sequences",
    # One-pass profiling: grouped-agg family (pipeline_corpus_stats).
    "pipeline_profile": "pipeline_corpus_stats",
}

# Rotated OUT of the gate in round 3 after two driver-green rounds
# (CORRECTNESS_r01 + r02); each names the gate entry covering the same
# operator family. All stay in all_queries() and the always-full pytest
# oracle gate (tests/test_oracle.py).
ROTATED_OUT = {
    "q15_top_supplier": "q5_region_revenue",  # scalar-subquery threshold + join-agg
    "q21_waiting_suppliers": "semi_anti_join_kit",  # exists/not-exists
    "q7_volume_shipping": "q5_region_revenue",  # multi-join agg
    "q17_small_quantity_revenue": "q18_large_orders",  # per-key agg subquery
    "q22_idle_rich_customers": "semi_anti_join_kit",  # anti-join + scalar avg
    "outer_join_customer_orders": "q13_order_count_distribution",  # left-outer
    "moving_avg_order_price": "pipeline_pack_sequences",  # running window agg
    "q16_supplier_variety": "semi_anti_join_kit",  # not-in + distinct count
    "events_set_ops": "scan_filter_agg_kit",  # union/intersect/except counts
    "events_percentiles": "events_rollup",  # grouped distribution agg
    "events_funnel": "events_rollup",  # conditional step agg
    "events_dedup_first": "dedup_exact",  # keyed first-occurrence dedup
    "events_props_json": "ref_q1_plane_bus_wait",  # parse/scalar family
    "text_scrub": "text_nlp_kit",  # regexp scalar family
    "text_stats": "text_nlp_kit",  # per-doc text metrics
    # Retired mid-round-3 to hand slots to knn_cosine_pq /
    # pipeline_chunk_documents (both r1+r2 driver-green):
    "haversine_knn": "knn_cosine_brute",  # distance top-k family
    "scalar_kit": "ref_q1_plane_bus_wait",  # X3-X10 scalar family
}


def test_gate_within_driver_cap():
    assert len(GATE_ORDER) <= GATE_CAP
    assert len(set(GATE_ORDER)) == len(GATE_ORDER)


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
    # CORRECTNESS_r01+r02 covered the rest of the registry; the 17
    # entries the driver has never hashed (15 pre-existing + 2 new in
    # round 3) must lead the gate order.
    never_hashed = GATE_ORDER[:17]
    assert set(never_hashed) == {
        "knn_cosine_pq",
        "pipeline_chunk_documents",
        "q8_market_share",
        "q9_product_profit",
        "q10_returned_revenue",
        "q11_important_parts",
        "q13_order_count_distribution",
        "q20_dominant_part_suppliers",
        "interval_overlap_join",
        "streaming_interval_join",
        "streaming_incremental_rollup",
        "dedup_incremental",
        "pipeline_pack_sequences",
        "pipeline_contamination",
        "pipeline_upsert_corpus",
        "pipeline_stratified_sample",
        "pipeline_source_quota",
    }
