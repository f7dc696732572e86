"""The driver-facing gate set: ≤50 entries, subset of the registry,
never-hashed entries first, every registry entry either in the gate or
explicitly proxied by a gate entry."""

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
    "q10_returned_revenue": "q3_shipping_priority",
    "q12_priority_by_status": "scan_filter_agg_kit",
    "asof_bucketed_prev_click": "asof_first_ship",
    # Round-2 additions (gate was already at the 50-entry cap):
    "q8_market_share": "q7_volume_shipping",  # multi-join conditional agg
    "q11_important_parts": "q15_top_supplier",  # global-scalar threshold
    "q13_order_count_distribution": "outer_join_customer_orders",
    "q20_dominant_part_suppliers": "q17_small_quantity_revenue",
    "q9_product_profit": "q7_volume_shipping",  # multi-join derived-measure agg
    # Stream-stream join: temporal-predicate twin of the gate's batch
    # theta join; the streaming execution itself is pytest-drained.
    "streaming_interval_join": "theta_join_next_error",
    # Training-pipeline extensions: same operator families as their
    # gate twins (hash-bucket assignment / window running agg /
    # shingle-keyed inverted-index join).
    "pipeline_stratified_sample": "pipeline_split",
    "pipeline_pack_sequences": "moving_avg_order_price",
    "pipeline_contamination": "dedup_ngram_jaccard",
    # Binned range join: non-equi temporal join family, same as the
    # gate's theta/as-of entries (operators/interval.py).
    "interval_overlap_join": "theta_join_next_error",
    "pipeline_source_quota": "window_top1_per_order",  # per-group rank cap
    "pipeline_upsert_corpus": "window_top1_per_order",  # per-key latest-version
    # Continuous aggregate: same stateful windowed agg the gate runs as
    # streaming_tumbling_window, plus the CDC-upsert sink (pytest-drained).
    "streaming_incremental_rollup": "streaming_tumbling_window",

    "text_repetition": "text_stats",  # per-doc text metrics family
    # Incremental corpus screening: fingerprint groupBy + anti join,
    # the same families the gate runs as dedup_exact / semi_anti_join_kit.
    "dedup_incremental": "dedup_exact",
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
    for name in all_queries():
        if name in gate:
            continue
        proxy = PROXIED.get(name)
        assert proxy is not None, f"{name} neither in gate nor proxied"
        assert proxy in gate, f"{name}'s proxy {proxy} not in gate"


def test_gate_entries_all_have_oracles():
    # Since the ref_q3 walk oracle landed, every gate entry is fully
    # hash-checked — none falls back to the weaker rows-only check.
    for name, spec in gate_queries().items():
        assert spec.oracle, f"{name} has no DuckDB oracle"


def test_unhashed_entries_run_first():
    # Round-1 CORRECTNESS covered registry entries 1-50; the 13 entries
    # the driver has never hashed must lead the gate order.
    never_hashed = GATE_ORDER[:13]
    assert set(never_hashed) == {
        "ref_q1_plane_bus_wait",
        "ref_q2_affluence",
        "ref_q3_bus_positions",
        "ref_q4_bike_occupancy",
        "ref_wind_rolling_avg",
        "knn_cosine_brute",
        "knn_cosine_lsh",
        "knn_cosine_ivf",
        "multimodal_features",
        "multimodal_frames",
        "text_nlp_kit",
        "scan_filter_agg_kit",
        "semi_anti_join_kit",
    }
