"""Query registry.

Every implemented operator from SURVEY §2 (plus the LLM-pipeline
extensions) is exposed here as a named query over the driver's testdata
tables, paired with the ANSI-SQL oracle DuckDB runs on the same parquet.

Cross-engine determinism conventions (so value-hashes match):

- **Sums of doubles go through DECIMAL**: float addition is
  order-dependent and Spark/DuckDB partition differently, so every SUM
  casts its per-row term to ``DECIMAL(18,4)`` (exact, associative), then
  the exact total is cast back to double and rounded. AVG is expressed as
  decimal-sum / count explicitly.
- **Timestamps leave as epoch micros** (``unix_micros`` / ``epoch_us``)
  or formatted strings — never raw timestamp columns, whose tz/precision
  rendering differs between engines.
- **Every computed column is aliased identically** in the Spark plan and
  the oracle SQL (driver hash compares by sorted column name).
- **Top-k orderings always carry a unique tie-breaker key.**
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """A named query: Spark builder + optional DuckDB oracle SQL."""

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None


def all_queries() -> dict[str, QuerySpec]:
    from ue_big_data_project_spark.queries import events as _events
    from ue_big_data_project_spark.queries import multimodal as _multimodal
    from ue_big_data_project_spark.queries import (
        reference_registered as _reference,
    )
    from ue_big_data_project_spark.queries import sketches as _sketches
    from ue_big_data_project_spark.queries import textops as _textops
    from ue_big_data_project_spark.queries import tpch as _tpch

    out: dict[str, QuerySpec] = {}
    for mod in (_tpch, _events, _textops, _multimodal, _sketches, _reference):
        out.update(mod.QUERIES)
    return out


# The driver's CORRECTNESS gate hashes at most 50 queries per round, in
# registry order. Rounds 1–5 ROTATED this set so every registry query
# got a driver-green row (114/114 cumulative by round 5, zero fails);
# rounds 6–7 ran it FROZEN at the round-5 set (round-5 verdict task 2)
# so the r6 regression and r7 recovery compared identical query sets.
# ROUND 8 performed the one-time rotation the round-7 verdict mandated
# (13 round-7-new queries in — all 13 hashed green, CORRECTNESS_r08 —
# 13 ≥4-round-green entries out to BENCH_EXTRA). ROUND 9 repeated that
# precedent on the round-8 verdict's mandate (7 round-8-new in, all 7
# hashed green — CORRECTNESS_r09 — 7 ≥5-round-green out). ROUND 10
# repeats it once more on the round-9 verdict's mandate (task 1): the 3
# round-9-new incremental-dedup queries, which have only local
# pytest-oracle evidence, swap IN to face the driver's independent
# sf0.01 hash, and 3 multi-round-green entries (streaming_incremental_
# rollup green r3–r9, knn_cosine_ivf_indexed and sql_text_nation_revenue
# green r4–r9, each with an in-gate family anchor) swap OUT into
# BENCH_EXTRA. The bench SET is unchanged (gate ∪ BENCH_EXTRA is
# identical to round 9's), and bench.py reports the r9-gate-50 and
# r10-gate-50 dict sums side by side this round so the perf series
# stays comparable; the gate re-freezes at this set from round 11. All
# rotated-out entries stay in all_queries(), the pytest oracle gate
# (tests/test_oracle.py, which always hash-checks the FULL registry
# against DuckDB), and the bench set. tests/test_gate.py pins the new
# set — editing GATE_ORDER again is a test failure, not a rotation.
#
# Every registry entry OUTSIDE the gate maps to an in-gate family
# anchor; the authoritative (test-enforced) mappings live in
# tests/test_gate.py::PROXIED (near-duplicate shapes / post-freeze
# additions) and ::ROTATED_OUT (driver-green rotations, rounds 3–10).
GATE_CAP = 50
GATE_ORDER = (
    # -- never driver-hashed: run first (round-9-new; round-10 rotation,
    # round-9 verdict task 1). The engine's flagship incremental-dedup
    # paths — the component-bucketed persisted cluster map absorbing an
    # increment via contracted-graph CC, the streaming cluster-
    # maintenance sink, and the frozen-order exact-Jaccard probe index —
    # face the driver's independent sf0.01 hash for the first time. ----
    "dedup_clusters_incremental",
    "streaming_dedup_clusters",
    "dedup_jaccard_incremental",
    # -- first hashed (green) in round 9 ---------------------------------
    "cdc_merge_into",
    "streaming_cdc_merge",
    "streaming_cdc_merge_bucketed",
    "sketch_hll_cube",
    "sketch_join_size",
    "streaming_cms_tokens",
    "multimodal_mp4_keyframes",
    # -- first hashed (green) in round 8 ---------------------------------
    "sketch_hll_parts_per_flag",
    "sketch_kmv_custkeys",
    "sketch_kmv_overlap",
    "sketch_cms_tokens",
    "sketch_hll_merged_modes",
    "sketch_qhist_prices",
    "sketch_qhist_token_mass",
    "streaming_hll_distinct",
    "text_heavy_hitters",
    "text_bm25_appended",
    "multimodal_mp4_frames",
    "pipeline_quantile_trim",
    "join_auto_strategy",
    # -- first hashed (green) in round 7 ---------------------------------
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
    # -- first hashed (green) in round 4 ---------------------------------
    # (knn_cosine_ivf_indexed, sql_text_nation_revenue, and the round-3
    # streaming_incremental_rollup rotated out in ROUND 10 — see
    # _ROTATED_OUT_R10 below.)
    "text_repetition",
    "bloom_pruned_join",
    "streaming_asof_join",
    "q2_min_cost_supplier",
    # -- first hashed (green) in round 2 ---------------------------------
    "ref_q1_plane_bus_wait",
    "scan_filter_agg_kit",
    # -- long-green anchors (distinct operator shapes kept in-gate) ------
    "streaming_sessionize",
    "streaming_tumbling_window",
    "dedup_clusters",
)

# The round-9 gate set, kept verbatim so bench.py can report the
# old-gate-50 sum NEXT TO the new-gate-50 sum this round — the perf
# series (r9-set sum 94.1 s builder / 120.4 s driver in BENCH_r09.json)
# stays directly comparable across the rotation (round-9 verdict
# task 1: "record BOTH bench sums"). Every entry is still benched
# (gate ∪ BENCH_EXTRA is unchanged), so the sum is computed from live
# medians, not replayed. (The round-8 set's crossover sums were
# recorded in BENCH_r09.json — gate50_r8_sum 85.9 s builder / 100.9 s
# driver vs r8's 86.1 — so the r8-set series is already closed.)
GATE_ORDER_R9 = (
    "cdc_merge_into",
    "streaming_cdc_merge",
    "streaming_cdc_merge_bucketed",
    "sketch_hll_cube",
    "sketch_join_size",
    "streaming_cms_tokens",
    "multimodal_mp4_keyframes",
    "sketch_hll_parts_per_flag",
    "sketch_kmv_custkeys",
    "sketch_kmv_overlap",
    "sketch_cms_tokens",
    "sketch_hll_merged_modes",
    "sketch_qhist_prices",
    "sketch_qhist_token_mass",
    "streaming_hll_distinct",
    "text_heavy_hitters",
    "text_bm25_appended",
    "multimodal_mp4_frames",
    "pipeline_quantile_trim",
    "join_auto_strategy",
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
    "knn_cosine_ivf_indexed",
    "text_repetition",
    "bloom_pruned_join",
    "streaming_asof_join",
    "q2_min_cost_supplier",
    "sql_text_nation_revenue",
    "streaming_incremental_rollup",
    "ref_q1_plane_bus_wait",
    "scan_filter_agg_kit",
    "streaming_sessionize",
    "streaming_tumbling_window",
    "dedup_clusters",
)

# Rotated out of the gate in ROUND 8 (each ≥4 consecutive driver-green
# rounds) to hand their slots to the 13 round-7-new entries above — the
# one-time rotation the round-7 verdict mandated. All stay benched every
# round (appended to BENCH_EXTRA below, so the bench SET is identical to
# round 7's) and hash-checked by the full pytest oracle gate; their
# operator families keep in-gate anchors (tests/test_gate.py maps each).
_ROTATED_OUT_R8 = (
    "q8_market_share",
    "q10_returned_revenue",
    "q13_order_count_distribution",
    "q18_large_orders",
    "semi_anti_join_kit",
    "text_nlp_kit",
    "knn_cosine_lsh",
    "dedup_ngram_jaccard",
    "dedup_incremental",
    "asof_first_ship",
    "window_top1_per_order",
    "pipeline_pack_sequences",
    "pipeline_stratified_sample",
)

# Rotated out of the gate in ROUND 9 (each ≥5 consecutive driver-green
# rounds: r4–r8, or r3–r8 for the interval join) to hand their slots to
# the 7 round-8-new entries — the rotation the round-8 verdict mandated
# (task 1), following the round-8 precedent exactly. All stay benched
# every round (appended to BENCH_EXTRA below, so the bench SET is
# identical to round 8's) and hash-checked by the full pytest oracle
# gate; their operator families keep in-gate anchors (tests/test_gate.py
# maps each).
_ROTATED_OUT_R9 = (
    "multimodal_wav",
    "multimodal_bmp",
    "multimodal_video_frames",
    "pipeline_profile",
    "events_resample",
    "pipeline_scrub_boilerplate",
    "streaming_interval_join",
)

# Rotated out of the gate in ROUND 10 (streaming_incremental_rollup
# driver-green r3–r9, the other two r4–r9) to hand their slots to the 3
# round-9-new incremental-dedup entries — the rotation the round-9
# verdict mandated (task 1), following the r8/r9 precedent exactly. All
# stay benched every round (appended to BENCH_EXTRA below, so the bench
# SET is identical to round 9's) and hash-checked by the full pytest
# oracle gate; their operator families keep in-gate anchors
# (tests/test_gate.py maps each: the windowed-rollup family anchors on
# streaming_tumbling_window, the IVF family on knn_cosine_ivf_probe /
# knn_cosine_ivf_appended, the grouped-agg family on
# scan_filter_agg_kit).
_ROTATED_OUT_R10 = (
    "streaming_incremental_rollup",
    "knn_cosine_ivf_indexed",
    "sql_text_nation_revenue",
)

# Rotated out of the gate in earlier rounds (driver-green) — but still
# BENCHED every round via bench_queries(), so per-query deltas stay
# directly comparable across rounds even as the correctness gate
# rotates (the round-3 verdict asked for a stable bench set).
BENCH_EXTRA = (
    "q1_pricing_summary",
    "events_rollup",
    "theta_join_next_error",
    "pipeline_split",
    "pipeline_corpus_stats",
    "dedup_exact",
    "knn_cosine_ivf",
    "q3_shipping_priority",
    "q5_region_revenue",
    "pipeline_prep_documents",
    "salted_hot_key_agg",
    # Rotated out mid-round-4 (driver-green r2+r3) to hand slots to the
    # new q2/q4 and the first gating of pipeline_scrub_boilerplate; the
    # real-codec trio and the lsh/pq/ivf knn entries cover the families.
    "multimodal_features",
    "multimodal_frames",
    "knn_cosine_brute",
    "q9_product_profit",
    "interval_overlap_join",
    "q20_dominant_part_suppliers",
    # Rotated out in round 5 (driver-green >= 2 rounds each) to hand
    # slots to the 13 never-hashed round-4 entries now leading the gate.
    "knn_cosine_pq",
    "pipeline_chunk_documents",
    "q11_important_parts",
    "pipeline_contamination",
    "pipeline_upsert_corpus",
    "pipeline_source_quota",
    "ref_q2_affluence",
    "ref_q3_bus_positions",
    "ref_q4_bike_occupancy",
    "ref_wind_rolling_avg",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_embedding_cosine",
    # Rotated out mid-round-5 (driver-green r4, near-duplicate shapes
    # whose family kits stay in-gate) to hand slots to the 5
    # round-5-new entries, so the ENTIRE registry is driver-hashed this
    # round and the gate can freeze.
    "text_langid",
    "text_tokens",
    "text_fingerprint",
    "events_pivot",
    "q4_order_priority",
    # Rotated out in ROUND 8 (see _ROTATED_OUT_R8 above): the 13
    # multi-round-green entries whose gate slots went to the round-7-new
    # queries. Benched every round, so the bench set is unchanged.
    *_ROTATED_OUT_R8,
    # Rotated out in ROUND 9 (see _ROTATED_OUT_R9 above): the 7
    # multi-round-green entries whose gate slots went to the 7
    # round-8-new queries (which moved OUT of this tuple and INTO the
    # gate — the bench set is unchanged).
    *_ROTATED_OUT_R9,
    # Rotated out in ROUND 10 (see _ROTATED_OUT_R10 above): the 3
    # multi-round-green entries whose gate slots went to the 3
    # round-9-new incremental-dedup queries (which moved OUT of this
    # tuple and INTO the gate — the bench set is unchanged).
    *_ROTATED_OUT_R10,
    # Round-10-new (gate frozen at the round-10 set, so driver evidence
    # arrives via the local pytest oracle + the in-gate incremental
    # anchors): RETENTION paths — the cluster map pruned to a keep set
    # (oracle = full closure over the half corpus, filtered AFTER the
    # closure, pinning both the row shed and the label freeze) and the
    # Jaccard probe index pruned then probed (oracle = full pair SQL
    # restricted to surviving endpoints with ≥1 probe endpoint).
    "dedup_clusters_pruned",
    "dedup_jaccard_pruned",
    # Round-10-new: SPAN-level substring dedup (Lee et al. 2022) — the
    # fourth dedup granularity (whole-doc exact/minhash/jaccard/simhash
    # → sub-document spans): duplicated 5-token windows merged into
    # maximal spans, stripped, and hash-pinned via md5 of the
    # reconstructed remainder.
    "dedup_span_ngrams",
    # Round-10-new: SemDeDup (Abbas et al. 2023) — semantic near-dup
    # pruning scoped to deterministic k-means cells (paraphrase-level
    # duplicates lexical dedup cannot see); oracle = the shared
    # Lloyd-chain replay + within-cell lowest-id-wins pruning.
    "dedup_semantic_prune",
    # Round-10-new: deterministic global shuffle + training-shard
    # manifest (the export last-mile) — md5 shard/order, distributed
    # position-weighted order fingerprint, one shard-key shuffle.
    "pipeline_training_shards",
    # Round-10-new: WINNOWING (Schleimer et al., SIGMOD 2003) — the
    # MOSS robust local fingerprint: per-doc selection is zero-shuffle
    # array HOFs; pairs = sparse inverted-index join over selected
    # hashes with a stop-fingerprint cap.
    "text_winnow",
    "dedup_winnow_pairs",
    # Round-10-new: the FOURTH persisted-index family — bucket-sharded
    # winnow fingerprint index with df DELTA rows (aggregate-on-read:
    # nothing frozen, no staleness audit needed), one-sided probe ==
    # full rebuild row-for-row (oracle CTE scoped to the union corpus).
    "dedup_winnow_incremental",
    # Round-10-new: temperature-flattened domain mixing at T=2 (rates
    # DERIVED from corpus counts — sqrt keeps the threshold
    # bit-identical cross-engine, unlike a libm pow).
    "pipeline_temperature_mix",
)

# BENCH_EXTRA must stay disjoint from the gate and duplicate-free, or
# the bench-set size reported in docs drifts from the real entry count
# (round-4 advice).
assert len(set(BENCH_EXTRA)) == len(BENCH_EXTRA), "duplicate in BENCH_EXTRA"
assert not set(BENCH_EXTRA) & set(GATE_ORDER), "BENCH_EXTRA overlaps gate"


def gate_queries() -> dict[str, QuerySpec]:
    """The ≤50-entry, ordered query set handed to the driver's
    CORRECTNESS gate (``__spark_entry__.queries()``); a strict subset of
    :func:`all_queries`, which the local pytest gate runs in full."""
    registry = all_queries()
    assert len(GATE_ORDER) <= GATE_CAP, (
        f"gate has {len(GATE_ORDER)} entries; the driver hashes only "
        f"{GATE_CAP} per round"
    )
    return {name: registry[name] for name in GATE_ORDER}


def bench_queries() -> dict[str, QuerySpec]:
    """The bench.py set: the gate plus the round-4-rotated-out entries,
    so per-query timings stay comparable across rounds even when the
    correctness gate rotates."""
    registry = all_queries()
    return {name: registry[name] for name in GATE_ORDER + BENCH_EXTRA}
