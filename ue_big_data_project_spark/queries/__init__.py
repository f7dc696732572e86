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
# repeated it on the round-9 verdict's mandate (3 round-9-new
# incremental-dedup entries in — all 3 hashed green, CORRECTNESS_r10 —
# 3 multi-round-green entries out). ROUND 11 performs the rotation the
# round-10 verdict mandated (task 1): the ENTIRE 18-entry never-hashed
# pool — the 15 entries the verdict names (retention prunes, span
# dedup, SemDeDup, training shards, winnowing ×3, temperature mix,
# DSIR ×3, leakage split, resize, resample) plus the 3 it queued for
# "the same or next rotation" (video thumbnails, image dHash, banded
# image near-dup) — swaps IN to face the driver's independent sf0.01
# hash, and 18 multi-round-green entries (the four BM25 probe/search
# shapes, surprisal/KL, the variant parse twin, pagerank, the appended
# IVF composite, six sketch twins, the streaming HLL drain, heavy
# hitters, and the keyframe demux twin — each with an in-gate family
# anchor) swap OUT into BENCH_EXTRA. The bench SET grows by the 9
# in-rotating entries that were registry-only before (117 → 126);
# bench.py reports the r10-gate-50 and r11-gate-50 dict sums side by
# side this round so the perf series stays comparable; the gate
# re-freezes at this set from round 12. All rotated-out entries stay
# in all_queries(), the pytest oracle gate (tests/test_oracle.py,
# which always hash-checks the FULL registry against DuckDB), and the
# bench set. tests/test_gate.py pins the new set — editing GATE_ORDER
# again is a test failure, not a rotation.
#
# Every registry entry OUTSIDE the gate maps to an in-gate family
# anchor; the authoritative (test-enforced) mappings live in
# tests/test_gate.py::PROXIED (near-duplicate shapes / post-freeze
# additions) and ::ROTATED_OUT (driver-green rotations, rounds 3–11).
GATE_CAP = 50
GATE_ORDER = (
    # -- never driver-hashed: run first (round-10-new; round-11
    # rotation, round-10 verdict task 1). The round-10 LLM-pipeline
    # buildout — retention rewrites, span-level substring dedup,
    # SemDeDup, training-shard export, the winnowing family, DSIR
    # importance resampling, the leakage-aware split, temperature
    # mixing, the real-codec resize/resample transforms, video
    # thumbnails, and perceptual-hash image dedup — faces the driver's
    # independent sf0.01 hash for the first time. -----------------------
    "dedup_clusters_pruned",
    "dedup_jaccard_pruned",
    "dedup_span_ngrams",
    "dedup_semantic_prune",
    "pipeline_training_shards",
    "text_winnow",
    "dedup_winnow_pairs",
    "dedup_winnow_incremental",
    "pipeline_temperature_mix",
    "pipeline_dsir_sample",
    "pipeline_dsir_incremental",
    "streaming_dsir_scores",
    "pipeline_leakage_split",
    "multimodal_resize",
    "multimodal_wav_resample",
    "multimodal_video_thumbs",
    "dedup_image_dhash",
    "dedup_image_neardup",
    # -- first hashed (green) in round 10 --------------------------------
    "dedup_clusters_incremental",
    "streaming_dedup_clusters",
    "dedup_jaccard_incremental",
    # -- first hashed (green) in round 9 ---------------------------------
    # (multimodal_mp4_keyframes rotated out in ROUND 11 — see
    # _ROTATED_OUT_R11 below.)
    "cdc_merge_into",
    "streaming_cdc_merge",
    "streaming_cdc_merge_bucketed",
    "sketch_hll_cube",
    "sketch_join_size",
    "streaming_cms_tokens",
    # -- first hashed (green) in round 8 ---------------------------------
    # (six sketch twins, the streaming HLL drain, and the CMS heavy
    # hitters rotated out in ROUND 11 — see _ROTATED_OUT_R11 below.)
    "sketch_qhist_prices",
    "text_bm25_appended",
    "multimodal_mp4_frames",
    "pipeline_quantile_trim",
    "join_auto_strategy",
    # -- first hashed (green) in round 7 ---------------------------------
    # (the bm25 search/indexed/probe/hybrid shapes, pagerank, the
    # appended-IVF composite, the variant parse twin, and the
    # surprisal/KL text metrics rotated out in ROUND 11 — see
    # _ROTATED_OUT_R11 below.)
    "graph_triangle_parts",
    "cdc_scd2_history",
    "multimodal_png",
    "events_cube",
    "events_ewma",
    "pipeline_weighted_sample",
    "window_rank_kit",
    "multimodal_jpeg",
    "knn_cosine_ivf_probe",
    # -- first hashed (green) in round 4 ---------------------------------
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

# The round-10 gate set, kept verbatim so bench.py can report the
# old-gate-50 sum NEXT TO the new-gate-50 sum this round — the perf
# series (r10-set sum 95.2 s builder / 200.8 s driver-on-a-contended-
# box in BENCH_r10.json) stays directly comparable across the rotation
# (round-10 verdict task 1: "record BOTH bench sums"). Every entry is
# still benched (the bench set only GROWS this round), so the sum is
# computed from live medians, not replayed. (The round-9 set's
# crossover sums were recorded in BENCH_r10.json — gate50_r9_sum
# 95.2 s builder / 200.8 s driver vs r9's 94.1 — so the r9-set series
# is already closed.)
GATE_ORDER_R10 = (
    "dedup_clusters_incremental",
    "streaming_dedup_clusters",
    "dedup_jaccard_incremental",
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
    "text_repetition",
    "bloom_pruned_join",
    "streaming_asof_join",
    "q2_min_cost_supplier",
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

# Rotated out of the gate in ROUND 11 (the bm25/surprisal/KL/variant/
# pagerank/appended-IVF cohort driver-green r7–r10, the sketch cohort
# r8–r10, the keyframe demux twin r9–r10) to hand their slots to the
# 18-entry never-hashed round-10 pool — the rotation the round-10
# verdict mandated (task 1), following the r8/r9/r10 precedent. All
# stay benched every round (appended to BENCH_EXTRA below) and
# hash-checked by the full pytest oracle gate; their operator families
# keep in-gate anchors (tests/test_gate.py maps each: the BM25 shapes
# anchor on text_bm25_appended, the sketch twins on sketch_hll_cube /
# streaming_cms_tokens / sketch_qhist_prices, the IVF composite on
# knn_cosine_ivf_probe, the text metrics on text_repetition, the
# keyframe demux on multimodal_mp4_frames).
_ROTATED_OUT_R11 = (
    "text_bm25_search",
    "text_bm25_indexed",
    "text_bm25_probe",
    "text_hybrid_search",
    "text_surprisal",
    "text_source_kl",
    "text_heavy_hitters",
    "events_props_variant",
    "graph_pagerank_nations",
    "knn_cosine_ivf_appended",
    "sketch_hll_parts_per_flag",
    "sketch_kmv_custkeys",
    "sketch_kmv_overlap",
    "sketch_cms_tokens",
    "sketch_hll_merged_modes",
    "sketch_qhist_token_mass",
    "streaming_hll_distinct",
    "multimodal_mp4_keyframes",
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
    # Rotated out in ROUND 11 (see _ROTATED_OUT_R11 above): the 18
    # multi-round-green entries whose gate slots went to the 18-entry
    # never-hashed round-10 pool (the 9 of those that sat in this tuple
    # moved INTO the gate; the other 9 — the DSIR family, the leakage
    # split, resize/resample, video thumbnails, and the image dHash
    # pair — were registry-only before, so the bench set grows 117 →
    # 126 this round).
    *_ROTATED_OUT_R11,
    # Round-11-new (gate re-frozen at the round-11 set, so driver
    # evidence arrives via the local pytest oracle + the in-gate image
    # dHash/near-dup family anchors): the audio perceptual fingerprint
    # (Haitsma–Kalker band-energy sign bits over the sawtooth fixture,
    # group-dedup window) and its banded Hamming near-dup pairs
    # (lossless vs the brute-force oracle, the image precedent).
    "multimodal_audio_fp",
    "dedup_audio_neardup",
    # Round-11-new: video-level near-dup — per-frame thumbnail
    # signatures (demux ∘ decode ∘ resize, the in-gate video-thumbs
    # path) joined on the signature key with a ½-containment
    # threshold; brute-force oracle proves the join loses nothing.
    "dedup_video_neardup",
    # Round-11-new: the winnow family's streaming drain — 3 real
    # micro-batches into the bucket-sharded fingerprint index, then a
    # probe that must answer byte-for-byte like the one-shot build
    # (dedup_winnow_incremental's oracle SQL verbatim).
    "streaming_winnow_index",
    # Round-11-new: subword token accounting — deterministic BPE encode
    # against the frozen provenance-pinned merge table, one zero-shuffle
    # Arrow pass; oracle = nested replace chain per word.
    "text_bpe_tokens",
    # Round-11-new: packing budgeted in SUBWORD tokens — bpe_token_counts
    # composed into pack_sequences' one-shuffle concat-and-chunk layout.
    "pipeline_pack_bpe",
    # Round-11-new: the persisted fingerprint band index — the media
    # modalities' incremental near-dup screen (index half the corpus's
    # fingerprints, probe each increment; O(increment) appends,
    # nothing frozen).
    "dedup_image_fp_incremental",
    "dedup_audio_fp_incremental",
    # ... and its streaming drain (3 real micro-batches, probe ==
    # one-shot oracle verbatim).
    "streaming_fp_index",
    # ... and its retention path (prune to a keep set, probe survivors).
    "dedup_image_fp_pruned",
    # Round-11-new: image near-dup CLUSTERING — banded Hamming pairs
    # (including exact dups) under distributed CC, min-id labels; the
    # canonical-group composition retention/splits consume.
    "dedup_image_clusters",
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
