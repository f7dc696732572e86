"""Benchmark harness: run the bench query set (gate + rotated-out
extras) at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and print
ONE compact JSON line on stdout:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {<gate-set timings, 2 dp>}, "sf": ...}

The driver keeps only the last 2000 bytes of stdout, so the stdout line
carries the ≤50-entry gate subset (guard-fitted under 1900 bytes); the
FULL per-query map is written to ./bench_full.json and echoed to stderr.

Each query is materialized with a ``noop`` write (full execution, no
driver collect). First run of a session pays JVM/codegen warmup; a
throwaway warmup query is executed first so per-query numbers reflect
steady state.

Per-query numbers are the MEDIAN of ``$SPARK_GRAFT_BENCH_RUNS`` (default
3) interleaved passes, and the total is the sum of medians: this box is
shared, and single samples have been observed to swing 3-8x under
contention (round 2 recorded 23.8 s for a query that re-measured at
5.0 s). The passes are interleaved (run the whole suite, then run it
again) rather than back-to-back per query, so a contention burst lands
on different queries in different passes instead of poisoning all three
samples of one query.

Two churn defenses (round-10 verdict task 2): at least min(runs, 3)
passes ALWAYS run (a 2-sample median is a mean — BENCH_r10's corruption
mode), and every query whose plan crosses into Python workers gets a
no-op ``mapInPandas`` pool warm immediately before its timed sample, so
the recorded number measures the operator instead of Python worker
respawn after long JVM-only suite stretches. Each run's full result
also lands in a dated ``bench_runs/bench_full_<utc>.json`` so a
contaminated official run can be cross-examined later.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ue_big_data_project_spark import get_spark
from ue_big_data_project_spark.queries import bench_queries

# Plan-node markers for a query that crosses into Python workers. On a
# shared box, the 32-process Python worker pool decays while long
# JVM-only stretches of the suite run, so the next pandas-UDF query
# re-pays partial worker spawn — round-10's driver run recorded
# multimodal_jpeg at 22.2 s for a query that isolates at 1.2 s (the
# controlled probe in COVERAGE.md: cold 5.5 s / warm 1.3 s / 90 s-idle
# 2.7 s). Queries whose plans show these nodes get a no-op worker-pool
# warm immediately before each timed sample (round-10 verdict task 2).
_PY_PLAN_NODES = (
    "ArrowEvalPython",
    "BatchEvalPython",
    "MapInPandas",
    "MapInArrow",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
)

# Entries whose Python stages are invisible in the RETURNED plan (they
# run inside fn() behind a localCheckpoint barrier, a persisted-index
# fixture, or a streaming drain), so plan inspection under-detects
# them. Prefix match; keep in sync with the operator modules that call
# mapInPandas/pandas_udf (similarity, asof, sessions, multimodal,
# streaming).
_PY_HIDDEN_PREFIXES = (
    "knn_",
    "dedup_semantic",
    "dedup_embedding",
    "streaming_",
    "multimodal_",
    "dedup_image_",
    "dedup_video_",
)


def _plan_uses_python(df) -> bool:
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    except Exception:
        return True  # assume the worst: a spurious warm costs ~0.5 s
    return any(marker in plan for marker in _PY_PLAN_NODES)


def warm_python_workers(spark) -> None:
    """No-op mapInPandas across one task per core: respawns any
    reclaimed Python workers so the next pandas-UDF sample measures
    the operator, not worker spawn. ~0.5 s warm, ~6 s when the pool is
    actually cold — exactly the 5.5 s the churn signature added to
    round-10's recorded numbers."""
    n = spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, n).mapInPandas(
        lambda batches: batches, "id long"
    ).write.mode("overwrite").format("noop").save()


def isolate(name: str) -> None:
    """Triage mode (``SPARK_GRAFT_BENCH_ISOLATE=<query>``): run ONE
    query n times in a fresh, otherwise-idle session and print the
    median + every sample as one JSON line.

    Exists because three rounds in a row produced a false-regression
    scare (knn_cosine_lsh r4, multimodal_jpeg r5) whose cause was suite
    contention on a shared box, each triaged by hand-running isolated
    medians; this makes that triage a single command whose output can
    be pasted into the round artifacts (round-5 verdict task 7).
    """
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    # Default 5 isolated samples — the precedent set by the manual
    # lsh/jpeg triages recorded in COVERAGE.md.
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))
    spec = bench_queries().get(name)
    if spec is None:
        from ue_big_data_project_spark.queries import all_queries

        spec = all_queries().get(name)
    if spec is None:
        print(json.dumps({"error": f"unknown query {name!r}"}))
        sys.exit(2)
    spark = get_spark(app_name=f"bench-isolate-{name}")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    spark.createDataFrame([(1, "w")], "a int, b string").count()
    if name in (
        "knn_cosine_ivf_probe",
        "text_bm25_probe",
        "knn_cosine_ivf_appended",
    ):
        # Same contract as the suite: probe/append twins time ONLY the
        # operator, not their session-scoped index fixture.
        from ue_big_data_project_spark.queries.textops import (
            warm_session_indexes,
        )

        warm_session_indexes(spark, sf_dir)
    samples: list[float] = []
    for _ in range(runs):
        spark.catalog.clearCache()
        warm_python_workers(spark)
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        samples.append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps(
            {
                "metric": "engine_query_isolated_seconds",
                "query": name,
                "median": round(statistics.median(samples), 3),
                "samples": samples,
                "sf": sf,
            }
        )
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    isolate_q = os.environ.get("SPARK_GRAFT_BENCH_ISOLATE")
    if isolate_q:
        isolate(isolate_q)
        return
    spark = get_spark(app_name="bench")

    # Warmup: JVM + parquet footer caches + codegen + the first
    # createDataFrame conversion path (paid once per session).
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    spark.createDataFrame([(1, "w")], "a int, b string").count()

    # Pre-build the session-scoped scratch indexes the probe-only twins
    # query, so their timings measure ONLY the probe even when a single
    # pass runs (without this, pass 1 of knn_cosine_ivf_probe /
    # text_bm25_probe would pay the one-off index build, and a 1-pass
    # run would report build+probe as "probe latency").
    from ue_big_data_project_spark.queries.textops import (
        warm_session_indexes,
    )

    warm_session_indexes(spark, sf_dir)

    # Wall-clock budget: the FIRST min(runs, 3) passes always complete
    # (a median of 2 samples is a mean — one contention burst poisons
    # the recorded number, which is exactly what corrupted BENCH_r10;
    # round-10 verdict task 2 pins runs/query ≥ 3); extra passes
    # beyond 3 start only while under budget, so a caller with a hard
    # timeout still gets a full result line. Default raised 600 → 900
    # for the same reason: the set outgrew 600 s on a contended box.
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "900"))
    min_passes = min(runs, 3)
    started = time.perf_counter()

    queries = sorted(bench_queries().items())
    samples: dict[str, list[float]] = {name: [] for name, _ in queries}

    # Contention sentinel (round-6 verdict task 4): the same fixed
    # trivial query timed at suite START / MIDDLE / END of every pass.
    # Three rounds in a row produced false-regression scares whose
    # cause was shared-box contention; a sentinel that drifts 1.5×
    # within a pass explains a suite-wide drift without per-query
    # archaeology. The sentinel runs are EXTRA timings — they do not
    # replace the sentinel query's own interleaved suite samples.
    sentinel_name = "scan_filter_agg_kit"
    sentinel_spec = bench_queries().get(sentinel_name)
    sentinel_samples: list[list[float]] = []

    def time_sentinel() -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        sentinel_spec.fn(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        return round(time.perf_counter() - t0, 3)

    # One untimed sentinel execution: the first run of any plan pays
    # codegen (+ any cold parquet footers), which would show up as
    # deterministic "drift" in every round's first sample and mask the
    # contention signal the sentinel exists to expose.
    if sentinel_spec:
        time_sentinel()

    mid = len(queries) // 2
    passes = 0
    # name → does this query cross into Python workers? Learned from
    # the executed plan after each query's FIRST sample (plus the
    # hidden-stage prefix list): pass 1 runs unwarmed for
    # plan-detected entries, passes 2+ warm the pool immediately
    # before the timed sample, and the ≥3-pass median discards the
    # single possibly-churned pass-1 sample.
    uses_python: dict[str, bool] = {
        name: name.startswith(_PY_HIDDEN_PREFIXES) for name, _ in queries
    }
    for r in range(runs):
        if r >= min_passes and time.perf_counter() - started > budget:
            break
        pass_sentinel = [time_sentinel()] if sentinel_spec else []
        for i, (name, spec) in enumerate(queries):
            if sentinel_spec and i == mid:
                pass_sentinel.append(time_sentinel())
            # Each query measured from a clean cache state — intermediate
            # caches are per-query implementation details, not shared state.
            spark.catalog.clearCache()
            if uses_python[name]:
                warm_python_workers(spark)
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            samples[name].append(time.perf_counter() - t0)
            if r == 0 and not uses_python[name]:
                uses_python[name] = _plan_uses_python(df)
        if sentinel_spec:
            pass_sentinel.append(time_sentinel())
            sentinel_samples.append(pass_sentinel)
        # localCheckpoint blocks inside query implementations are freed
        # by the ContextCleaner only after the driver GCs the dropped
        # references; nudge it between passes so later passes don't run
        # against a storage layer full of dead blocks from ~70 queries.
        spark.sparkContext._jvm.System.gc()
        passes += 1

    timings = {
        name: round(statistics.median(ts), 3) for name, ts in samples.items()
    }
    total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    # Isolate medians for the heaviest entries (round-11 verdict task 7):
    # the official artifact has twice recorded box-contention numbers
    # that took a round of archaeology to acquit (multimodal_jpeg r10,
    # dedup_clusters_incremental r11). Re-measuring the top-N heaviest
    # entries back-to-back AFTER the suite — same session, cache
    # cleared, workers warmed, no interleaved neighbors — makes every
    # BENCH_rN self-documenting: suite-vs-isolate spread >> sentinel
    # drift means contention, not code. ~N×3×heaviest extra seconds;
    # disable with SPARK_GRAFT_BENCH_ISOLATES=0.
    n_isolates = int(os.environ.get("SPARK_GRAFT_BENCH_ISOLATES", "5"))
    isolates: dict[str, float] = {}
    bq = bench_queries()
    iso_names = sorted(timings, key=timings.get, reverse=True)[
        : max(n_isolates, 0)
    ]
    if n_isolates > 0:
        # Self-acquittal rule (round-12 verdict task 7): the official
        # artifact has repeatedly recorded contention outliers that
        # took a round of archaeology to acquit (multimodal_jpeg r10,
        # dedup_clusters_incremental r11, text_bm25_appended 16.1 s
        # suite vs 4.1 s isolate r12). Two extensions to the top-N:
        # (a) any entry whose suite MEDIAN exceeds 2× its own fastest
        # sample — with ≥3 interleaved passes that means at least two
        # passes ran >2× slower than the query demonstrably runs,
        # the within-run contention signature — gets an isolate row
        # (capped at 8 extra, heaviest first, so a fully-contended box
        # can't double the bench); (b) the round-12 watch entries
        # carry isolates unconditionally this round so their
        # acquittal/confirmation lands in the primary artifact.
        suspects = [
            name
            for name in sorted(timings, key=timings.get, reverse=True)
            if name not in iso_names
            and len(samples[name]) >= 2
            and timings[name] > 2 * min(samples[name])
        ][:8]
        watch = [
            n
            for n in ("text_bm25_appended", "multimodal_jpeg")
            if n in timings and n not in iso_names and n not in suspects
        ]
        iso_names = iso_names + suspects + watch
    for name in iso_names:
        iso: list[float] = []
        for _ in range(3):
            spark.catalog.clearCache()
            if uses_python.get(name):
                warm_python_workers(spark)
            t0 = time.perf_counter()
            bq[name].fn(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            iso.append(time.perf_counter() - t0)
        isolates[name] = round(statistics.median(iso), 2)

    # Round-13 rotation continuity (round-12 verdict task 2): report the
    # sum over the NEW gate-50 next to the sum over the round-12
    # gate-50. Both sets are fully contained in the bench set (which is
    # unchanged this round), so both sums come from this run's live
    # medians and the r12 perf series (r12-set sum 152.6 s driver at
    # drift 4.16 in BENCH_r12.json) stays directly comparable.
    from ue_big_data_project_spark.queries import GATE_ORDER, GATE_ORDER_R12

    gate_sum = round(
        sum(timings[n] for n in GATE_ORDER if n in timings), 3
    )
    gate_r12_sum = round(
        sum(timings[n] for n in GATE_ORDER_R12 if n in timings), 3
    )

    # The driver records only the LAST 2000 BYTES of stdout; round 4's
    # 79-query JSON line outgrew that and came back "parsed": null, so
    # 14 timings were invisible to the perf gate. The full per-query map
    # (every bench entry, 3-dp) therefore goes to a repo file + stderr,
    # and stdout ends with a compact line that is guaranteed to fit:
    # gate-set timings at 2 dp plus the suite totals.
    full = {
        "metric": "engine_query_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "runs_per_query": passes,
        "gate50_sum": gate_sum,
        "gate50_r12_sum": gate_r12_sum,
    }
    if isolates:
        full["isolates"] = isolates
    if sentinel_samples:
        flat = [s for p in sentinel_samples for s in p]
        full["sentinel"] = {
            "query": sentinel_name,
            # One [start, middle, end] triple per pass.
            "samples": sentinel_samples,
            # max/min across every sentinel sample: ~1.0 means a quiet
            # box; >1.5 means suite numbers drifted under contention.
            "drift": round(max(flat) / max(min(flat), 1e-9), 2),
        }
    here = os.path.dirname(os.path.abspath(__file__))
    full_path = os.path.join(here, "bench_full.json")
    with open(full_path, "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
        f.write("\n")
    # bench_full.json is a single mutable artifact — round 10's driver
    # run (contended box) overwrote the builder's recorded clean-box
    # series, which then survived only as COVERAGE.md prose. Every
    # pass ALSO lands in a dated file under bench_runs/ so a
    # contaminated run can be cross-examined later (round-10 verdict
    # "What's wrong" #3).
    runs_dir = os.path.join(here, "bench_runs")
    os.makedirs(runs_dir, exist_ok=True)
    stamp = time.strftime("%Y%m%d-%H%M%S", time.gmtime())
    with open(
        os.path.join(runs_dir, f"bench_full_{stamp}.json"), "w"
    ) as f:
        json.dump(full, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(full), file=sys.stderr)

    compact_queries = {
        name: round(statistics.median(samples[name]), 2)
        for name in sorted(GATE_ORDER)
        if samples.get(name)
    }
    line = ""
    n_gate = len(compact_queries)
    while True:
        line = json.dumps(
            {
                "metric": "engine_query_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": compact_queries,
                "sf": sf_val,
                "runs_per_query": passes,
                "gate50_sum": gate_sum,
                "gate50_r12_sum": gate_r12_sum,
                "isolates": isolates,
                "bench_n": len(timings),
                # Truncation must be detectable from stdout ALONE
                # (round-5 advice): a reader who sees dropped > 0 knows
                # to consult bench_full.json for the missing entries.
                "dropped": n_gate - len(compact_queries),
                "full": "bench_full.json",
            },
            separators=(",", ":"),
        )
        # Hard fit guard: stdout tail budget is 2000 bytes; leave slack
        # for the trailing newline and any wrapper prefix. Should never
        # trigger for the 50-entry gate (~1.6 KB) — drop the
        # alphabetically-last entries deterministically if it ever does.
        if len(line) <= 1900 or not compact_queries:
            break
        compact_queries.pop(sorted(compact_queries)[-1])
    print(line)


if __name__ == "__main__":
    main()
