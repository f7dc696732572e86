"""Benchmark harness: run the headline (gate) query set at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and print ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ...}

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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    spark = get_spark(app_name="bench")

    # Warmup: JVM + parquet footer caches + codegen + the first
    # createDataFrame conversion path (paid once per session).
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    spark.createDataFrame([(1, "w")], "a int, b string").count()

    # Wall-clock budget: the FIRST pass always completes (every query
    # gets a number); later passes start only while under budget, so a
    # caller with a hard timeout still gets a full result line.
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "600"))
    started = time.perf_counter()

    queries = sorted(bench_queries().items())
    samples: dict[str, list[float]] = {name: [] for name, _ in queries}
    passes = 0
    for r in range(runs):
        if r > 0 and time.perf_counter() - started > budget:
            break
        for name, spec in queries:
            # Each query measured from a clean cache state — intermediate
            # caches are per-query implementation details, not shared state.
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            samples[name].append(time.perf_counter() - t0)
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
    print(
        json.dumps(
            {
                "metric": "engine_query_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "runs_per_query": passes,
            }
        )
    )


if __name__ == "__main__":
    main()
