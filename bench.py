"""Benchmark harness: run the headline (gate) query set at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and print ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ...}

Each query is materialized with a ``noop`` write (full execution, no
driver collect). First run of a session pays JVM/codegen warmup; a
throwaway warmup query is executed first so per-query numbers reflect
steady state.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ue_big_data_project_spark import get_spark
from ue_big_data_project_spark.queries import gate_queries


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark(app_name="bench")

    # Warmup: JVM + parquet footer caches + codegen + the first
    # createDataFrame conversion path (paid once per session).
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    spark.createDataFrame([(1, "w")], "a int, b string").count()

    timings: dict[str, float] = {}
    for name, spec in sorted(gate_queries().items()):
        # Each query measured from a clean cache state — intermediate
        # caches are per-query implementation details, not shared state.
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "engine_query_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
