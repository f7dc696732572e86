"""A/B the streaming state-store provider (RocksDB vs HDFS-backed).

Guide §1/§9: config choices are measured, not assumed. ``get_spark``
pins RocksDBStateStoreProvider for its 100 TB story (state >> heap);
at bench scale every stateful micro-batch instead pays the native DB's
open/commit/snapshot machinery per state partition per batch. This
probe times the stateful streaming entries under each provider in a
FRESH session (one provider per process — the conf binds at session
start) so the choice can be parameterized on evidence.

Usage::

    python scripts/state_store_ab.py rocksdb <query> [...]
    python scripts/state_store_ab.py hdfs    <query> [...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from ue_big_data_project_spark import get_spark  # noqa: E402
from ue_big_data_project_spark.queries import all_queries  # noqa: E402

PROVIDERS = {
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider"
    ),
    "hdfs": (
        "org.apache.spark.sql.execution.streaming."
        "state.HDFSBackedStateStoreProvider"
    ),
}


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] not in PROVIDERS:
        # Structured error before any session build, matching the other
        # probe scripts' unknown-input handling (round-12 advice).
        print(
            json.dumps(
                {
                    "error": "unknown provider",
                    "usage": "state_store_ab.py <provider> [query ...]",
                    "providers": sorted(PROVIDERS),
                }
            )
        )
        sys.exit(2)
    provider = sys.argv[1]
    names = sys.argv[2:]
    runs = max(1, int(os.environ.get("SPARK_GRAFT_AB_RUNS", "3")))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name=f"state-store-ab-{provider}",
        extra_conf={
            "spark.sql.streaming.stateStore.providerClass": PROVIDERS[
                provider
            ]
        },
    )
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    spark.createDataFrame([(1, "w")], "a int, b string").count()
    registry = all_queries()
    for name in names:
        spec = registry.get(name)
        if spec is None:
            print(json.dumps({"query": name, "error": "unknown"}))
            continue
        samples = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            samples.append(round(time.perf_counter() - t0, 3))
        print(
            json.dumps(
                {
                    "provider": provider,
                    "query": name,
                    "median": round(statistics.median(samples), 3),
                    "samples": samples,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
