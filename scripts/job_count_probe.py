"""Count the Spark JOBS a bench query schedules (round-12 evidence).

Wall-clock on this shared box swings 3-8x under external contention, so
job/stage counts are the deterministic complement the optimization
round records next to medians: a scheduling diet shows up here even
when the box noise buries the seconds.

Usage::

    python scripts/job_count_probe.py <query> [<query> ...]

Prints one JSON line per query: jobs scheduled, wall seconds for the
single timed run (noop sink), sf dir.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from ue_big_data_project_spark import get_spark  # noqa: E402
from ue_big_data_project_spark.queries import all_queries  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="job-count-probe")
    sc = spark.sparkContext
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    spark.createDataFrame([(1, "w")], "a int, b string").count()
    from ue_big_data_project_spark.queries.textops import (
        warm_session_indexes,
    )

    warm_session_indexes(spark, sf_dir)
    registry = all_queries()

    def n_jobs() -> int:
        # The DAGScheduler's monotonic job counter: covers every job in
        # the session (grouped, streaming, collect, write) — unlike
        # statusTracker, which only lists ungrouped retained jobs.
        return int(sc._jsc.sc().dagScheduler().nextJobId())

    for name in sys.argv[1:]:
        spec = registry.get(name)
        if spec is None:
            print(json.dumps({"query": name, "error": "unknown"}))
            continue
        spark.catalog.clearCache()
        before = n_jobs()
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        wall = round(time.perf_counter() - t0, 2)
        print(
            json.dumps(
                {
                    "query": name,
                    "jobs": n_jobs() - before,
                    "wall_s": wall,
                    "sf_dir": sf_dir,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
