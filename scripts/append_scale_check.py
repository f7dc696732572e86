"""Scaling datapoint for incremental BM25 index maintenance
(`retrieval.append_text_index`): time appending a FIXED-SIZE document
increment into an index over the sf corpus and into one over a
10x-replicated corpus (buckets scaled with the corpus, the same
at-scale partitioning rule probe_scale_check.py uses).

The claim under test: "per-increment cost is O(increment + vocabulary),
never a scan of the existing postings" — so the append time should stay
roughly FLAT (<= ~2x) while the index underneath grows 10x. A rebuild,
by contrast, would cost 10x more.

Each timed run appends a distinct id-shifted copy of the increment, so
every run is a legitimate disjoint append; the index grows by a few
hundred docs per run, noise against the 10x base corpus.

Usage:  python scripts/append_scale_check.py [--runs 5] [--inc-docs 500]
Writes one JSON line to stdout; scratch data is removed on exit.
"""

from __future__ import annotations

import argparse
import atexit
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from ue_big_data_project_spark import get_spark
from ue_big_data_project_spark.operators.retrieval import (
    append_text_index,
    build_text_index,
)
from ue_big_data_project_spark.session import load_tables


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--inc-docs", type=int, default=500)
    ap.add_argument(
        "--sf-dir", default=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
    )
    args = ap.parse_args()

    spark = get_spark(app_name="append-scale-check")
    root = tempfile.mkdtemp(prefix="spark_graft_append_scale_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)

    d = load_tables(spark, args.sf_dir, ("documents",))["documents"].select(
        "doc_id", "text"
    )
    n_d = d.count()
    shift = d.agg(F.max("doc_id")).first()[0] + 1

    d10_path = root + "/d10"
    parts = [
        d.withColumn("doc_id", F.col("doc_id") + F.lit(k * shift))
        for k in range(args.copies)
    ]
    d10 = parts[0]
    for p in parts[1:]:
        d10 = d10.unionAll(p)
    d10.write.parquet(d10_path)
    d10 = spark.read.parquet(d10_path)

    bm1, bm10 = root + "/bm1", root + "/bm10"
    build_text_index(d, bm1, n_buckets=16)
    build_text_index(d10, bm10, n_buckets=16 * args.copies)

    # The fixed increment: inc_docs documents, materialized once; each
    # run appends a fresh id-shifted copy (disjoint ids per contract).
    inc_base = d.filter(F.col("doc_id") < args.inc_docs).localCheckpoint(
        eager=True
    )
    n_inc = inc_base.count()
    # Shift increments past BOTH corpora (1x and 10x share the shift).
    base_shift = shift * (args.copies + 1)

    def timed(idx_path: str, run_offset: int) -> list[float]:
        samples = []
        for r in range(args.runs):
            inc = inc_base.withColumn(
                "doc_id",
                F.col("doc_id") + F.lit(base_shift * (run_offset + r + 1)),
            )
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            append_text_index(spark, inc, idx_path)
            samples.append(round(time.perf_counter() - t0, 3))
        return samples

    # Warmup one append per index (codegen + footer caches).
    append_text_index(
        spark,
        inc_base.withColumn("doc_id", F.col("doc_id") + F.lit(base_shift * 100)),
        bm1,
    )
    append_text_index(
        spark,
        inc_base.withColumn("doc_id", F.col("doc_id") + F.lit(base_shift * 101)),
        bm10,
    )

    s1 = timed(bm1, 0)
    s10 = timed(bm10, args.runs)
    m1, m10 = statistics.median(s1), statistics.median(s10)
    print(
        json.dumps(
            {
                "metric": "bm25_append_scale_ratio",
                "sf_dir": args.sf_dir,
                "copies": args.copies,
                "rows": {"documents_x1": n_d, "increment": n_inc},
                "runs": args.runs,
                "append_sec": {"x1": round(m1, 3), "x10": round(m10, 3)},
                "samples": {"x1": s1, "x10": s10},
                "append_ratio": round(m10 / m1, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
