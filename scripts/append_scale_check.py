"""Scaling datapoint for incremental index maintenance: time appending
a FIXED-SIZE increment into an index over the sf corpus and into one
over a 10x-replicated corpus (partitions scaled with the corpus, the
same at-scale rule probe_scale_check.py uses). Covers BOTH persisted
indexes with an append path:

- BM25 (`retrieval.append_text_index`): claim "per-increment cost is
  O(increment + vocabulary), never a scan of the existing postings".
- IVF (`similarity.ivf_index_append`): claim "per-increment cost is
  one tagged scan of the increment against the frozen centroids,
  never a rebuild" (centroid count scales with the corpus, so the 10x
  assignment broadcast is 10x wider — the one component allowed to
  grow, and it is centroids-sized, not corpus-sized).

Append time should stay roughly FLAT (<= ~2x) while the index
underneath grows 10x; a rebuild would cost 10x more.

Each timed run appends a distinct id-shifted copy of the increment, so
every run is a legitimate disjoint append; the index grows by a few
hundred rows per run, noise against the 10x base corpus.

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
from ue_big_data_project_spark.operators.similarity import (
    build_ivf_index,
    ivf_index_append,
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

    # ---- IVF: same protocol over the embeddings table. ----
    e = load_tables(spark, args.sf_dir, ("embeddings",))["embeddings"]
    n_e = e.count()
    shift_e = e.agg(F.max("vec_id")).first()[0] + 1
    e10_path = root + "/e10"
    eparts = [
        e.withColumn("vec_id", F.col("vec_id") + F.lit(k * shift_e))
        for k in range(args.copies)
    ]
    e10 = eparts[0]
    for p in eparts[1:]:
        e10 = e10.unionAll(p)
    e10.write.parquet(e10_path)
    e10 = spark.read.parquet(e10_path)
    ivf1, ivf10 = root + "/ivf1", root + "/ivf10"
    build_ivf_index(e, ivf1, n_centroids=16, kmeans_iters=2)
    build_ivf_index(e10, ivf10, n_centroids=16 * args.copies, kmeans_iters=2)
    einc_base = e.filter(F.col("vec_id") < args.inc_docs).localCheckpoint(
        eager=True
    )
    n_einc = einc_base.count()
    e_shift = shift_e * (args.copies + 1)

    def timed_ivf(idx_path: str, run_offset: int) -> list[float]:
        samples = []
        for r in range(args.runs):
            inc = einc_base.withColumn(
                "vec_id",
                F.col("vec_id") + F.lit(e_shift * (run_offset + r + 1)),
            )
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            ivf_index_append(spark, idx_path, inc)
            samples.append(round(time.perf_counter() - t0, 3))
        return samples

    ivf_index_append(
        spark, ivf1,
        einc_base.withColumn("vec_id", F.col("vec_id") + F.lit(e_shift * 100)),
    )
    ivf_index_append(
        spark, ivf10,
        einc_base.withColumn("vec_id", F.col("vec_id") + F.lit(e_shift * 101)),
    )
    v1 = timed_ivf(ivf1, 0)
    v10 = timed_ivf(ivf10, args.runs)
    mv1, mv10 = statistics.median(v1), statistics.median(v10)

    print(
        json.dumps(
            {
                "metric": "index_append_scale_ratio",
                "sf_dir": args.sf_dir,
                "copies": args.copies,
                "rows": {
                    "documents_x1": n_d,
                    "doc_increment": n_inc,
                    "embeddings_x1": n_e,
                    "vec_increment": n_einc,
                },
                "runs": args.runs,
                "bm25_append_sec": {"x1": round(m1, 3), "x10": round(m10, 3)},
                "bm25_samples": {"x1": s1, "x10": s10},
                "bm25_append_ratio": round(m10 / m1, 2),
                "ivf_append_sec": {"x1": round(mv1, 3), "x10": round(mv10, 3)},
                "ivf_samples": {"x1": v1, "x10": v10},
                "ivf_append_ratio": round(mv10 / mv1, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
