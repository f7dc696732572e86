"""One-command scaling datapoint for the probe-only index twins
(round-5 verdict task 3): measure steady-state probe latency at sf0.1
and against a 10x-replicated corpus, and show the ratio.

The claim under test: "probe cost is pruning-bounded, not
corpus-bounded". That holds under the documented at-scale deployment
rule — partition counts scale WITH the corpus (IVF centroids ~ sqrt(N),
BM25 term buckets ~ corpus size), so each probed partition stays
constant-sized while the corpus grows. This script builds the 10x
indexes under that rule (10x the cells / buckets), keeps nprobe and the
query batch identical, and reports the median of ``--runs`` timed
probes per scale. A ratio near 1 (<= ~2x while the corpus grows 10x)
converts the plan-asserted pruning claim into a measured one.

Usage:  python scripts/probe_scale_check.py [--runs 5]
Writes one JSON line to stdout; scratch data lands under /tmp and is
removed on exit.
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
    bm25_topk_indexed,
    build_text_index,
)
from ue_big_data_project_spark.operators.similarity import (
    build_ivf_index,
    ivf_knn_indexed,
)
from ue_big_data_project_spark.queries.textops import _BM25_QUERIES
from ue_big_data_project_spark.session import load_tables


def replicate(df, id_col: str, copies: int, shift: int):
    """Union ``copies`` id-shifted copies of ``df`` — same content
    distribution, ``copies``-times the rows, distinct ids."""
    parts = [
        df.withColumn(id_col, F.col(id_col) + F.lit(k * shift))
        for k in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def timed_median(runs: int, make_df) -> float:
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        make_df().write.mode("overwrite").format("noop").save()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument(
        "--sf-dir", default=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
    )
    args = ap.parse_args()

    spark = get_spark(app_name="probe-scale-check")
    root = tempfile.mkdtemp(prefix="spark_graft_probe_scale_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)

    e = load_tables(spark, args.sf_dir, ("embeddings",))["embeddings"]
    d = load_tables(spark, args.sf_dir, ("documents",))["documents"]
    n_e, n_d = e.count(), d.count()
    shift_e = e.agg(F.max("vec_id")).first()[0] + 1
    shift_d = d.agg(F.max("doc_id")).first()[0] + 1

    # Replicated corpora are MATERIALIZED to parquet first so the index
    # builds (and nothing else) pay the replication cost.
    e10_path, d10_path = root + "/e10", root + "/d10"
    replicate(e, "vec_id", args.copies, shift_e).write.parquet(e10_path)
    replicate(d, "doc_id", args.copies, shift_d).write.parquet(d10_path)
    e10 = spark.read.parquet(e10_path)
    d10 = spark.read.parquet(d10_path)

    # Index builds: the at-scale rule — partitions scale with corpus.
    ivf1, ivf10 = root + "/ivf1", root + "/ivf10"
    bm1, bm10 = root + "/bm1", root + "/bm10"
    build_ivf_index(e, ivf1, n_centroids=16, kmeans_iters=2)
    build_ivf_index(
        e10, ivf10, n_centroids=16 * args.copies, kmeans_iters=2
    )
    build_text_index(d, bm1, n_buckets=16)
    build_text_index(d10, bm10, n_buckets=16 * args.copies)

    queries_v = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    ).localCheckpoint(eager=True)
    queries_t = spark.createDataFrame(
        list(_BM25_QUERIES), "query_id int, query_text string"
    ).localCheckpoint(eager=True)

    # Warmup probes (codegen, footer caches) before the timed medians.
    for idx in (ivf1, ivf10):
        ivf_knn_indexed(spark, idx, queries_v, k=5, nprobe=2).write.mode(
            "overwrite"
        ).format("noop").save()
    for idx in (bm1, bm10):
        bm25_topk_indexed(spark, idx, queries_t, k=5).write.mode(
            "overwrite"
        ).format("noop").save()

    out = {
        "metric": "probe_scaling_ratio",
        "sf_dir": args.sf_dir,
        "copies": args.copies,
        "rows": {"embeddings": n_e, "documents": n_d},
        "runs": args.runs,
    }
    ivf_1x = timed_median(
        args.runs,
        lambda: ivf_knn_indexed(spark, ivf1, queries_v, k=5, nprobe=2),
    )
    ivf_10x = timed_median(
        args.runs,
        lambda: ivf_knn_indexed(spark, ivf10, queries_v, k=5, nprobe=2),
    )
    bm_1x = timed_median(
        args.runs, lambda: bm25_topk_indexed(spark, bm1, queries_t, k=5)
    )
    bm_10x = timed_median(
        args.runs, lambda: bm25_topk_indexed(spark, bm10, queries_t, k=5)
    )
    out["ivf_probe_sec"] = {"x1": ivf_1x, "x10": ivf_10x}
    out["ivf_ratio"] = round(ivf_10x / ivf_1x, 2)
    out["bm25_probe_sec"] = {"x1": bm_1x, "x10": bm_10x}
    out["bm25_ratio"] = round(bm_10x / bm_1x, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
