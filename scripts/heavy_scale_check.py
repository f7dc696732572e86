"""10x scale datapoint for the two heaviest non-index bench queries
(round-6 verdict task 7): `graph_triangle_parts` and `dedup_clusters`.
Their 100 TB story was plan-asserted (degree-oriented wedges bound the
hottest adjacency list at O(sqrt(E)); PPJoin prefix filtering bounds
candidate pairs); this measures one real scaling point the way
probe_scale_check.py did for the index probes.

Replication recipes keep the problem STRUCTURE constant while the data
grows 10x:
- triangles: lineitem with order keys shifted per copy -> 10 disjoint
  copies of the co-purchase graph (10x edges, 10x triangles, same
  degree distribution).
- dedup: documents with doc_id shifted AND a per-copy letter
  substitution on the text ('e' -> a copy-specific rare letter), so
  within-copy near-dup pairs survive (both sides transformed alike)
  while cross-copy Jaccard collapses — 10x docs, ~10x true pairs.
  Without the perturbation every copy would be an exact dup of its 9
  siblings and the pair count would grow ~45x, measuring density, not
  scale.

Expected: wall-time growth <= ~15x for triangles (O(E*sqrt(E)) bound on
the wedge join; fixed overheads amortize) and ~linear for dedup.

Usage:  python scripts/heavy_scale_check.py [--runs 3] [--copies 10]
Writes one JSON line to stdout; scratch parquet is removed on exit.
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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ue_big_data_project_spark import get_spark
from ue_big_data_project_spark.operators import dedup as DD
from ue_big_data_project_spark.operators.graph import (
    connected_components,
    triangle_counts,
)
from ue_big_data_project_spark.session import load_tables

_COPY_LETTERS = "qxzjkvwyfu"  # rare letters, one per copy


def triangles_df(l: DataFrame) -> DataFrame:
    """The graph_triangle_parts plan over an explicit lineitem frame
    (queries/tpch.py:graph_triangle_parts, parameterized by input).
    Mirrors the round-7 grouped-array edge build — one shuffle per
    order, pair expansion map-side — not the retired self-join."""
    g = l.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("parts")
    )
    edges = g.select(
        F.explode(
            F.expr(
                "flatten(transform(parts, (x, i) -> "
                "transform(slice(parts, i + 2, size(parts)), "
                "y -> struct(least(x, y) AS src, greatest(x, y) AS dst))))"
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    tc = triangle_counts(edges)
    w = Window.orderBy(F.col("triangles").desc(), F.col("id").asc())
    return (
        tc.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 20)
        .select(F.col("id").alias("p_partkey"), "triangles", "rank")
    )


def clusters_df(d: DataFrame) -> DataFrame:
    """The dedup_clusters plan over an explicit documents frame
    (queries/textops.py:dedup_clusters, parameterized by input)."""
    pairs = DD.ngram_jaccard_pairs(
        d, "doc_id", "text", shingle_n=3, threshold=0.8
    )
    return connected_components(
        d.select("doc_id"),
        pairs,
        node_col="doc_id",
        src_col="id_a",
        dst_col="id_b",
    )


def timed_median(spark, runs: int, make_df) -> float:
    samples = []
    for _ in range(runs):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        make_df().write.mode("overwrite").format("noop").save()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    spark = get_spark(app_name="heavy-scale-check")
    root = tempfile.mkdtemp(prefix="spark_graft_heavy_scale_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)

    l = load_tables(spark, args.sf_dir, ("lineitem",))["lineitem"].select(
        "l_orderkey", "l_partkey"
    )
    d = load_tables(spark, args.sf_dir, ("documents",))["documents"].select(
        "doc_id", "text"
    )
    n_l, n_d = l.count(), d.count()
    shift_o = l.agg(F.max("l_orderkey")).first()[0] + 1
    shift_d = d.agg(F.max("doc_id")).first()[0] + 1

    l_parts = [
        l.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * shift_o))
        for k in range(args.copies)
    ]
    l10 = l_parts[0]
    for p in l_parts[1:]:
        l10 = l10.unionAll(p)
    d_parts = [
        d.withColumn("doc_id", F.col("doc_id") + F.lit(k * shift_d))
        .withColumn("text", F.translate("text", "e", _COPY_LETTERS[k]))
        for k in range(args.copies)
    ]
    d10 = d_parts[0]
    for p in d_parts[1:]:
        d10 = d10.unionAll(p)

    l10_path, d10_path = os.path.join(root, "l10"), os.path.join(root, "d10")
    l10.write.parquet(l10_path)
    d10.write.parquet(d10_path)
    l10 = spark.read.parquet(l10_path)
    d10 = spark.read.parquet(d10_path)

    # Warmup: codegen + parquet footers — run BOTH scales once untimed,
    # or the first timed 10x sample pays cold footer/codegen cost and
    # can inflate the very ratio this script measures.
    for frame, fn in (
        (l, triangles_df),
        (d, clusters_df),
        (l10, triangles_df),
        (d10, clusters_df),
    ):
        fn(frame).write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()

    out = {
        "metric": "heavy_query_scale_ratio",
        "sf_dir": args.sf_dir,
        "copies": args.copies,
        "rows": {
            "lineitem_x1": n_l,
            "documents_x1": n_d,
        },
        "runs": args.runs,
    }
    tri_1 = timed_median(spark, args.runs, lambda: triangles_df(l))
    tri_10 = timed_median(spark, args.runs, lambda: triangles_df(l10))
    ded_1 = timed_median(spark, args.runs, lambda: clusters_df(d))
    ded_10 = timed_median(spark, args.runs, lambda: clusters_df(d10))
    out["triangles_sec"] = {"x1": tri_1, "x10": tri_10}
    out["triangles_ratio"] = round(tri_10 / tri_1, 2)
    out["dedup_sec"] = {"x1": ded_1, "x10": ded_10}
    out["dedup_ratio"] = round(ded_10 / ded_1, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
