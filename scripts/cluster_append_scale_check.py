"""Scaling datapoint for incremental cluster maintenance (round-8
verdict task 4): time folding a FIXED-SIZE increment of new near-dup
pairs into a persisted cluster map over a base corpus and over a
10x-larger one, next to the cost of RE-CLUSTERING from scratch at each
size.

Claims measured:
- `dedup.append_cluster_map` cost is O(increment + touched buckets):
  a CC over the contracted O(increment) graph, one broadcast relabel,
  and a rewrite of only the touched component-bucket dirs — so the
  append should stay roughly FLAT (<= ~2x) under a 10x base map, and
  its BYTES WRITTEN (the load-independent metric this box's page cache
  cannot fake — the merge-sink precedent) should stay a small constant
  fraction of the map.
- The rebuild baseline (`graph.connected_components` over the full
  pair graph + persisting the full map, apples-to-apples with the
  append's persist) grows with the corpus. NOTE the fixture hands the
  rebuild its pairs FOR FREE; in the real pipeline a rebuild first
  re-runs pair generation (shingle/prefix-join/verify) over the whole
  corpus — the dominant cost (see dedup_clusters' bench entry) — so
  wall-ratios here UNDERSTATE the append's real advantage.

Fixture: synthetic pair graph with C chains of length L (diameter-2
star-ish clusters like real near-dup groups); the increment adds new
nodes that join existing clusters and bridge a few of them (forcing
relabels, the expensive case). Each timed run uses a disjoint
id-shifted increment so every append is legitimate.

Usage:  python scripts/cluster_append_scale_check.py [--runs 3]
Writes one JSON line to stdout; scratch dirs removed on exit.
"""

from __future__ import annotations

import argparse
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
from ue_big_data_project_spark.operators.dedup import (
    append_cluster_map,
    write_cluster_map,
)
from ue_big_data_project_spark.operators.graph import connected_components


def base_graph(spark, n_clusters: int, size: int):
    """n_clusters star clusters: node c*1000+m, edges (hub, member)."""
    nodes = spark.range(n_clusters * size).select(
        (
            (F.col("id") / size).cast("long") * 1000
            + F.col("id") % size
        ).alias("doc_id")
    )
    edges = (
        spark.range(n_clusters * size)
        .where(F.col("id") % size != 0)
        .select(
            ((F.col("id") / size).cast("long") * 1000).alias("id_a"),
            (
                (F.col("id") / size).cast("long") * 1000
                + F.col("id") % size
            ).alias("id_b"),
        )
    )
    return nodes, edges


def increment(spark, n_clusters: int, inc_n: int, shift: int,
              touch: int = 4):
    """inc_n new nodes joining a SMALL set of existing clusters (a
    crawl increment near-dups against few components, not the whole
    corpus): each joins cluster (i % touch); every 10th also bridges to
    cluster ((i+1) % touch) — forced merges. Touched components << the
    bucket count is the realistic regime the component-bucketed layout
    exists for (at 100 TB: thousands of buckets, an increment touching
    tens)."""
    # Far above any base node id (10x corpus tops out ~2e7): colliding
    # ids would silently merge real clusters, not add new docs.
    base_id = 1_000_000_000 + shift * 1_000_000
    touch = min(touch, n_clusters)
    new_nodes = spark.range(inc_n).select(
        (F.lit(base_id) + F.col("id")).alias("doc_id")
    )
    join_edges = spark.range(inc_n).select(
        (F.lit(base_id) + F.col("id")).alias("id_a"),
        ((F.col("id") % touch) * 1000).alias("id_b"),
    )
    bridge_edges = (
        spark.range(inc_n)
        .where(F.col("id") % 10 == 0)
        .select(
            (F.lit(base_id) + F.col("id")).alias("id_a"),
            (((F.col("id") + 1) % touch) * 1000).alias("id_b"),
        )
    )
    return new_nodes, join_edges.union(bridge_edges)


def _file_snapshot(path: str) -> dict[str, tuple[float, int]]:
    out = {}
    for r_, _, fls in os.walk(path):
        for f in fls:
            if f.endswith(".parquet"):
                p = os.path.join(r_, f)
                st = os.stat(p)
                out[p] = (st.st_mtime, st.st_size)
    return out


def measure(spark, n_clusters: int, size: int, inc_n: int, runs: int):
    root = tempfile.mkdtemp(prefix=f"cmap_scale_{n_clusters}_")
    try:
        nodes, edges = base_graph(spark, n_clusters, size)
        t0 = time.monotonic()
        assign = connected_components(
            nodes, edges, node_col="doc_id", src_col="id_a", dst_col="id_b"
        )
        path = os.path.join(root, "cmap")
        write_cluster_map(assign, path, n_buckets=32)
        build_s = round(time.monotonic() - t0, 3)
        map_bytes = sum(s for _, s in _file_snapshot(path).values())
        appends, append_bytes = [], []
        for r in range(runs):
            new_nodes, new_edges = increment(spark, n_clusters, inc_n, r)
            before = _file_snapshot(path)
            t1 = time.monotonic()
            append_cluster_map(spark, path, new_nodes, new_edges)
            appends.append(round(time.monotonic() - t1, 3))
            after = _file_snapshot(path)
            append_bytes.append(
                sum(s for p, (m, s) in after.items() if before.get(p) != (m, s))
            )
        # Rebuild baseline, apples-to-apples: CC over the full pair
        # graph AND persisting the full map (the append persists too).
        t2 = time.monotonic()
        write_cluster_map(
            connected_components(
                nodes, edges,
                node_col="doc_id", src_col="id_a", dst_col="id_b",
            ),
            os.path.join(root, "cmap_rebuilt"),
            n_buckets=32,
        )
        rebuild_s = round(time.monotonic() - t2, 3)
        return {
            "rows": n_clusters * size,
            "build_s": build_s,
            "map_bytes": map_bytes,
            "append_s": appends,
            "append_median_s": round(statistics.median(appends), 3),
            "append_bytes_median": int(statistics.median(append_bytes)),
            "rebuild_s": rebuild_s,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--inc-n", type=int, default=2000)
    args = ap.parse_args()
    spark = get_spark(app_name="cluster-append-scale-check")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"metric": "cluster_append_scale", "inc_n": args.inc_n}
    for tag, (c, s) in (("1x", (2_000, 25)), ("10x", (20_000, 25))):
        m = measure(spark, c, s, args.inc_n, args.runs)
        for k, v in m.items():
            out[f"{tag}_{k}"] = v
    out["append_ratio_10x"] = round(
        out["10x_append_median_s"] / max(out["1x_append_median_s"], 1e-9), 2
    )
    out["rebuild_ratio_10x"] = round(
        out["10x_rebuild_s"] / max(out["1x_rebuild_s"], 1e-9), 2
    )
    out["append_vs_rebuild_10x"] = round(
        out["10x_rebuild_s"] / max(out["10x_append_median_s"], 1e-9), 2
    )
    # Load-independent: rebuild rewrites the WHOLE map, append only the
    # touched buckets.
    out["bytes_rebuild_over_append_10x"] = round(
        out["10x_map_bytes"] / max(out["10x_append_bytes_median"], 1), 1
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
