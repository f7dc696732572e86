"""One-command scaling datapoints for the media fingerprint family.

Three claims under test:

1. Fingerprinting (image dHash / audio Haitsma–Kalker) is
   embarrassingly parallel — one Arrow pass, zero shuffles, so wall
   time scales ~linearly per 10× rows (sub-10× on a box with spare
   cores).
2. ``fp_index_append`` is O(increment): appending the SAME 500-doc
   increment costs the same against a 1× index as against a 10×
   index — existing rows are never read or rewritten.
3. ``fp_probe_index`` is probe-incident-bounded: the probe joins
   index rows only on the probe's (bi, bv) band set, so probing a
   FIXED batch against a 10× index pays for the extra rows IN THE
   PROBED BANDS (data: more true candidates), never a corpus scan —
   reported as candidate counts next to wall times so the growth is
   attributable.

To keep near-dup RATE constant under replication, copies shift doc_id
by k·10⁶ (the fixture fingerprints depend on doc_id arithmetic with
small moduli, so shifted copies reproduce the same fingerprint
DISTRIBUTION without being row-for-row clones of the originals).

Usage:  python scripts/media_fp_scale_check.py [--runs 3] [--copies 10]
Writes one JSON line to stdout.
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
from ue_big_data_project_spark.operators import multimodal as MM
from ue_big_data_project_spark.session import load_tables


def timed(fn, runs):
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        ts.append(round(time.perf_counter() - t0, 3))
    return round(statistics.median(ts), 3), ts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    spark = get_spark(app_name="media-fp-scale-check")
    ids = load_tables(spark, args.sf, ("documents",))["documents"].select(
        "doc_id"
    )
    par = spark.sparkContext.defaultParallelism

    def corpus(copies: int):
        c = ids
        for k in range(1, copies):
            c = c.unionByName(
                ids.select((F.col("doc_id") + k * 1_000_000).alias("doc_id"))
            )
        return c.repartition(par, "doc_id").localCheckpoint(eager=True)

    one, ten = corpus(1), corpus(args.copies)
    out = {"metric": "media_fp_scale_check", "copies": args.copies}

    # 1. fingerprint throughput
    def fp_wall(c):
        return lambda: MM.image_dhash(MM.attach_bmp(c)).write.mode(
            "overwrite"
        ).format("noop").save()

    out["dhash_1x_sec"], _ = timed(fp_wall(one), args.runs)
    out["dhash_10x_sec"], _ = timed(fp_wall(ten), args.runs)
    out["dhash_ratio"] = round(out["dhash_10x_sec"] / out["dhash_1x_sec"], 2)

    # 2. append is O(increment) regardless of index size
    inc = MM.image_dhash(
        MM.attach_bmp(
            ids.select((F.col("doc_id") + 777_000_000).alias("doc_id"))
        )
    ).localCheckpoint(eager=True)
    walls = {}
    for label, c in (("1x", one), ("10x", ten)):
        root = tempfile.mkdtemp(prefix="fp_scale_")
        try:
            idx = root + "/idx"
            MM.write_fp_index(MM.image_dhash(MM.attach_bmp(c)), idx)
            # time real appends into per-run clones (append mutates)
            ts = []
            for r in range(args.runs):
                clone = f"{root}/clone{r}"
                shutil.copytree(idx, clone)
                shutil.copytree(idx + "_stats", clone + "_stats")
                t0 = time.perf_counter()
                MM.fp_index_append(spark, clone, inc)
                ts.append(round(time.perf_counter() - t0, 3))
            walls[label] = round(statistics.median(ts), 3)
            # 3. probe a FIXED batch against this index
            probe = MM.image_dhash(
                MM.attach_bmp(
                    ids.select(
                        (F.col("doc_id") + 888_000_000).alias("doc_id")
                    )
                )
            ).localCheckpoint(eager=True)
            t0 = time.perf_counter()
            pairs = MM.fp_probe_index(spark, idx, probe)
            n_pairs = pairs.count()
            walls[label + "_probe"] = round(time.perf_counter() - t0, 3)
            walls[label + "_probe_pairs"] = n_pairs
        finally:
            shutil.rmtree(root, ignore_errors=True)
    out["append_1x_sec"] = walls["1x"]
    out["append_10x_sec"] = walls["10x"]
    out["append_ratio"] = round(walls["10x"] / max(walls["1x"], 1e-9), 2)
    out["probe_1x_sec"] = walls["1x_probe"]
    out["probe_10x_sec"] = walls["10x_probe"]
    out["probe_pairs_1x"] = walls["1x_probe_pairs"]
    out["probe_pairs_10x"] = walls["10x_probe_pairs"]

    # 4. the stop-band cap on a pathologically skewed corpus (the
    # all-black-thumbnail shape): EVERY fingerprint shares band0=0, so
    # the uncapped band join fans out C(N, 2) couples in one bucket
    # while max_band_freq drops that band and pays only the surviving
    # bands' bounded buckets. Fingerprints built directly (band0
    # zeroed) so N controls the hot-bucket size exactly.
    # 20k docs sharing one band -> ~2*10^8 hot-bucket couples uncapped
    # (the quadratic blow-up the cap exists for); capped work is the
    # surviving bands' bounded buckets plus one narrow (bi, bv) count.
    n_skew = 20000
    skew = spark.range(n_skew).select(
        F.col("id").alias("doc_id"),
        # band0 = 0 (hot), band1 spreads over 256 values
        F.pmod(F.col("id") * 37, F.lit(256)).cast("long").alias("dhash_hi"),
        # bands 2+3 spread over ~2^20 values
        (F.col("id") * 2654435761 % F.lit(1 << 20)).cast("long").alias(
            "dhash_lo"
        ),
    ).localCheckpoint(eager=True)

    def pairs_wall(capped):
        def run():
            MM.dhash_neardup_pairs(
                skew,
                max_hamming=2,
                max_band_freq=64 if capped else None,
            ).write.mode("overwrite").format("noop").save()

        return run

    out["skew_n"] = n_skew
    out["skew_uncapped_sec"], _ = timed(pairs_wall(False), args.runs)
    out["skew_capped_sec"], _ = timed(pairs_wall(True), args.runs)
    out["skew_speedup"] = round(
        out["skew_uncapped_sec"] / max(out["skew_capped_sec"], 1e-9), 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
