"""One-command scaling datapoints for the NB classifier family.

Claims under test:

- ``nb_train`` is two corpus shuffles (the (label, term) count and its
  rollups), so training wall time scales ~linearly per 10× rows —
  sub-10× on a box with spare cores.
- ``nb_classify_increment`` against a persisted model is O(increment +
  model-join): scoring a FIXED increment should be near-flat as the
  TRAINING corpus that built the model grows 10× (the model's
  vocabulary saturates under Zipf — replicated copies add no new
  terms), because the frozen corpus is never re-scanned.

Replicated copies keep doc ids distinct but reuse the original texts —
exactly the repetition real corpora have.

Usage:  python scripts/nb_scale_check.py [--runs 3] [--copies 10]
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
from ue_big_data_project_spark.operators.classify import (
    nb_classify_increment,
    nb_train,
    write_nb_model,
)
from ue_big_data_project_spark.session import load_tables


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    spark = get_spark(app_name="nb-scale-check")
    docs = load_tables(spark, args.sf, ("documents",))["documents"].select(
        "doc_id", "source", "text"
    )
    par = spark.sparkContext.defaultParallelism

    def corpus(copies: int):
        c = docs
        for k in range(1, copies):
            c = c.unionByName(
                docs.select(
                    (F.col("doc_id") + k * 1_000_000).alias("doc_id"),
                    "source",
                    "text",
                )
            )
        return c.repartition(par, "doc_id").localCheckpoint(eager=True)

    def median(fn, n):
        fn()  # warm-up discarded: first call pays JVM/codegen warm-up
        out = []
        for _ in range(n):
            t0 = time.monotonic()
            fn()
            out.append(time.monotonic() - t0)
        return round(statistics.median(out), 3)

    base = corpus(1)
    big = corpus(args.copies)
    increment = docs.select(
        (F.col("doc_id") + 777_000_000).alias("doc_id"), "text"
    ).localCheckpoint(eager=True)

    def train(c):
        model, labels = nb_train(c)
        # Materialize both outputs the way a persist would.
        model.count()
        labels.count()

    t_train_1 = median(lambda: train(base), args.runs)
    t_train_n = median(lambda: train(big), args.runs)

    root = tempfile.mkdtemp(prefix="nb_scale_")
    try:
        write_nb_model(base, root + "/m1")
        write_nb_model(big, root + "/mN")
        t_score_1 = median(
            lambda: nb_classify_increment(
                spark, root + "/m1", increment
            ).count(),
            args.runs,
        )
        t_score_n = median(
            lambda: nb_classify_increment(
                spark, root + "/mN", increment
            ).count(),
            args.runs,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "nb_scale_check",
                "copies": args.copies,
                "train_1x_s": t_train_1,
                "train_Nx_s": t_train_n,
                "train_ratio": round(t_train_n / t_train_1, 2),
                "score_fixed_increment_vs_1x_model_s": t_score_1,
                "score_fixed_increment_vs_Nx_model_s": t_score_n,
                "score_ratio": round(t_score_n / t_score_1, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
