"""One-command scaling datapoint for the DSIR family.

Three claims under test:

1. ``write_dsir_model`` (the fit) is ONE corpus pass whose only
   shuffle keys on the feature bucket with map-side partial
   aggregation, so wall time scales ~linearly with corpus size and the
   persisted model stays <= DSIR_BUCKETS rows at ANY corpus size.
2. ``dsir_score_increment`` is O(increment): scoring a FIXED increment
   against a model fit on 10x the corpus costs the same as against the
   1x model (the model is a broadcastable constant-size table — corpus
   size is not in the scoring complexity at all).
3. The model artifact on disk stays put (bytes measured) while the fit
   corpus grows 10x.

Replication uses a per-copy vocabulary bijection (token suffixing) so
the 10x corpus has 10x the feature mass without collapsing onto the
same buckets in a degenerate way; the increment is held verbatim.

Usage:  python scripts/dsir_scale_check.py [--runs 3] [--copies 10]
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
from ue_big_data_project_spark.pipelines import (
    dsir_score_increment,
    write_dsir_model,
)
from ue_big_data_project_spark.session import load_tables


def replicate(d, copies: int):
    """copies x the corpus: copy i remaps doc ids and suffixes every
    token with the copy index (vocabulary bijection, winnow-check
    discipline) so feature structure is preserved per copy."""
    parts = []
    for i in range(copies):
        c = d.withColumn(
            "doc_id", F.col("doc_id") + F.lit(i * 10_000_000)
        )
        if i > 0:
            c = c.withColumn(
                "text",
                F.regexp_replace(
                    F.col("text"), r"(\S+)", r"$1" + f"x{i}"
                ),
            )
        parts.append(c)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument(
        "--sf-dir", default=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
    )
    args = ap.parse_args()
    if args.copies < 2:
        ap.error(
            "--copies must be >= 2 (with 1 copy both timing arms "
            "collapse onto the same key and every ratio reads 1.0)"
        )

    spark = get_spark(app_name="dsir-scale-check")
    d = load_tables(spark, args.sf_dir, ("documents",))["documents"]
    base1 = d.localCheckpoint(eager=True)
    base10 = replicate(d, args.copies).localCheckpoint(eager=True)
    inc = (
        d.filter(F.col("doc_id") % 4 == 0)
        .withColumn("doc_id", F.col("doc_id") + F.lit(900_000_000))
        .localCheckpoint(eager=True)
    )
    is_target = F.col("source").isin("src1", "src2", "src3")

    scratch = tempfile.mkdtemp(prefix="spark_graft_dsir_scale_")
    fit_t = {1: [], args.copies: []}
    score_t = {1: [], args.copies: []}
    model_bytes = {}
    try:
        for r in range(args.runs):
            for mult, base in ((1, base1), (args.copies, base10)):
                spark.catalog.clearCache()
                model = os.path.join(scratch, f"m_{mult}_{r}")
                t0 = time.perf_counter()
                write_dsir_model(base, is_target, model)
                fit_t[mult].append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                n = dsir_score_increment(spark, model, inc).count()
                score_t[mult].append(time.perf_counter() - t0)
                model_bytes[mult] = dir_bytes(model)
                assert n == inc.count()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    med = lambda xs: round(statistics.median(xs), 3)  # noqa: E731
    out = {
        "metric": "dsir_scale_check",
        "copies": args.copies,
        "runs": args.runs,
        "fit_1x_s": med(fit_t[1]),
        "fit_10x_s": med(fit_t[args.copies]),
        "fit_ratio": round(
            statistics.median(fit_t[args.copies])
            / statistics.median(fit_t[1]),
            2,
        ),
        "score_fixed_inc_vs_1x_model_s": med(score_t[1]),
        "score_fixed_inc_vs_10x_model_s": med(score_t[args.copies]),
        "score_ratio": round(
            statistics.median(score_t[args.copies])
            / statistics.median(score_t[1]),
            2,
        ),
        "model_bytes_1x": model_bytes[1],
        "model_bytes_10x": model_bytes[args.copies],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
