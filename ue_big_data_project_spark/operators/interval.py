"""Binned interval (range) joins.

Spark has no native range-join strategy: a join whose ONLY predicate is
``start <= ts <= end`` falls back to BroadcastNestedLoopJoin (fine when
one side is tiny, catastrophic when both sides scale). The standard
distributed fix — what Databricks' range-join hint does under the hood —
is **binning**: quantize time into fixed-width bins no narrower than the
longest interval, replicate each interval to every bin it overlaps
(≤ 2 bins when ``bin_seconds ≥`` the interval length), key each point to
its single bin, and equi-join on the bin (plus any real equi keys). The
bin becomes a shuffle key Spark can hash on; the exact range predicate
then filters within each bin pair.

Correctness: a point joins an interval in the point's OWN bin only, and
each interval lands in any given bin at most once (``sequence`` emits
distinct bins), so a qualifying (point, interval) pair appears EXACTLY
once — no post-join dedup, which also means aggregations over matches
need no distinct.

Scale shape: one shuffle of each side on the bin key; interval-side
replication factor is ⌈len/bin⌉ + 1 ≤ 2 by the bin-width contract
(enforced, not assumed). Hot bins (rush hour) are the skew risk — salt
the bin key or widen AQE skew-join thresholds, same levers as any hash
join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_seconds: int,
    extra_cond: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start_ts <= point_ts <= end_ts`` via bin equi-keys.

    ``bin_seconds`` must be ≥ the longest interval (enforced with a
    runtime assertion folded into the plan — a violating interval would
    silently miss matches, so it fails loudly instead). Column names
    must be disjoint enough to reference unambiguously; ``extra_cond``
    adds equi/theta predicates (e.g. key equality, id inequality).

    ``how='inner'`` emits matching pairs. No outer form: left-outer
    over binned replication would need per-point match counting —
    compose with a left anti join against the matched point ids when
    "points with no interval" is needed.
    """
    if how != "inner":
        raise ValueError("binned range join supports how='inner' only")
    w = F.lit(int(bin_seconds))
    # Fail loudly on intervals wider than a bin: raise_error inside a
    # filter that is true for conforming rows keeps this fully
    # distributed (no driver-side max() pre-scan).
    len_ok = F.unix_timestamp(F.col(end_ts)) - F.unix_timestamp(
        F.col(start_ts)
    ) <= w
    checked = intervals.filter(
        F.when(len_ok, F.lit(True)).otherwise(
            F.raise_error(
                F.format_string(
                    "interval longer than bin_seconds=%s: start=%s end=%s",
                    F.lit(str(bin_seconds)),
                    F.col(start_ts).cast("string"),
                    F.col(end_ts).cast("string"),
                )
            )
        )
    )
    ivals = checked.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_ts)) / w),
                F.floor(F.unix_timestamp(F.col(end_ts)) / w),
            )
        ),
    )
    pts = points.withColumn(
        "_bin", F.floor(F.unix_timestamp(F.col(point_ts)) / w)
    )
    cond = (
        (pts["_bin"] == ivals["_bin"])
        & (F.col(point_ts) >= F.col(start_ts))
        & (F.col(point_ts) <= F.col(end_ts))
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    return pts.join(ivals, cond, "inner").drop("_bin")
