"""Skew mitigation: salted aggregation and salted broadcast join.

AQE's skew-join splitting (enabled in ``session.get_spark``) handles
sort-merge join skew at runtime; these helpers cover the two cases AQE
does not: a grouped aggregation whose GROUP BY key is hot, and an
explicit salt for repeatable plans. Salting is semantics-preserving for
any algebraic aggregate: partial-aggregate on (key, salt), then final
aggregate on key — the shuffle spreads a hot key over ``salt_buckets``
reducers instead of one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted(df: DataFrame, salt_buckets: int = 32, col_name: str = "_salt") -> DataFrame:
    """Attach a uniform salt column in [0, salt_buckets).

    Derived from a hash of the whole row (via ``monotonically_increasing_id``
    is NOT used — it breaks determinism across retries); ``rand`` with a
    fixed seed keeps retried tasks consistent within a job.
    """
    return df.withColumn(
        col_name, (F.rand(seed=42) * salt_buckets).cast("int")
    )


_COMBINERS = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase grouped aggregation for hot keys.

    ``aggs`` maps output name → (kind, column) with kind in
    sum/count/min/max; the final phase recombines partials with the
    matching combiner (count recombines with sum).

    Phase 1 groups on (keys + salt): a key with 10⁹ rows becomes
    ``salt_buckets`` partial rows. Phase 2 groups on keys alone over the
    tiny partial table. For low-cardinality hot aggregations this is the
    difference between one straggler reducer and an even shuffle.
    (avg = salted sum / salted count, composed by the caller.)
    """
    partial_cols, final_cols = [], []
    for name, (kind, col) in aggs.items():
        partial_fn, final_fn = _COMBINERS[kind]
        partial_cols.append(partial_fn(col).alias(f"_p_{name}"))
        final_cols.append(final_fn(f"_p_{name}").alias(name))
    phase1 = salted(df, salt_buckets).groupBy(*keys, "_salt").agg(*partial_cols)
    return phase1.groupBy(*keys).agg(*final_cols)


def salted_shuffle_join(
    big: DataFrame,
    medium: DataFrame,
    on: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi join when the other side is too big to broadcast:
    salt the skewed side, REPLICATE the medium side to every salt
    bucket, and join on (keys + salt) — a hot key's rows spread over
    ``salt_buckets`` reducers instead of stalling one.

    Cost model: the medium side shuffles ``salt_buckets``× its size (the
    price of spreading the hot key); pick the smallest bucket count that
    dissolves the straggler. Use when AQE's skew splitting can't help —
    e.g. the skew is in a grouped downstream stage, or the plan must be
    static (Structured Streaming, where AQE is off).

    Semantics-preserving for ``inner`` and ``left`` joins (each big row
    carries exactly one salt, so it meets each matching medium row
    once). Right/full outer would emit one null-padded row per salt for
    unmatched medium rows — rejected.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_shuffle_join supports inner/left, got {how!r}: "
            "outer-on-the-replicated-side would duplicate unmatched rows"
        )
    big_salted = salted(big, salt_buckets)
    replicated = medium.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return big_salted.join(replicated, [*on, "_salt"], how).drop("_salt")


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_buckets: int = 32,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi join: broadcast the small side, no shuffle of the
    big side at all — the degenerate (and best) salting case. Provided
    as the named idiom so call sites say what they mean; Spark's own
    ``broadcast()`` does the work.
    """
    return big.join(F.broadcast(small), on, how)


def sketch_join_plan(
    big: DataFrame,
    other: DataFrame,
    on: list[str],
    broadcast_rows: int = 1_000_000,
    skew_ratio: int = 8,
    shuffle_partitions: int | None = None,
    salt_buckets: int = 16,
    how: str = "inner",
) -> tuple[DataFrame, dict]:
    """Pick the physical join strategy from SKETCH evidence and apply
    it: returns ``(joined, decision)`` where ``decision`` records what
    was measured and why.

    The planning pass is bounded regardless of input size — exactly the
    measurements the sketches exist to make cheap at 100 TB:

    - ``other.count()`` (one scan, no shuffle) → broadcast eligibility;
    - a count-min counter table over ``big``'s join key (≤ depth×width
      integers shuffled) → ``max_key_freq_est``, an over-estimate-only
      bound on the hottest key's row count. If even the OVER-estimate
      is under ``skew_ratio``× the average reducer load, the key is
      provably not skewed — the one-sided CMS error aims the test in
      the safe direction (false "skewed" possible, false "uniform"
      not).

    Strategies: ``broadcast`` (small side under ``broadcast_rows``),
    ``salted`` (hot key spread over ``salt_buckets`` reducers via
    :func:`salted_shuffle_join`), else ``shuffle`` (plain — AQE's
    runtime skew splitting remains as the backstop). All three are
    semantics-identical for inner/left equi joins.
    """
    from ue_big_data_project_spark.operators.sketch import cms_counters

    n_other = other.count()
    decision: dict = {"n_other": n_other}
    if n_other <= broadcast_rows:
        decision["strategy"] = "broadcast"
        return salted_broadcast_join(big, other, on, how=how), decision

    n_big = big.count()
    parts = shuffle_partitions or int(
        big.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in on])
    max_freq = (
        cms_counters(big.select(key.alias("_k")), F.col("_k"))
        .agg(F.max("cnt").alias("m"))
        .collect()[0]["m"]
    ) or 0  # empty big side: no counters → no skew, plain shuffle
    avg_load = max(n_big // max(parts, 1), 1)
    decision.update(
        n_big=n_big,
        max_key_freq_est=int(max_freq),
        avg_reducer_load=avg_load,
        skew_ratio_est=round(max_freq / avg_load, 2),
    )
    if max_freq >= skew_ratio * avg_load:
        decision["strategy"] = "salted"
        return (
            salted_shuffle_join(
                big, other, on, salt_buckets=salt_buckets, how=how
            ),
            decision,
        )
    decision["strategy"] = "shuffle"
    return big.join(other, on, how), decision
