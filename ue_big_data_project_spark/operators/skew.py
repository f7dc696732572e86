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
    planning_fraction: float | None = None,
    safety: int = 2,
    estimate_output: bool = False,
) -> tuple[DataFrame, dict]:
    """Pick the physical join strategy from SKETCH evidence and apply
    it: returns ``(joined, decision)`` where ``decision`` records what
    was measured and why.

    The planning pass is bounded regardless of input size — exactly the
    measurements the sketches exist to make cheap at 100 TB:

    - ``other.count()`` (one scan, no shuffle) → broadcast eligibility;
    - ONE fused pass over ``big``'s join key builds the count-min
      counter table (≤ depth×width integers shuffled) and reads BOTH
      planning numbers off it in a single bounded aggregate: the exact
      row count (row 0's counters partition the keys, so their sum IS
      n; ``concat_ws`` never yields NULL, so no row escapes the
      sketch's NULL filter) and ``max_key_freq_est``, an
      over-estimate-only bound on the hottest key's row count. The
      round-7 plan paid ``big.count()`` PLUS the counter build — two
      full scans; fusing them halves planning cost with the identical
      decision (A/B in ``scripts/join_plan_ab.py``). If even the
      OVER-estimate is under ``skew_ratio``× the average reducer load,
      the key is provably not skewed — the one-sided CMS error aims
      the test in the safe direction (false "skewed" possible, false
      "uniform" not).

    ``planning_fraction`` (round-7 verdict task 4) bounds planning cost
    for inputs where even one full scan is too expensive: the fused
    pass runs over a seeded Bernoulli sample of ``big``. The skew test
    is a RATIO (max_key_freq / (n/partitions)), so the sample fraction
    cancels and the sampled test needs no rescaling; sampling noise is
    two-sided, so the bar drops by ``safety`` (default 2 — declare
    skewed at half the ratio), which errs only toward ``salted`` (a
    semantics-identical plan) and makes a missed true hot key require
    the sampled count to fall below HALF its expectation — for a key
    worth salting (≥ skew_ratio·n/partitions rows, e.g. ≥ 4·10⁶ rows
    at n=10⁹/parts=2000/ratio=8) and any fraction ≥ 10⁻⁴, a
    ≤ exp(−p·f/8) ≈ exp(−50) Chernoff tail. Exact mode (None, the
    default) keeps the PROVABLE one-sided guarantee; pass a fraction
    when ``big`` is a raw warehouse-scale scan.

    ``estimate_output=True`` additionally records
    ``decision["est_join_rows"]`` — the CMS inner-product upper bound
    on the join's OUTPUT size (:func:`~ue_big_data_project_spark.
    operators.sketch.cms_join_size`, over-estimate only) from the
    big-side counters the planner already built plus one counter pass
    over ``other``'s key (respecting ``planning_fraction`` on the big
    side, rescaled). Opt-in because it costs that extra ``other`` scan;
    the number a caller reads to refuse or budget an exploding join
    before running it. Skipped on the broadcast branch (the small side
    was already counted exactly).

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

    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in on])
    keys = big.select(key.alias("_k"))
    ratio_bar = skew_ratio
    if planning_fraction is not None:
        if not 0.0 < planning_fraction <= 1.0:
            raise ValueError(
                f"planning_fraction must be in (0, 1]: {planning_fraction}"
            )
        keys = keys.sample(fraction=planning_fraction, seed=7)
        ratio_bar = skew_ratio / max(safety, 1)
        decision["planning"] = {
            "mode": "sampled",
            "fraction": planning_fraction,
            "safety": safety,
        }
    else:
        decision["planning"] = {"mode": "exact"}
    parts = shuffle_partitions or int(
        big.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    # One job reads both numbers off the bounded counter table: row 0's
    # buckets partition the (sampled) keys so their sum is the exact
    # (sampled) row count; the max cell is the one-sided hot-key bound.
    counters = cms_counters(keys, F.col("_k"))
    if estimate_output:
        # The bounded counter table gets a second consumer (the join-size
        # inner product) — checkpoint so the key scan runs once.
        counters = counters.localCheckpoint(eager=True)
    stats = (
        counters.agg(
            F.sum(F.when(F.col("row_idx") == 0, F.col("cnt")))
            .cast("long")
            .alias("n"),
            F.max("cnt").alias("m"),
        )
        .collect()[0]
    )
    n_keys = stats["n"] or 0  # empty (or empty-sample) big side
    max_freq = stats["m"] or 0
    avg_load = max(n_keys // max(parts, 1), 1)
    scale = 1.0 / planning_fraction if planning_fraction else 1.0
    decision.update(
        n_big=int(n_keys * scale),
        max_key_freq_est=int(max_freq * scale),
        avg_reducer_load=int(avg_load * scale),
        skew_ratio_est=round(max_freq / avg_load, 2),
    )
    if estimate_output:
        from ue_big_data_project_spark.operators.sketch import cms_join_size

        other_key = F.concat_ws(
            "\x1f", *[F.col(c).cast("string") for c in on]
        )
        oc = cms_counters(other.select(other_key.alias("_k")), F.col("_k"))
        raw = cms_join_size(counters, oc).collect()[0]["est_join_rows"]
        # The big side's counts were sampled at `planning_fraction`; the
        # inner product is linear in them, so one rescale restores the
        # full-input bound (in expectation — sampled mode trades the
        # strict one-sidedness for bounded planning cost, as above).
        decision["est_join_rows"] = int(raw * scale)
    if max_freq >= ratio_bar * avg_load and n_keys > 0:
        decision["strategy"] = "salted"
        return (
            salted_shuffle_join(
                big, other, on, salt_buckets=salt_buckets, how=how
            ),
            decision,
        )
    decision["strategy"] = "shuffle"
    return big.join(other, on, how), decision
