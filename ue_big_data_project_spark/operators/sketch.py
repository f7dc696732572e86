"""Mergeable cardinality sketches: HyperLogLog registers and KMV
(k-minimum-values), built from engine-portable integer hash math.

Beyond-reference capability (the reference has no approximate
aggregates): at 100 TB an exact COUNT(DISTINCT) shuffles every distinct
value; these sketches shuffle BOUNDED per-group state instead —
``m`` registers (HLL) or ``k`` hashes (KMV) — and, critically, they
MERGE: per-source / per-day sketch sidecars union into a corpus-wide
estimate without rescanning any corpus data, the same incremental
contract as the persisted BM25/IVF indexes (``retrieval.py`` /
``similarity.py``).

Determinism (the DuckDB-oracle contract, see ``queries/sketches.py``):

- The hash is the first 12 md5 hex digits of the value string → a
  48-bit integer, the repo's established portable hash (both engines
  agree on ``md5`` + ``strpos/instr``; same construction as
  ``pipelines.hash_bucket`` and the MinHash signatures).
- HLL registers store ``min_term`` = 2^(R − rho) as an INTEGER (rho =
  leading-1 position of the sub-bucket bits, R its maximum), decoded by
  a generated threshold CASE — no float ops anywhere in the register
  path, so sums are exact and order-independent across partitionings
  and engines. Only the FINAL estimate performs float arithmetic
  (3 IEEE ops + round), identical in both engines.
- KMV is integer end-to-end: estimate = (k−1)·2^48 DIV h_(k).
- The raw HLL harmonic estimator is used WITHOUT the small-range
  linear-counting branch (its ``ln`` is the one op whose last-ulp
  behavior engines don't contractually share); callers below
  ~2.5·m distinct per group should size ``p`` down or use KMV, which
  is exact below k and unbiased-integer above.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

H_HEX_DIGITS = 12
H_BITS = 4 * H_HEX_DIGITS  # 48
H_SPACE = 1 << H_BITS


def hash48_sql(expr: str) -> str:
    """48-bit integer hash of string ``expr`` as engine-portable SQL:
    first 12 md5 hex digits, each decoded via ``strpos`` against the
    hex alphabet (DuckDB and Spark agree on md5/substr/strpos —
    ``functions.hex_digit_value`` documents the contract)."""
    return (
        "("
        + " + ".join(
            f"(strpos('0123456789abcdef', substr(md5({expr}), {k + 1}, 1)) - 1)"
            f" * {16 ** (H_HEX_DIGITS - 1 - k)}"
            for k in range(H_HEX_DIGITS)
        )
        + ")"
    )


def hash48(col: Column) -> Column:
    """Native-Spark twin of :func:`hash48_sql` (instr == strpos)."""
    h = F.md5(col)
    out = None
    for k in range(H_HEX_DIGITS):
        digit = (
            F.instr(F.lit("0123456789abcdef"), F.substring(h, k + 1, 1)) - 1
        ).cast("long") * F.lit(16 ** (H_HEX_DIGITS - 1 - k))
        out = digit if out is None else out + digit
    return out


def _term_case_sql(r_expr: str, w: int) -> str:
    """``2^(R − rho)`` of sub-bucket value ``r`` (w bits, R = w+1) as a
    pure-integer threshold CASE: r ≥ 2^(w−1) → rho=1 → 2^w, halving
    down to r ≥ 1 → rho=w → 2, r = 0 → rho=w+1 → 1. Generated once and
    run VERBATIM by both engines — zero float ops, so register sums
    are exact integers."""
    whens = " ".join(
        f"WHEN {r_expr} >= {1 << (w - rho)} THEN {1 << (w + 1 - rho)}"
        for rho in range(1, w + 1)
    )
    return f"(CASE {whens} ELSE 1 END)"


def hll_alpha(m: int) -> float:
    """Standard HLL bias constant for ``m`` registers (Flajolet et al.
    2007): tabulated below 128, the asymptotic form above."""
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    value: Column,
    p: int = 6,
) -> DataFrame:
    """Per-group HLL register table: ``(group_cols…, bucket, min_term)``.

    ``bucket`` = hash48 mod 2^p; ``min_term`` = 2^(R − max rho) over the
    bucket's values (min of per-row terms ⇔ max of rho). ``min`` is a
    partial aggregate, so the ONE shuffle carries ≤ 2^p integers per
    group per map task regardless of input size — the bounded-state
    property that makes this the at-scale distinct counter. Absent
    buckets mean rho=0; :func:`hll_estimate` adds their 2^R terms back.
    """
    m = 1 << p
    w = H_BITS - p
    h = hash48(value)
    base = df.select(
        *group_cols,
        (h % F.lit(m)).alias("bucket"),
        ((h - h % F.lit(m)) / F.lit(m)).cast("long").alias("r"),
    )
    term = F.expr(_term_case_sql("r", w))
    return base.groupBy(*group_cols, "bucket").agg(
        F.min(term).alias("min_term")
    )


def hll_merge(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union two register tables: per (group, bucket) the max rho wins,
    i.e. ``min(min_term)``. Associative and idempotent — merging a
    sketch with itself, or re-merging an increment, is a no-op, which
    is what makes parquet register sidecars safely re-appendable."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bucket")
        .agg(F.min("min_term").alias("min_term"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str],
    p: int = 6,
    out_col: str = "est_distinct",
    scale: int = 4,
) -> DataFrame:
    """Raw harmonic HLL estimate per group from a register table.

    ``S = Σ min_term + (m − observed)·2^R`` is an exact integer (the
    unseen-bucket correction); the estimate ``α_m·m²·2^R / S`` is then
    3 IEEE double ops + a half-up round — bit-identical in any engine
    given the same integers. No linear-counting branch (see module
    docstring)."""
    from ue_big_data_project_spark.functions import pround

    m = 1 << p
    w = H_BITS - p
    two_r = 1 << (w + 1)
    alpha = hll_alpha(m)
    s = (
        F.sum("min_term").cast("long")
        + (F.lit(m) - F.count(F.lit(1))) * F.lit(two_r)
    ).alias("s")
    agg = registers.groupBy(*group_cols).agg(s)
    est = F.lit(alpha) * F.lit(float(m * m)) * F.lit(float(two_r)) / F.col(
        "s"
    ).cast("double")
    return agg.select(*group_cols, pround(est, scale).alias(out_col))


def hll_estimate_sql(
    table_sql: str,
    group_cols: list[str],
    value_sql: str,
    p: int = 6,
    out_col: str = "est_distinct",
    scale: int = 4,
) -> str:
    """DuckDB/ANSI twin of registers→estimate over ``table_sql``
    (a FROM-able relation string). Emits the same generated hash and
    term CASE text the Spark side evaluates, so values hash-match."""
    from ue_big_data_project_spark.functions import sql_round

    m = 1 << p
    w = H_BITS - p
    two_r = 1 << (w + 1)
    alpha = hll_alpha(m)
    grps = ", ".join(group_cols)
    # 'e0' suffix: bare decimal-point literals parse as DECIMAL in both
    # Spark SQL and DuckDB (registry convention — see queries/__init__).
    est = (
        f"{alpha!r}e0 * {float(m * m)!r}e0 * {float(two_r)!r}e0 / "
        f"CAST(s AS DOUBLE)"
    )
    return f"""
WITH hashed AS (
  SELECT {grps}, {hash48_sql(value_sql)} AS h FROM {table_sql}
), bucketed AS (
  SELECT {grps}, h % {m} AS bucket,
         CAST((h - (h % {m})) / {m} AS BIGINT) AS r
  FROM hashed
), reg AS (
  SELECT {grps}, bucket, MIN({_term_case_sql('r', w)}) AS min_term
  FROM bucketed GROUP BY {grps}, bucket
), summed AS (
  SELECT {grps},
         CAST(SUM(min_term) AS BIGINT)
           + ({m} - COUNT(*)) * {two_r} AS s
  FROM reg GROUP BY {grps}
)
SELECT {grps}, {sql_round(est, scale)} AS {out_col} FROM summed
"""


# --------------------------------------------------------------------------
# KMV — k minimum values. Integer end-to-end; exact below k.
# --------------------------------------------------------------------------


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value: Column,
    k: int = 32,
    threshold: Column | None = None,
) -> DataFrame:
    """Per-group KMV sketch: ``(group_cols…, kmin array<long>)`` — the k
    smallest distinct 48-bit hashes.

    ``threshold`` (optional, a per-row upper-bound column) prunes
    EXACTLY: a hash ≥ the current sketch's k-th minimum can never enter
    the merged k-min set, so incremental maintenance filters the
    increment before any shuffle — increment-bounded like
    ``ivf_index_append``. The initial build's ``collect_set`` partial
    state is O(distinct-per-group ∩ below-threshold); for grand-total
    sketches over high-cardinality keys, build per-source sketches
    (bounded groups) and :func:`kmv_merge` the sidecars instead.
    """
    h = hash48(value)
    base = df.select(*group_cols, h.alias("h"))
    if threshold is not None:
        base = base.filter(F.col("h") < threshold)
    return base.groupBy(*group_cols).agg(
        F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("kmin")
    )


def kmv_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str], k: int = 32
) -> DataFrame:
    """Union two KMV sketches: k smallest of the merged distinct hash
    sets — via explode + re-aggregate, so the merge is the same
    bounded shuffle shape as the build (k values per group per side)."""
    rows = a.unionByName(b).select(
        *group_cols, F.explode("kmin").alias("h")
    )
    return rows.groupBy(*group_cols).agg(
        F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("kmin")
    )


def kmv_estimate(
    sketch: DataFrame,
    group_cols: list[str],
    k: int = 32,
    out_col: str = "est_distinct",
) -> DataFrame:
    """Distinct estimate per group: ``(k−1)·2^48 DIV h_(k)`` when the
    sketch is full, else the EXACT distinct count (a partial sketch
    holds every distinct hash). Pure integer arithmetic."""
    full = F.size("kmin") >= k
    est = F.expr(
        f"CAST({(k - 1) * H_SPACE} DIV try_element_at(kmin, {k}) AS BIGINT)"
    )
    return sketch.select(
        *group_cols,
        F.when(full, est).otherwise(F.size("kmin").cast("long")).alias(
            out_col
        ),
    )


# --------------------------------------------------------------------------
# Count-min — frequency sketch. Integer counters; est >= exact always.
# --------------------------------------------------------------------------

CMS_PRIME = 4294967291  # largest 32-bit prime — the MinHash modulus
#                         (operators/dedup.py), reused for the same
#                         Kirsch–Mitzenmacher row-hash construction.


def _km_halves(value: Column) -> tuple[Column, Column]:
    """The two 32-bit md5 halves feeding ``h_i = (a + i·b) mod p`` —
    one md5 per value for all ``depth`` row hashes (the construction
    minhash_signatures documents)."""
    h = F.md5(value)
    a = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    b = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    return a, b


def cms_counters(
    df: DataFrame,
    value: Column,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-min counter table ``(row_idx, bucket, cnt)`` over ``value``
    occurrences: ``depth`` independent-enough row hashes, each bucketed
    mod ``width``.

    The shuffle carries at most ``depth × width`` integer counters per
    map task (``count`` partial-aggregates), however many rows scan —
    and two counter tables MERGE by adding counts
    (:func:`cms_merge`), so per-source/per-day sidecars compose like
    the HLL registers. Point lookups over-estimate only (min of d
    counters ≥ true count, never under) — the standard CMS guarantee.
    """
    a, b = _km_halves(value)
    rb = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row_idx"),
                    (((a + F.lit(i) * b) % F.lit(CMS_PRIME)) % F.lit(width)).alias(
                        "bucket"
                    ),
                )
                for i in range(depth)
            ]
        )
    ).alias("rb")
    return (
        df.select(rb)
        .select("rb.row_idx", "rb.bucket")
        .groupBy("row_idx", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Counter addition — associative, so sidecars union in any order."""
    return (
        a.unionByName(b)
        .groupBy("row_idx", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def cms_lookup(
    counters: DataFrame,
    items: DataFrame,
    value: Column,
    depth: int = 4,
    width: int = 1024,
    out_col: str = "est_count",
) -> DataFrame:
    """Point-frequency estimate per item row: min of the item's
    ``depth`` counters. The counter table is bounded (≤ depth × width
    rows) so the join broadcasts; absent counters mean the value was
    never seen → 0."""
    a, b = _km_halves(value)
    probes = items.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_idx"),
                        (
                            ((a + F.lit(i) * b) % F.lit(CMS_PRIME))
                            % F.lit(width)
                        ).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb"),
    ).select("*", "rb.row_idx", "rb.bucket").drop("rb")
    item_cols = [c for c in items.columns]
    joined = probes.join(
        F.broadcast(counters), ["row_idx", "bucket"], "left"
    ).withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
    return joined.groupBy(*item_cols).agg(
        F.min("cnt").cast("long").alias(out_col)
    )


def kmv_estimate_sql(
    table_sql: str,
    group_cols: list[str],
    value_sql: str,
    k: int = 32,
    out_col: str = "est_distinct",
) -> str:
    """DuckDB twin: distinct hashes → per-group rank → k-th minimum →
    the same integer estimate (``//`` floors BIGINT in DuckDB exactly
    as Spark's ``DIV``)."""
    grps = ", ".join(group_cols)
    return f"""
WITH hashed AS (
  SELECT DISTINCT {grps}, {hash48_sql(value_sql)} AS h FROM {table_sql}
), ranked AS (
  SELECT {grps}, h,
         row_number() OVER (PARTITION BY {grps} ORDER BY h) AS rn
  FROM hashed
)
SELECT {grps},
       CAST(CASE WHEN COUNT(*) >= {k}
                 THEN ({(k - 1) * H_SPACE}) // MAX(CASE WHEN rn = {k} THEN h END)
                 ELSE COUNT(*) END AS BIGINT) AS {out_col}
FROM ranked GROUP BY {grps}
"""
