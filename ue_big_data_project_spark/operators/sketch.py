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

from ue_big_data_project_spark.session import local_relation

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

    NULL values are EXCLUDED before bucketing — COUNT(DISTINCT)
    semantics, shared by the whole sketch family (KMV's collect_set
    drops NULLs natively). Without the filter a NULL hashes to a
    phantom ``bucket = NULL`` register whose min_term=1 (maximum-rho
    evidence) ALSO counts toward ``observed``, so a fully-occupied
    group would push the unseen-bucket correction ``m − observed``
    negative and corrupt S (round-7 advice).
    """
    m = 1 << p
    w = H_BITS - p
    h = hash48(value)
    base = df.filter(value.isNotNull()).select(
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
    term CASE text the Spark side evaluates, so values hash-match —
    including the NULL-exclusion WHERE mirroring
    :func:`hll_registers`."""
    from ue_big_data_project_spark.functions import sql_round

    if not group_cols:
        raise ValueError(
            "hll_estimate_sql requires at least one group column: the generated SQL "
            "joins group names into SELECT/GROUP BY text (for a global "
            "sketch, add a constant group column on both engines)"
        )
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
  WHERE ({value_sql}) IS NOT NULL
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

    NULLs are excluded by construction: ``hash48(NULL)`` is NULL and
    ``collect_set`` drops NULLs — the COUNT(DISTINCT) semantics the
    whole sketch family shares (see :func:`hll_registers`).
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

    NULL values are EXCLUDED — the sketch family's shared semantics
    (see :func:`hll_registers`): a NULL hashes to NULL buckets that no
    probe can ever hit, so counting it would inflate bucket totals
    with occurrences that are unreachable by lookup.
    """
    df = df.filter(value.isNotNull())
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
        # The build parameters ride the table as column metadata — a
        # schema-level params sidecar (round-9 advice). Metadata
        # survives select/filter and a parquet round-trip (Spark stores
        # the full StructField in the footer schema), so persisted
        # counter sidecars keep their provenance and consumers can
        # validate DECLARED == RECORDED instead of inferring parameters
        # from the observed bucket range — which cannot distinguish a
        # table built with a SMALLER width than declared.
        .agg(
            F.count(F.lit(1))
            .cast("long")
            .alias("cnt", metadata={"cms_depth": depth, "cms_width": width})
        )
    )


def cms_params(counters: DataFrame) -> tuple[int, int] | None:
    """``(depth, width)`` a counter table RECORDS it was built with
    (:func:`cms_counters` column metadata, parquet-round-trip-safe), or
    None for tables from other producers (SQL twins, external)."""
    try:
        md = counters.schema["cnt"].metadata
    except KeyError:
        return None
    if md and "cms_depth" in md and "cms_width" in md:
        return int(md["cms_depth"]), int(md["cms_width"])
    return None


def _cms_reattach_params(
    merged: DataFrame, params: tuple[int, int] | None
) -> DataFrame:
    if params is None:
        return merged
    depth, width = params
    return merged.withColumn(
        "cnt",
        F.col("cnt").alias(
            "cnt", metadata={"cms_depth": depth, "cms_width": width}
        ),
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Counter addition — associative, so sidecars union in any order.
    Sides that RECORD their build parameters (:func:`cms_counters`
    metadata) must agree — adding counters from differently-hashed
    tables is meaningless — and the merged table keeps the recorded
    params so validation survives arbitrarily long merge chains."""
    pa, pb = cms_params(a), cms_params(b)
    if pa is not None and pb is not None and pa != pb:
        raise ValueError(
            f"cms_merge: mismatched counter parameters — left built with "
            f"depth={pa[0]}/width={pa[1]}, right with depth={pb[0]}/"
            f"width={pb[1]}; counters from differently-parameterized "
            "sketches must not be added"
        )
    merged = (
        a.unionByName(b)
        .groupBy("row_idx", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    return _cms_reattach_params(merged, pa if pa is not None else pb)


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
    never seen → 0. A counter table that RECORDS its build parameters
    (:func:`cms_counters` metadata) must match the declaration —
    probing with mismatched hashes reads arbitrary buckets and the
    min is no longer an upper bound."""
    recorded = cms_params(counters)
    if recorded is not None and recorded != (depth, width):
        raise ValueError(
            f"cms_lookup: counter table records it was built with "
            f"depth={recorded[0]}/width={recorded[1]} but depth={depth}/"
            f"width={width} was declared — probe hashes would not match "
            "the build"
        )
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
    as Spark's ``DIV``). NULL values are excluded by WHERE — SQL's
    DISTINCT would otherwise keep a NULL row that Spark's collect_set
    silently drops, a cross-engine divergence on NULL-bearing input."""
    if not group_cols:
        raise ValueError(
            "kmv_estimate_sql requires at least one group column: the generated SQL "
            "joins group names into SELECT/GROUP BY text (for a global "
            "sketch, add a constant group column on both engines)"
        )
    grps = ", ".join(group_cols)
    return f"""
WITH hashed AS (
  SELECT DISTINCT {grps}, {hash48_sql(value_sql)} AS h FROM {table_sql}
  WHERE ({value_sql}) IS NOT NULL
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


# --------------------------------------------------------------------------
# KMV set operations — union / intersection estimates from two sketches.
# --------------------------------------------------------------------------


def kmv_set_estimates(
    a: DataFrame,
    b: DataFrame,
    group_cols: list[str],
    k: int = 32,
) -> DataFrame:
    """Set-algebra distinct estimates from two KMV sketches (Beyer et
    al. 2007): ``(group_cols…, est_union, est_overlap, est_only_a,
    est_only_b)``.

    K = the k smallest hashes of the combined sketches is itself the
    KMV sketch of A ∪ B, so ``est_union`` is the plain KMV estimate on
    K; K's members partition into {in both, only in A, only in B}, and
    each class is a uniform sample of the union, so each estimate is
    ``(class_size · est_union) DIV k``. Pure integer — bit-identical
    across engines — and when the union carries fewer than k distinct
    hashes both inputs are complete hash sets, so the "estimates"
    degrade to EXACT counts. Sketch-only input: two sources never
    co-scan, the at-scale overlap-audit shape (which corpora share how
    many documents/users, how much is unique to each?) from bounded
    sidecars.
    """
    aj = a.withColumnRenamed("kmin", "kmin_a")
    bj = b.withColumnRenamed("kmin", "kmin_b")
    j = aj.join(bj, group_cols) if group_cols else aj.crossJoin(bj)
    j = j.select(
        *group_cols,
        F.slice(
            F.array_sort(F.array_union("kmin_a", "kmin_b")), 1, k
        ).alias("ku"),
        F.size(F.array_distinct(F.array_union("kmin_a", "kmin_b"))).alias(
            "usz"
        ),
        F.size(
            F.array_intersect(
                F.slice(F.array_sort(F.array_union("kmin_a", "kmin_b")), 1, k),
                F.array_intersect("kmin_a", "kmin_b"),
            )
        ).alias("matches"),
        F.size(
            F.array_except(
                F.slice(F.array_sort(F.array_union("kmin_a", "kmin_b")), 1, k),
                F.col("kmin_b"),
            )
        ).alias("m_a_only"),
        F.size(
            F.array_except(
                F.slice(F.array_sort(F.array_union("kmin_a", "kmin_b")), 1, k),
                F.col("kmin_a"),
            )
        ).alias("m_b_only"),
    )
    full = F.col("usz") >= k
    est_u = F.expr(
        f"CAST({(k - 1) * H_SPACE} DIV try_element_at(ku, {k}) AS BIGINT)"
    )
    j = j.select(
        *group_cols,
        F.when(full, est_u).otherwise(F.col("usz").cast("long")).alias(
            "est_union"
        ),
        "usz",
        "matches",
        "m_a_only",
        "m_b_only",
    )

    def _part(m_col: str) -> Column:
        # ρ·est_union with ρ = members-of-K share; every K member is in
        # exactly one of {both, a-only, b-only}, so the three partition
        # estimates sum to (k·est_union) DIV k-rounded pieces of the
        # union estimate.
        est = F.expr(f"CAST(({m_col} * est_union) DIV {k} AS BIGINT)")
        return F.when(full, est).otherwise(F.col(m_col).cast("long"))

    return j.select(
        *group_cols,
        "est_union",
        _part("matches").alias("est_overlap"),
        _part("m_a_only").alias("est_only_a"),
        _part("m_b_only").alias("est_only_b"),
    )


def kmv_set_estimates_sql(
    a_table_sql: str,
    b_table_sql: str,
    a_value_sql: str,
    b_value_sql: str,
    k: int = 32,
) -> str:
    """DuckDB twin of :func:`kmv_set_estimates` for UNGROUPED (global)
    sketches over two FROM-able relations: one row ``(est_union,
    est_overlap, est_only_a, est_only_b)``, the same integer
    formulas."""
    return f"""
WITH sa AS (
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rn FROM (
      SELECT DISTINCT {hash48_sql(a_value_sql)} AS h FROM {a_table_sql}
      WHERE ({a_value_sql}) IS NOT NULL
    )
  ) WHERE rn <= {k}
), sb AS (
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rn FROM (
      SELECT DISTINCT {hash48_sql(b_value_sql)} AS h FROM {b_table_sql}
      WHERE ({b_value_sql}) IS NOT NULL
    )
  ) WHERE rn <= {k}
), un AS (
  SELECT h FROM sa UNION SELECT h FROM sb
), ku AS (
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rn FROM un
  ) WHERE rn <= {k}
), stats AS (
  SELECT (SELECT COUNT(*) FROM un) AS usz,
         (SELECT MAX(h) FROM ku) AS kth,
         (SELECT COUNT(*) FROM ku
          WHERE h IN (SELECT h FROM sa) AND h IN (SELECT h FROM sb))
           AS matches,
         (SELECT COUNT(*) FROM ku
          WHERE h NOT IN (SELECT h FROM sb)) AS m_a_only,
         (SELECT COUNT(*) FROM ku
          WHERE h NOT IN (SELECT h FROM sa)) AS m_b_only
), eu AS (
  SELECT usz, matches, m_a_only, m_b_only,
         CASE WHEN usz >= {k}
              THEN CAST({(k - 1) * H_SPACE} // kth AS BIGINT)
              ELSE CAST(usz AS BIGINT) END AS est_union
  FROM stats
)
SELECT est_union,
       CASE WHEN usz >= {k}
            THEN CAST((matches * est_union) // {k} AS BIGINT)
            ELSE CAST(matches AS BIGINT) END AS est_overlap,
       CASE WHEN usz >= {k}
            THEN CAST((m_a_only * est_union) // {k} AS BIGINT)
            ELSE CAST(m_a_only AS BIGINT) END AS est_only_a,
       CASE WHEN usz >= {k}
            THEN CAST((m_b_only * est_union) // {k} AS BIGINT)
            ELSE CAST(m_b_only AS BIGINT) END AS est_only_b
FROM eu
"""


# --------------------------------------------------------------------------
# Quantile histogram — HDR-style log bins with linear sub-buckets.
# Integer bin ids, merge = counter addition, quantiles from the CDF.
# --------------------------------------------------------------------------

QH_SUB_BITS = 3  # 8 sub-buckets per octave → bin width ≤ 12.5% of its
#                  lower bound, the estimator's one-sided error bound
QH_MAX_BITS = 42  # bin/decode CASEs cover values < 2^42 (raise_error
#                  beyond) — covers cents-scaled prices at any TPC-H SF


def _fdiv2(expr: str, pow2: int) -> str:
    """Floor-divide non-negative ``expr`` by ``2^pow2`` as text BOTH
    engines run verbatim (Spark has ``DIV``, DuckDB ``//`` — neither
    parses the other's): dividing a double by a power of two only
    shifts the exponent, so for v < 2^52 the quotient and its floor are
    IEEE-exact in any engine."""
    if pow2 == 0:
        return f"({expr})"
    return f"CAST(floor(({expr}) / {float(1 << pow2)!r}e0) AS BIGINT)"


def qhist_bin_sql(v_expr: str, s: int = QH_SUB_BITS) -> str:
    """HDR bin id of non-negative BIGINT ``v_expr`` as engine-portable
    SQL.

    v < 2^s → bin = v (exact); else with b = bitlength(v) and
    shift = b − 1 − s, bin = shift·2^s + (v >> shift) — the top s+1
    bits, linear within each octave. Monotone in v, ≤ 2^s·(bits+1)
    bins total. The bit length is resolved by RANGE comparisons
    (``v < 2^b`` walking up), so the whole map is ~40 integer compares
    plus one power-of-two floor-division (IEEE-exact, :func:`_fdiv2`)
    — deliberately NO string/log ops: Catalyst substitutes this
    expression into pushed-down join/filter predicates verbatim, and a
    ``length(bin(v))`` formulation re-evaluated there cost 10× the
    scan (measured; see ``_qhist_binned``). Out-of-domain values map
    to NULL; :func:`qhist_counters` turns that into an error instead
    of a silently-wrong CDF."""
    m = 1 << s
    whens = " ".join(
        f"WHEN ({v_expr}) < {1 << b} THEN "
        f"{(b - 1 - s) * m} + {_fdiv2(v_expr, b - 1 - s)}"
        for b in range(s + 1, QH_MAX_BITS + 1)
    )
    guard = (
        f"WHEN ({v_expr}) < 0 OR ({v_expr}) >= {1 << QH_MAX_BITS} "
        f"THEN CAST(NULL AS BIGINT)"
    )
    # Domain guard FIRST: negatives would otherwise satisfy v < 2^s
    # and silently land in the small-value bins.
    return (
        f"(CASE {guard} WHEN ({v_expr}) < {m} THEN ({v_expr}) {whens} END)"
    )


def qhist_lower_sql(id_expr: str, s: int = QH_SUB_BITS) -> str:
    """Lower bound of bin ``id_expr`` — the quantile estimate read off
    the CDF. Exact inverse of the bin map's lower edge: id < 2^s →
    id; else lower = (2^s + id mod 2^s) · 2^(id div 2^s − 1)."""
    m = 1 << s
    div = _fdiv2(id_expr, s)
    whens = " ".join(
        f"WHEN {div} = {t} THEN "
        f"({m} + (({id_expr}) % {m})) * {1 << (t - 1)}"
        for t in range(1, QH_MAX_BITS - s + 1)
    )
    return f"(CASE WHEN ({id_expr}) < {m} THEN ({id_expr}) {whens} END)"


def _qhist_binned(
    df: DataFrame,
    group_cols: list[str],
    value: Column,
    s: int = QH_SUB_BITS,
) -> DataFrame:
    """``(group_cols…, v, bin)`` with the domain guard applied: NULL
    values dropped (SQL agg semantics), out-of-domain values RAISE
    pre-materialization — a NULL bin sorted into the CDF would silently
    shift every quantile (the pagerank decimal-guard precedent: fail
    loudly inside the job, not in the answer).

    The bin map is the RANGE-comparison formulation of
    :func:`qhist_bin_sql` — all integer compares, no string ops — so it
    stays cheap even where Catalyst substitutes it into pushed-down
    join/filter predicates (an inner join on ``bin`` pushes
    ``isnotnull(bin)`` below this projection with the full expression
    inlined; a ``length(bin(v))``-based map re-evaluated there made the
    probe join 10× the scan cost at sf0.1)."""
    vdf = df.select(*group_cols, value.cast("long").alias("v")).filter(
        F.col("v").isNotNull()
    )
    b = F.expr(qhist_bin_sql("v", s))
    # Guard on v directly (NOT on b.isNull()): testing the bin for NULL
    # would embed a second full copy of the CASE in the expression
    # tree, and pushdown multiplies copies further.
    guarded = F.when(
        (F.col("v") < 0) | (F.col("v") >= F.lit(1 << QH_MAX_BITS)),
        F.raise_error(
            F.lit(f"qhist: value outside [0, 2^{QH_MAX_BITS}) domain")
        ).cast("long"),
    ).otherwise(b)
    return vdf.select(*group_cols, "v", guarded.alias("bin"))


def qhist_counters(
    df: DataFrame,
    group_cols: list[str],
    value: Column,
    s: int = QH_SUB_BITS,
    weight: Column | None = None,
) -> DataFrame:
    """Per-group quantile-histogram counters ``(group_cols…, bin, cnt)``
    over a non-negative integer column.

    The ONE shuffle carries ≤ 2^s·(QH_MAX_BITS+1) integer counters per
    group per map task (count partial-aggregates) — bounded state like
    the HLL registers — and two counter tables merge by ADDING counts
    (:func:`qhist_merge`), so per-source/per-day histogram sidecars
    compose into corpus-wide quantiles without rescans.

    ``weight`` (optional, a non-negative INTEGER column — integers keep
    the counters exact and order-independent) makes the downstream
    quantiles WEIGHTED: with weight = token count over a documents
    table, ``qhist_quantiles(..., [("p90", 9, 10)])`` answers "what
    document length covers 90% of the tokens" — the mass-based cut a
    packing/budgeting pipeline actually wants — in the same bounded
    two-exchange plan as the unweighted form."""
    w = F.lit(1).cast("long") if weight is None else weight.cast("long")
    binned = _qhist_binned(
        df.select(*group_cols, value.alias("_qv"), w.alias("_qw")),
        [*group_cols, "_qw"],
        F.col("_qv"),
        s,
    )
    return (
        binned.groupBy(*group_cols, "bin")
        .agg(F.sum("_qw").cast("long").alias("cnt"))
    )


def qhist_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Counter addition — associative/commutative, sidecars compose in
    any order."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bin")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def qhist_quantiles(
    counters: DataFrame,
    group_cols: list[str],
    qs: list[tuple[str, int, int]],
    s: int = QH_SUB_BITS,
) -> DataFrame:
    """Quantile estimates per group from a counter table.

    ``qs`` = (out_col, numerator, denominator) fractions; for each, the
    estimate is the LOWER BOUND of the first bin whose cumulative count
    reaches rank ``ceil(num·N/den)`` — so est ≤ true q-th order
    statistic < est·(1 + 2^−s) + 1, the one-sided HDR guarantee
    (tests pin it). The CDF walk is a window over the ≤ 2^s·bits
    counter rows per group — bounded, nothing rescans the data."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols).orderBy("bin")
        if group_cols
        else Window.partitionBy(F.lit(1)).orderBy("bin")
    )
    cum = counters.select(
        *group_cols,
        "bin",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
    )
    outs = []
    for out_col, num, den in qs:
        # ceil(num·N/den) in pure integer: (num·N + den − 1) DIV den.
        r = F.expr(f"CAST(({num} * n + {den - 1}) DIV {den} AS BIGINT)")
        hit = cum.filter(F.col("cum") >= r).groupBy(*group_cols).agg(
            F.min("bin").alias("bin")
        )
        est = F.expr(qhist_lower_sql("bin", s)).cast("long")
        outs.append(hit.select(*group_cols, est.alias(out_col)))
    out = outs[0]
    for nxt in outs[1:]:
        out = (
            out.join(nxt, group_cols) if group_cols else out.crossJoin(nxt)
        )
    return out


def qhist_exact_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value: Column,
    qs: list[tuple[str, int, int]],
    s: int = QH_SUB_BITS,
) -> DataFrame:
    """EXACT order statistics in two bounded passes, with the histogram
    as the pruner — per group, one row with ``est_<q>`` (bin lower
    bound) and ``exact_<q>`` (true q-th smallest) per requested
    quantile.

    The naive exact quantile sorts every row of a group on one reducer
    — the thing that cannot work at 100 TB. Here pass 1 is the bounded
    counter build; the CDF walk then locates, for each quantile, its
    BIN and its residual rank within that bin; pass 2 sorts ONLY the
    rows that fall in hit bins (≤ #quantiles bins per group, each
    holding a ~2^−s fraction of the group by construction of the log
    bins — and the window partitions by (group, quantile), so even
    those sorts parallelize across quantiles). The exact value is a
    true order statistic — formulation-independent, so a plain
    rank-window oracle must hash-match it."""
    from pyspark.sql import Window

    binned = _qhist_binned(df, group_cols, value, s)
    # The counter table is ≤ 2^s·bits rows per group; checkpoint it
    # eagerly so the CDF walk and every per-quantile hit branch read
    # the materialized counters instead of re-running the corpus scan
    # (unchecked, the scan re-executed ~5× — measured 26.7 s vs ~3 s
    # at sf0.1).
    counters = (
        binned.groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    w = (
        Window.partitionBy(*group_cols).orderBy("bin")
        if group_cols
        else Window.partitionBy(F.lit(1)).orderBy("bin")
    )
    cum = counters.select(
        *group_cols,
        "bin",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
    )
    hits = None
    for out_col, num, den in qs:
        r = F.expr(f"CAST(({num} * n + {den - 1}) DIV {den} AS BIGINT)")
        # First bin whose cum reaches rank r; within it the target is
        # the (r − cum_before)-th smallest = (cnt − (cum − r))-th.
        h = (
            cum.withColumn("r", r)
            .filter(F.col("cum") >= F.col("r"))
            .withColumn(
                "rn_hit",
                F.row_number().over(
                    w.orderBy("bin")
                    if group_cols
                    else Window.partitionBy(F.lit(1)).orderBy("bin")
                ),
            )
            .filter(F.col("rn_hit") == 1)
            .select(
                *group_cols,
                "bin",
                F.lit(out_col).alias("q_name"),
                (F.col("cnt") - (F.col("cum") - F.col("r"))).alias(
                    "r_within"
                ),
            )
        )
        hits = h if hits is None else hits.unionByName(h)
    # The hit table is ≤ groups×|qs| rows — a bounded scalar table, so
    # it comes to the driver (the ≤257-row BM25 term-cap precedent) and
    # pass 2 probes on LITERAL value ranges [bin lower, next lower):
    # the corpus-side scan never re-evaluates the bin map. (Joining on
    # the computed ``bin`` column instead pushes isnotnull(bin) below
    # the projection with the whole CASE tree substituted in — the
    # probe ran 8× slower that way at sf0.1.)
    hit_rows = [
        (
            tuple(row[c] for c in group_cols),
            row["q_name"],
            int(row["bin"]),
            int(row["r_within"]),
        )
        for row in hits.collect()
    ]
    spark = df.sparkSession
    out_fields = ", ".join(
        f"`{c}` {t}"
        for c, t in zip(
            [*group_cols, *(f"{n}_{o}" for o, _, _ in qs for n in ("est", "exact"))],
            [df.schema[c].dataType.simpleString() for c in group_cols]
            + ["bigint"] * (2 * len(qs)),
        )
    )
    if not hit_rows:
        # Empty input (or all-NULL values): no quantiles exist. Return
        # an empty frame with the contracted schema instead of letting
        # createDataFrame choke on a rows-free names-only schema.
        return local_relation(spark, [], out_fields)
    grp_schema = ", ".join(
        f"`{c}` {df.schema[c].dataType.simpleString()}" for c in group_cols
    )
    bounds_schema = (
        (grp_schema + ", " if grp_schema else "")
        + "q_name string, bin bigint, r_within bigint, lo bigint, hi bigint"
    )
    bounds = local_relation(
        spark,
        [
            (*g, q, b, rw, qhist_lower_py(b, s), qhist_lower_py(b + 1, s) - 1)
            for (g, q, b, rw) in hit_rows
        ],
        bounds_schema,
    )
    vdf = df.select(
        *group_cols, value.cast("long").alias("v")
    ).filter(F.col("v").isNotNull())
    probe = vdf.join(
        F.broadcast(bounds),
        [
            *[vdf[c] == bounds[c] for c in group_cols],
            vdf["v"] >= bounds["lo"],
            vdf["v"] <= bounds["hi"],
        ],
    ).select(vdf["v"], bounds["q_name"], bounds["r_within"], bounds["lo"],
             *[bounds[c] for c in group_cols])
    w2 = Window.partitionBy(*group_cols, "q_name").orderBy("v")
    picked = (
        probe.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == F.col("r_within"))
        .select(*group_cols, "q_name", "lo", "v")
    )
    aggs = []
    for out_col, _, _ in qs:
        aggs.append(
            F.min(F.when(F.col("q_name") == out_col, F.col("lo"))).alias(
                f"est_{out_col}"
            )
        )
        aggs.append(
            F.min(F.when(F.col("q_name") == out_col, F.col("v"))).alias(
                f"exact_{out_col}"
            )
        )
    return picked.groupBy(*group_cols).agg(*aggs)


def qhist_lower_py(bin_id: int, s: int = QH_SUB_BITS) -> int:
    """Driver-side twin of :func:`qhist_lower_sql` (same integer map;
    the pass-2 literal bounds above come from here)."""
    m = 1 << s
    if bin_id < m:
        return bin_id
    shift = bin_id // m - 1
    return (m + bin_id % m) << shift


def cms_heavy_hitters(
    df: DataFrame,
    value: Column,
    share_num: int = 1,
    share_den: int = 64,
    depth: int = 3,
    width: int = 1024,
    out_value: str = "value",
    out_count: str = "n",
) -> DataFrame:
    """EXACT heavy hitters — every value with ≥ ``share_num/share_den``
    of all occurrences, with its true count — WITHOUT shuffling the
    full (value, count) space.

    The naive plan groupBys every distinct value (at 100 TB: a shuffle
    the size of the vocabulary) just to discard all but a handful. Here
    a count-min sketch pre-filters MAP-SIDE: counters build in one
    bounded shuffle, broadcast back (one ≤ width-row join per hash
    row), and a row only enters the exact-count shuffle if its CMS
    estimate clears the threshold. CMS over-estimates ONLY, so the
    candidate set is a SUPERSET of the true heavy hitters — no false
    negatives, and the exact count then drops the false positives. The
    result is therefore EXACTLY the naive answer (the oracle pairing),
    with the shuffle bounded by (candidates + depth×width) instead of
    the vocabulary.

    This is a SHUFFLE-VOLUME lever, not a local speedup: measured
    under a 200k-token vocabulary the exchange rows stay constant
    (12.4k) while the naive plan's grow linearly (3.2M at 8× corpus,
    258× more), but on a single box the naive partial aggregate wins
    wall-time because the md5 probe math costs more than the shuffle
    it avoids (`scripts/heavy_hitters_scale_check.py` records both).
    Reach for it when vocabulary × map-tasks shuffle rows are the
    bottleneck — wide vocabularies on real clusters.
    """
    if share_num <= 0 or share_den <= 0 or share_num > share_den:
        raise ValueError(
            f"share must be a fraction in (0, 1]: {share_num}/{share_den}"
        )
    # NULLs are excluded from BOTH the total and the candidate space
    # (round-7 advice): a NULL hashes to NULL buckets, joins nothing in
    # the probe, and so could never surface as a candidate — counting
    # it in `total` would only raise the threshold and silently break
    # the "EXACTLY the naive answer" contract on NULL-bearing columns.
    # The naive twin of this plan is therefore group-by-having over the
    # NON-NULL values (what a GROUP BY would report for the NULL group
    # is a different question than "which VALUES are heavy").
    vals = df.select(value.alias("_hv")).filter(F.col("_hv").isNotNull())
    counters = cms_counters(
        vals, F.col("_hv"), depth=depth, width=width
    ).localCheckpoint(eager=True)  # consumed by total + every probe join
    total = counters.filter(F.col("row_idx") == 0).agg(
        F.sum("cnt").cast("long")
    ).collect()[0][0] or 0
    thr = (share_num * total + share_den - 1) // share_den
    a, b = _km_halves(F.col("_hv"))
    probed = vals
    est_cols = []
    for i in range(depth):
        side = (
            counters.filter(F.col("row_idx") == i)
            .select("bucket", F.col("cnt").alias(f"_c{i}"))
        )
        probed = probed.withColumn(
            f"_b{i}", ((a + F.lit(i) * b) % F.lit(CMS_PRIME)) % F.lit(width)
        ).join(
            F.broadcast(side),
            F.col(f"_b{i}") == F.col("bucket"),
            "left",
        ).drop("bucket")
        est_cols.append(F.coalesce(F.col(f"_c{i}"), F.lit(0)))
    est = F.least(*est_cols) if depth > 1 else est_cols[0]
    candidates = probed.filter(est >= F.lit(thr)).select("_hv")
    return (
        candidates.groupBy("_hv")
        .agg(F.count(F.lit(1)).cast("long").alias(out_count))
        .filter(F.col(out_count) >= F.lit(thr))
        .withColumnRenamed("_hv", out_value)
    )


def heavy_hitters(
    df: DataFrame,
    value: Column,
    share_num: int = 1,
    share_den: int = 64,
    depth: int = 3,
    width: int = 1024,
    out_value: str = "value",
    out_count: str = "n",
    cms_min_distinct: int | None = None,
    p: int = 10,
) -> tuple[DataFrame, dict]:
    """EXACT heavy hitters with the physical plan AUTO-DISPATCHED from
    the engine's own cardinality evidence (round-7 verdict task 3 — the
    :func:`~ue_big_data_project_spark.operators.skew.sketch_join_plan`
    pattern): returns ``(result, decision)`` where ``decision`` records
    what was estimated and which plan ran. Both plans return EXACTLY
    the naive group-by-having answer (pinned result-equivalent by
    tests), so the choice is purely physical.

    Dispatch evidence: one bounded HLL pass (2^p registers, one
    bounded shuffle) estimates the value column's distinct count. The
    raw harmonic estimator (no linear-counting branch — module
    docstring) reads ~0.72·2^p (≈ 740 at the default p=10) for NEARLY
    EMPTY vocabularies; that floor is 3 orders of magnitude under the
    cutover, so it can never flip the decision — read
    ``decision["est_distinct"]`` as "at most ~740 or the estimate",
    not an exact small count.

    - ``est_distinct <= cms_min_distinct`` → the NAIVE plan: one
      partial-aggregated groupBy. Its shuffle carries up to
      ``distinct × map_tasks`` partial rows — fine while the per-task
      distinct-key hash table fits memory.
    - above the cutover → the CMS pre-filter plan
      (:func:`cms_heavy_hitters`): shuffle bounded by
      ``depth × width + candidates`` regardless of vocabulary (measured
      258× fewer exchange rows at 8× corpus under a 200k vocabulary).

    The default cutover is 2,000,000 distinct: the measured trade
    (``scripts/heavy_hitters_scale_check.py``) is that on one box the
    naive plan wins WALL TIME at every vocabulary that fits the
    per-task aggregate hash table (0.66 s vs 3.55 s at 200k distinct —
    the md5 probe math costs more than the shuffle it avoids), while
    the CMS plan wins SHUFFLE VOLUME; multi-million-distinct
    vocabularies are where map-side partial aggregation stops absorbing
    the key space (hash tables spill, every map task emits ~every key)
    and shuffle bytes become the bottleneck a real cluster pays for.
    Pass ``cms_min_distinct`` explicitly to move the cutover for
    narrower networks (lower it) or fatter single boxes (raise it).
    """
    if cms_min_distinct is None:
        cms_min_distinct = 2_000_000
    vals = df.select(value.alias("_hv")).filter(F.col("_hv").isNotNull())
    est_distinct = int(
        hll_estimate(
            hll_registers(vals, [], F.col("_hv"), p=p), [], p=p
        ).collect()[0]["est_distinct"]
    )
    decision = {
        "est_distinct": est_distinct,
        "cms_min_distinct": cms_min_distinct,
        "hll_p": p,
    }
    import logging

    if est_distinct > cms_min_distinct:
        decision["strategy"] = "cms_prefilter"
        logging.getLogger(__name__).info("heavy_hitters dispatch: %s", decision)
        out = cms_heavy_hitters(
            vals,
            F.col("_hv"),
            share_num=share_num,
            share_den=share_den,
            depth=depth,
            width=width,
            out_value=out_value,
            out_count=out_count,
        )
        return out, decision
    decision["strategy"] = "naive"
    logging.getLogger(__name__).info("heavy_hitters dispatch: %s", decision)
    total = vals.count()
    thr = (share_num * total + share_den - 1) // share_den
    out = (
        vals.groupBy("_hv")
        .agg(F.count(F.lit(1)).cast("long").alias(out_count))
        .filter(F.col(out_count) >= F.lit(thr))
        .withColumnRenamed("_hv", out_value)
    )
    return out, decision


def cms_join_size(
    a_counters: DataFrame,
    b_counters: DataFrame,
    out_col: str = "est_join_rows",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Equi-join OUTPUT-SIZE upper bound from two count-min counter
    tables built with the SAME depth/width over each side's join key —
    the classic CMS inner-product estimator (Cormode & Muthukrishnan
    2005): per hash row, ``Σ_buckets cnt_a · cnt_b`` counts every
    same-bucket key pair, which includes every TRUE key pair, so each
    row's sum ≥ |A ⋈ B| and the min over the depth rows is still ≥ —
    over-estimate ONLY, the same one-sided guarantee the rest of the
    sketch planning layer is built on. With B = A this is the F₂
    self-join moment (AMS).

    ``depth``/``width`` declare the parameters BOTH tables were built
    with (the :func:`cms_counters` defaults) and are validated in TWO
    layers — round-8/round-9 advice: silently intersecting two
    differently-parameterized counter tables on (row_idx, bucket) loses
    pairs and can UNDER-estimate, destroying the one-sided guarantee.

    - **Declared == recorded** (exact): a table built by
      :func:`cms_counters` RECORDS its depth/width as ``cnt`` column
      metadata (parquet-round-trip-safe); any recorded value that
      differs from the declaration raises driver-side before a job
      runs. This catches the case observed shape cannot: a table built
      with a SMALLER width than declared (all its buckets < width, so
      a range check passes while the bucket assignment disagrees).
    - **Observed shape** (necessary condition, in-plan): for tables
      with no recorded params (the DuckDB SQL twin, external
      producers), a row_idx set that is not exactly ``0..depth-1`` or
      buckets outside ``[0, width)`` raise inside the job (the
      pagerank-guard pattern), so a grossly mismatched pair still
      fails loudly instead of returning a plausible wrong bound. (An
      empty counter table — empty input side — is valid: the estimate
      is NULL-free 0-row semantics of the min-agg, never an
      under-estimate.)

    Cost: one join of two ≤ depth×width integer tables — the join's
    size is ESTIMATED without running it, from sidecars that never
    co-scanned. Collision inflation is bounded in expectation by
    ``F1_a·F1_b / width`` per row; size ``width ≳ F1_a·F1_b / (ε·true)``
    for an ε-relative bound, i.e. wider sketches for bigger inputs —
    the estimate column next to the exact count (the registry query)
    shows the realized gap at fixture scale.

    Returns one row ``(est_join_rows,)`` — pure integer arithmetic,
    bit-identical across engines and partitionings.
    """
    for side_df, side in ((a_counters, "left"), (b_counters, "right")):
        recorded = cms_params(side_df)
        if recorded is not None and recorded != (depth, width):
            raise ValueError(
                f"cms_join_size: {side} counter table records it was "
                f"built with depth={recorded[0]}/width={recorded[1]} but "
                f"depth={depth}/width={width} was declared — both sides "
                "must be built with the declared parameters or the bound "
                "can silently under-estimate"
            )

    def shape_guard(c: DataFrame, side: str) -> DataFrame:
        # One bounded agg (≤ depth×width counter rows) per side: a
        # non-empty table built with the declared params has row_idx
        # exactly {0..depth-1} and every bucket in [0, width). A wider
        # build shows buckets ≥ width; a different depth shows a
        # different row_idx set — either raises inside the job.
        ok = (F.count(F.lit(1)) == 0) | (
            (F.count_distinct(F.col("row_idx")) == F.lit(depth))
            & (F.min("row_idx") == F.lit(0))
            & (F.max("row_idx") == F.lit(depth - 1))
            & (F.min("bucket") >= F.lit(0))
            & (F.max("bucket") < F.lit(width))
        )
        guard = F.when(ok, F.lit(0).cast("long")).otherwise(
            F.raise_error(
                F.lit(
                    f"cms_join_size: {side} counter table does not match "
                    f"declared depth={depth}/width={width} — both sides "
                    "must be built with the same parameters or the bound "
                    "can silently under-estimate"
                )
            ).cast("long")
        )
        return c.agg(guard.alias(f"_guard_{side}"))

    a = a_counters.select(
        "row_idx", "bucket", F.col("cnt").alias("_ca")
    )
    b = b_counters.select(
        "row_idx", "bucket", F.col("cnt").alias("_cb")
    )
    per_row = (
        a.join(b, ["row_idx", "bucket"])
        .groupBy("row_idx")
        .agg(F.sum(F.col("_ca") * F.col("_cb")).cast("long").alias("_s"))
    )
    est = per_row.agg(F.min("_s").cast("long").alias(out_col))
    # Fold both guards into the returned value (1-row cross joins of
    # 1-row aggregates): +0 when shapes match, raise_error otherwise —
    # the guard cannot be pruned away because the output references it.
    return (
        est.crossJoin(shape_guard(a_counters, "left"))
        .crossJoin(shape_guard(b_counters, "right"))
        .select(
            (F.col(out_col) + F.col("_guard_left") + F.col("_guard_right"))
            .cast("long")
            .alias(out_col)
        )
    )


def cms_counters_sql(
    table_sql: str,
    value_sql: str,
    depth: int = 4,
    width: int = 1024,
) -> str:
    """DuckDB/ANSI twin of :func:`cms_counters` over ``table_sql``: the
    same Kirsch–Mitzenmacher row hashes from the same md5 halves, the
    same NULL exclusion, one ``(row_idx, bucket, cnt)`` row per counter.
    Emitted as a FROM-able subquery string so join-size / lookup
    oracles compose it per side."""

    def hex8(start: int) -> str:
        return (
            "("
            + " + ".join(
                f"(strpos('0123456789abcdef', "
                f"substr(md5({value_sql}), {start + k}, 1)) - 1)"
                f" * {16 ** (7 - k)}"
                for k in range(8)
            )
            + ")"
        )

    vals = ", ".join(f"({i})" for i in range(depth))
    return f"""(
  SELECT t.i AS row_idx,
         ((ab.a + t.i * ab.b) % {CMS_PRIME}) % {width} AS bucket,
         COUNT(*) AS cnt
  FROM (
    SELECT {hex8(1)} AS a, {hex8(9)} AS b
    FROM {table_sql} WHERE ({value_sql}) IS NOT NULL
  ) ab CROSS JOIN (VALUES {vals}) AS t(i)
  GROUP BY 1, 2
)"""


def hll_cube(
    df: DataFrame,
    dims: list[str],
    value: Column,
    p: int = 6,
    out_col: str = "est_distinct",
) -> DataFrame:
    """Distinct-count CUBE from ONE scan: ``(dims…, grouping_id,
    est_distinct)`` for every subset of ``dims`` (the Druid /
    DataSketches pattern — COUNT(DISTINCT) does not roll up, sketches
    do).

    The corpus is scanned exactly once, building the LEAF register
    table (groupBy ``dims + bucket``); every coarser granularity's
    registers then derive from the leaf by ``min`` over the dropped
    dimensions — exact, because min-merge is associative:
    ``min over (subset, bucket)`` of the leaf minima equals the
    registers built directly at that granularity. Each of the 2^d
    rollups aggregates the BOUNDED register table (≤ groups × 2^p
    rows), never the data — at 100 TB the lattice costs 2^d bounded
    jobs after one scan, where an exact distinct cube pays the full
    Expand-multiplied shuffle (every row × 2^d grouping sets).

    ``grouping_id`` follows the SQL convention (bit = 1 ⇔ the dim is
    AGGREGATED, first dim = most significant bit); dropped dims are
    NULL, matching CUBE output so the oracle aligns rows by
    (dims, grouping_id).
    """
    if not dims or len(dims) > 8:
        raise ValueError("hll_cube wants 1..8 dims")
    leaf = hll_registers(df, dims, value, p=p).localCheckpoint(eager=True)
    dtypes = dict(df.select(*dims).dtypes)
    frames = []
    for mask in range(1 << len(dims)):
        # SQL convention: bit set in grouping_id = dim aggregated away.
        kept = [d for i, d in enumerate(dims) if not (mask >> (len(dims) - 1 - i)) & 1]
        regs = (
            leaf.groupBy(*kept, "bucket").agg(
                F.min("min_term").alias("min_term")
            )
            if kept != dims
            else leaf
        )
        est = hll_estimate(regs, kept, p=p, out_col=out_col)
        cols = []
        for d in dims:
            cols.append(
                F.col(d) if d in kept else F.lit(None).cast(dtypes[d]).alias(d)
            )
        frames.append(
            est.select(
                *cols,
                F.lit(mask).cast("int").alias("grouping_id"),
                out_col,
            )
        )
    out = frames[0]
    for nxt in frames[1:]:
        out = out.unionByName(nxt)
    return out
