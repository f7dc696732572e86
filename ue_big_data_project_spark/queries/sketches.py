"""Cardinality-sketch queries: HyperLogLog and KMV distinct estimates,
oracle-paired bit-for-bit (``operators/sketch.py`` documents the
engine-portable integer hash/register math).

Beyond-reference capability. Each result carries the sketch estimate
NEXT TO the exact distinct count and the relative error, so the gate
checks both engines agree on the estimator to the last bit AND the
output itself documents the accuracy trade-off at fixture scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ue_big_data_project_spark.functions import pround, sql_round
from ue_big_data_project_spark.operators import sketch as SK
from ue_big_data_project_spark.queries import QuerySpec
from ue_big_data_project_spark.session import load_tables

_P = 6  # 64 HLL registers: ±13% typical; fixture groups sit in the
#         harmonic range (≥ 2.5·m distinct) the raw estimator targets.
_K = 32  # KMV: exact below 32 distinct, (k−1)·2^48 DIV h_k above.


def _with_exact(
    est: DataFrame, exact: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Join estimate to exact count and add the relative error — the
    same 3 IEEE ops + half-up round in the SQL twins below."""
    out = est.join(exact, group_cols)
    rel = F.abs(
        F.col("est_distinct") - F.col("exact_distinct").cast("double")
    ) / F.col("exact_distinct").cast("double")
    return out.select(
        *group_cols,
        "est_distinct",
        "exact_distinct",
        pround(rel, 4).alias("rel_err"),
    )


def sketch_hll_parts_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL(p=6) estimate of distinct parts per lineitem return flag.

    The register build is the at-scale shape: one shuffle carrying ≤ 64
    integers per (group × map task) no matter how many rows scan —
    versus COUNT(DISTINCT)'s shuffle of every distinct value."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    reg = SK.hll_registers(
        li, ["l_returnflag"], F.col("l_partkey").cast("string"), p=_P
    )
    est = SK.hll_estimate(reg, ["l_returnflag"], p=_P)
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_distinct")
    )
    return _with_exact(est, exact, ["l_returnflag"])


def _exact_join_sql(est_cte: str, grp: str, exact_sql: str) -> str:
    rel = "abs(e.est_distinct - CAST(x.exact_distinct AS DOUBLE)) / CAST(x.exact_distinct AS DOUBLE)"
    return f"""
WITH est AS ({est_cte}),
exact AS ({exact_sql})
SELECT e.{grp}, e.est_distinct, x.exact_distinct,
       {sql_round(rel, 4)} AS rel_err
FROM est e JOIN exact x ON e.{grp} = x.{grp}
"""


SKETCH_HLL_PARTS_SQL = _exact_join_sql(
    SK.hll_estimate_sql(
        "lineitem", ["l_returnflag"], "CAST(l_partkey AS VARCHAR)", p=_P
    ),
    "l_returnflag",
    "SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_distinct"
    " FROM lineitem GROUP BY l_returnflag",
)


def sketch_kmv_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV(k=32) estimate of distinct customers per order priority —
    integer end-to-end, so the oracle match is exact by construction."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    sk = SK.kmv_sketch(
        o, ["o_orderpriority"], F.col("o_custkey").cast("string"), k=_K
    )
    est = SK.kmv_estimate(sk, ["o_orderpriority"], k=_K)
    exact = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact_distinct")
    )
    return _with_exact(est, exact, ["o_orderpriority"])


SKETCH_KMV_CUSTKEYS_SQL = _exact_join_sql(
    SK.kmv_estimate_sql(
        "orders", ["o_orderpriority"], "CAST(o_custkey AS VARCHAR)", k=_K
    ),
    "o_orderpriority",
    "SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS exact_distinct"
    " FROM orders GROUP BY o_orderpriority",
)


def sketch_hll_merged_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGE contract, exercised through a real parquet sidecar:
    half the lineitem (even order keys) is sketched and WRITTEN as a
    register sidecar — "yesterday's corpus" — then read back and merged
    with the odd-half increment's registers; no row of the even half is
    rescanned. The oracle computes the single-pass whole-corpus
    estimate, so the value-hash match IS the merge == rebuild property
    (register merge = min over the unioned bucket sets)."""
    import shutil as _sh
    import tempfile as _tf

    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    grp = ["l_linestatus"]
    val = F.col("l_partkey").cast("string")
    even = li.filter(F.col("l_orderkey") % 2 == 0)
    odd = li.filter(F.col("l_orderkey") % 2 == 1)
    root = _tf.mkdtemp(prefix="spark_graft_hll_")
    try:
        SK.hll_registers(even, grp, val, p=_P).write.mode(
            "overwrite"
        ).parquet(root + "/registers")
        sidecar = spark.read.parquet(root + "/registers")
        merged = SK.hll_merge(
            sidecar, SK.hll_registers(odd, grp, val, p=_P), grp
        )
        est = SK.hll_estimate(merged, grp, p=_P)
        exact = li.groupBy(*grp).agg(
            F.countDistinct("l_partkey").alias("exact_distinct")
        )
        return _with_exact(est, exact, grp).localCheckpoint(eager=True)
    finally:
        _sh.rmtree(root, ignore_errors=True)


SKETCH_HLL_MERGED_SQL = _exact_join_sql(
    SK.hll_estimate_sql(
        "lineitem", ["l_linestatus"], "CAST(l_partkey AS VARCHAR)", p=_P
    ),
    "l_linestatus",
    "SELECT l_linestatus, COUNT(DISTINCT l_partkey) AS exact_distinct"
    " FROM lineitem GROUP BY l_linestatus",
)


_CMS_D = 3
_CMS_W = 16  # the fixture vocabulary is ~31 tokens; a narrow sketch
#              forces real bucket collisions so the reported overcount
#              exercises the (non-negative) over-estimate guarantee
_CMS_VALS = ", ".join(f"({i})" for i in range(_CMS_D))


def sketch_cms_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency sketch over every document token; the top-10
    exact tokens are then estimated FROM THE SKETCH and reported next
    to their true counts. CMS over-estimates only, so ``overcount`` is
    a non-negative integer — and being all-integer, the whole result is
    exact-matched by the oracle."""
    from ue_big_data_project_spark.functions.text import normalize_text

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = d.select(
        F.explode(
            F.filter(
                F.split(normalize_text(F.col("text")), " "),
                lambda t: t != "",
            )
        ).alias("token")
    )
    counters = SK.cms_counters(
        toks, F.col("token"), depth=_CMS_D, width=_CMS_W
    )
    top = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.desc("exact_count"), "token")
        .limit(10)
    )
    est = SK.cms_lookup(
        counters, top, F.col("token"), depth=_CMS_D, width=_CMS_W
    )
    return est.select(
        "token",
        "est_count",
        "exact_count",
        (F.col("est_count") - F.col("exact_count")).alias("overcount"),
    )


_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def _hex8_sql(col: str, start: int) -> str:
    return (
        "("
        + " + ".join(
            f"(strpos('0123456789abcdef', substr(md5({col}), {start + k}, 1)) - 1)"
            f" * {16 ** (7 - k)}"
            for k in range(8)
        )
        + ")"
    )


SKETCH_CMS_TOKENS_SQL = f"""
WITH tok AS (
  SELECT unnest(list_filter(string_split({_NORM}, ' '), w -> w <> '')) AS token
  FROM documents
), ab AS (
  SELECT token, {_hex8_sql('token', 1)} AS a, {_hex8_sql('token', 9)} AS b
  FROM tok
), c AS (
  SELECT t.i AS row_idx, ((ab.a + t.i * ab.b) % {SK.CMS_PRIME}) % {_CMS_W} AS bucket,
         COUNT(*) AS cnt
  FROM ab CROSS JOIN (VALUES {_CMS_VALS}) AS t(i)
  GROUP BY 1, 2
), ex AS (
  SELECT token, COUNT(*) AS exact_count FROM tok GROUP BY token
  ORDER BY exact_count DESC, token LIMIT 10
), dab AS (
  SELECT DISTINCT token, a, b FROM ab
), probes AS (
  SELECT e.token, e.exact_count, t.i AS row_idx,
         ((d.a + t.i * d.b) % {SK.CMS_PRIME}) % {_CMS_W} AS bucket
  FROM ex e JOIN dab d ON e.token = d.token
  CROSS JOIN (VALUES {_CMS_VALS}) AS t(i)
), est AS (
  SELECT p.token, p.exact_count, MIN(c.cnt) AS est_count
  FROM probes p JOIN c ON c.row_idx = p.row_idx AND c.bucket = p.bucket
  GROUP BY p.token, p.exact_count
)
SELECT token, CAST(est_count AS BIGINT) AS est_count,
       CAST(exact_count AS BIGINT) AS exact_count,
       CAST(est_count - exact_count AS BIGINT) AS overcount
FROM est
"""


QUERIES = {
    "sketch_hll_parts_per_flag": QuerySpec(
        sketch_hll_parts_per_flag, SKETCH_HLL_PARTS_SQL
    ),
    "sketch_kmv_custkeys": QuerySpec(
        sketch_kmv_custkeys, SKETCH_KMV_CUSTKEYS_SQL
    ),
    "sketch_hll_merged_modes": QuerySpec(
        sketch_hll_merged_modes, SKETCH_HLL_MERGED_SQL
    ),
    "sketch_cms_tokens": QuerySpec(sketch_cms_tokens, SKETCH_CMS_TOKENS_SQL),
}
