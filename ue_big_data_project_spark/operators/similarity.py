"""Similarity search over embedding columns (``array<float>``).

- ``brute_force_knn``: exact top-k by cosine for a bounded query set.
  The query side is broadcast; the item side streams through one scan —
  no shuffle except the final per-query top-k (row_number over k·|Q|
  rows). This is the correctness baseline.
- ``lsh_knn``: approximate top-k via random-hyperplane LSH buckets —
  the scale path: items hash to sign-pattern buckets; only same-bucket
  (or near-bucket) candidates are scored. Hyperplanes are derived from
  md5 bits so the index is deterministic (no RNG state to ship).

Vector math is ``functions.vectors`` (higher-order functions, JVM-side,
double accumulation in index order — oracle-reproducible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ue_big_data_project_spark.functions import hex_digit_value, pround
from ue_big_data_project_spark.functions.vectors import cosine


def brute_force_knn(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    item_id: str = "vec_id",
    item_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    score_scale: int = 6,
) -> DataFrame:
    """Exact cosine top-k of ``items`` for each row of ``queries``.

    Self-matches (same id) are excluded. Ties break on item id.
    """
    scored = items.join(F.broadcast(queries)).filter(
        F.col(item_id) != F.col(query_id)
    )
    scored = scored.select(
        F.col(query_id),
        F.col(item_id),
        pround(
            cosine(F.col(item_vec), F.col(query_vec)), score_scale
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.desc("cosine_sim"), F.asc(item_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, item_id, "cosine_sim", "rank")
    )


def hyperplane_signs(vec_col, planes: int, dim: int):
    """Deterministic random-hyperplane bucket id for a vector.

    Plane p's coefficient for dimension d is ±1 by the parity of a hex
    digit of ``md5('p:d')`` — an ℓ∞-bounded Rademacher hyperplane, fully
    deterministic and engine-portable. Returns an int bucket in
    [0, 2^planes).
    """
    bucket = F.lit(0)
    for p in range(planes):
        coeffs = [
            1 if _md5_parity(f"{p}:{d}") else -1 for d in range(dim)
        ]
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(c) for c in coeffs]),
                lambda x, c: x.cast("double") * c,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1)).otherwise(F.lit(0)) * (1 << p)
    return bucket


def _md5_parity(s: str) -> bool:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[0], 16) % 2 == 1


def lsh_knn(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    planes: int = 4,
    dim: int = 64,
    item_id: str = "vec_id",
    item_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    score_scale: int = 6,
) -> DataFrame:
    """Approximate top-k: score only items in the query's LSH bucket.

    With ``planes`` hyperplanes the item side is cut ~2^planes-fold before
    scoring; recall is traded for scan cost (multi-probe = union of
    adjacent buckets would raise recall; not needed for the demo). At
    100 TB the bucket id becomes the shuffle/partition key, so each
    query touches one partition slice instead of the full corpus.
    """
    ib = items.withColumn(
        "_bucket", hyperplane_signs(F.col(item_vec), planes, dim)
    )
    qb = queries.withColumn(
        "_bucket", hyperplane_signs(F.col(query_vec), planes, dim)
    )
    scored = ib.join(F.broadcast(qb), "_bucket").filter(
        F.col(item_id) != F.col(query_id)
    )
    scored = scored.select(
        F.col(query_id),
        F.col(item_id),
        pround(
            cosine(F.col(item_vec), F.col(query_vec)), score_scale
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.desc("cosine_sim"), F.asc(item_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, item_id, "cosine_sim", "rank")
    )
