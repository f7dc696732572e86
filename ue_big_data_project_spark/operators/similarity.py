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


def cosine_pairs(
    items: DataFrame,
    threshold: float,
    item_id: str = "vec_id",
    item_vec: str = "embedding",
    score_scale: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a, b) with
    cosine(a, b) ≥ ``threshold``.

    Exact all-pairs formulation: a self-join on ``id_a < id_b``. Correct
    at any N but O(N²) — the right tool for a bounded candidate set
    (e.g. after LSH/IVF blocking). At corpus scale, block first:
    ``hyperplane_signs`` buckets or the minhash band join
    (operators.dedup) cut the pair space, then this scores survivors.
    The broadcast on one side keeps it shuffle-free when the deduped
    candidate set fits an executor.
    """
    a = items.select(
        F.col(item_id).alias("id_a"), F.col(item_vec).alias("_va")
    )
    b = items.select(
        F.col(item_id).alias("id_b"), F.col(item_vec).alias("_vb")
    )
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            pround(cosine(F.col("_va"), F.col("_vb")), score_scale).alias(
                "cosine_sim"
            ),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def _assign_clusters(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str,
    id_col: str,
    nprobe: int,
    score_scale: int = 6,
) -> DataFrame:
    """Rank centroids per row by cosine; keep the top ``nprobe``.

    Centroids are broadcast (they are tiny by construction), so
    assignment is one scan over ``df`` with no shuffle before the
    per-row window (which partitions on the row id — no hot keys).
    """
    scored = df.join(F.broadcast(centroids)).select(
        *df.columns,
        F.col("cent_id"),
        pround(cosine(F.col(vec_col), F.col("cent_vec")), score_scale).alias(
            "cent_sim"
        ),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("cent_sim"), F.asc("cent_id"))
    return (
        scored.withColumn("_crank", F.row_number().over(w))
        .filter(F.col("_crank") <= nprobe)
        .drop("_crank", "cent_sim")
    )


def ivf_knn(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 2,
    item_id: str = "vec_id",
    item_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    score_scale: int = 6,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index.

    Classic two-level ANN: partition the corpus into Voronoi cells
    around centroids, then score a query only against the ``nprobe``
    cells nearest to it. Here centroids are the ``n_centroids``
    lowest-id vectors — a deterministic stand-in for a sampled k-means
    job (at scale: run k-means once, broadcast the centroid table; the
    rest of the pipeline is unchanged).

    Scale shape: the corpus is scanned ONCE to tag each item with its
    cell (broadcast centroids, no shuffle), then items shuffle on
    ``cell``, which is also the storage partition key for a persisted
    index — repeated queries touch only ``nprobe`` partitions instead
    of the full corpus.
    """
    centroids = (
        items.filter(F.col(item_id) < n_centroids)
        .select(
            F.col(item_id).alias("cent_id"), F.col(item_vec).alias("cent_vec")
        )
    )
    tagged = _assign_clusters(
        items, centroids, item_vec, item_id, nprobe=1, score_scale=score_scale
    ).withColumnRenamed("cent_id", "cell")
    probes = _assign_clusters(
        queries, centroids, query_vec, query_id, nprobe=nprobe,
        score_scale=score_scale,
    ).withColumnRenamed("cent_id", "cell")
    scored = tagged.join(F.broadcast(probes), "cell").filter(
        F.col(item_id) != F.col(query_id)
    )
    scored = scored.select(
        F.col(query_id),
        F.col(item_id),
        pround(
            cosine(F.col(item_vec), F.col(query_vec)), score_scale
        ).alias("cosine_sim"),
    )
    # Items live in exactly one cell (nprobe=1 on the item side), so a
    # (query, item) pair appears at most once — no dedup needed.
    w = Window.partitionBy(query_id).orderBy(
        F.desc("cosine_sim"), F.asc(item_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, item_id, "cosine_sim", "rank")
    )


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
