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
from pyspark.sql import types as T

from ue_big_data_project_spark.functions import pround
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
    block_size: int = 2048,
    margin: float = 1e-6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a, b) with
    cosine(a, b) ≥ ``threshold``. EXACT results, blocked execution.

    Two stages (the block-matrix similarity join):

    1. **Candidate generation** — vectors are grouped into blocks of
       ``block_size`` by id; every block-pair (upper triangle) flows
       through ``mapInPandas`` where one numpy matmul scores the whole
       tile. Pairs within ``margin`` of the threshold survive. BLAS
       summation order differs from the fold-left expression math by
       ≤ ~64 ulp, far below ``margin``, so no true pair can be missed —
       numpy is used only as a *sound pruner*.
    2. **Exact rescore** — the (small) candidate set joins back to the
       vectors and is scored with the same fold-left column expressions
       the oracle mirrors; the rounded threshold test is exact.

    Scale shape: N vectors → (N/B)² /2 tiles, each an independent task
    whose inputs are two ~B·dim float blocks; shuffle volume is O(N·dim)
    for the block build plus O(candidates) afterwards — never O(N²).
    """
    import pandas as pd

    sid, svec = F.col(item_id), F.col(item_vec)
    blocks = (
        items.groupBy(F.floor(sid / block_size).alias("blk"))
        .agg(
            F.sort_array(
                F.collect_list(F.struct(sid.alias("id"), svec.alias("vec")))
            ).alias("rows")
        )
    )
    a = blocks.select(F.col("blk").alias("blk_a"), F.col("rows").alias("rows_a"))
    b = blocks.select(F.col("blk").alias("blk_b"), F.col("rows").alias("rows_b"))
    tiles = a.join(F.broadcast(b), F.col("blk_a") <= F.col("blk_b"))

    cut = threshold - margin

    def score_tiles(batches):
        import numpy as np

        for pdf in batches:
            out_a, out_b = [], []
            for rows_a, rows_b in zip(pdf["rows_a"], pdf["rows_b"]):
                ids_a = np.array([r["id"] for r in rows_a], dtype="int64")
                ids_b = np.array([r["id"] for r in rows_b], dtype="int64")
                ma = np.array([r["vec"] for r in rows_a], dtype="float64")
                mb = np.array([r["vec"] for r in rows_b], dtype="float64")
                na = np.linalg.norm(ma, axis=1)
                nb = np.linalg.norm(mb, axis=1)
                na[na == 0] = 1.0
                nb[nb == 0] = 1.0
                sims = (ma / na[:, None]) @ (mb / nb[:, None]).T
                ia, ib = np.nonzero(sims >= cut)
                ka, kb = ids_a[ia], ids_b[ib]
                keep = ka < kb
                out_a.append(ka[keep])
                out_b.append(kb[keep])
            yield pd.DataFrame(
                {
                    "id_a": np.concatenate(out_a) if out_a else [],
                    "id_b": np.concatenate(out_b) if out_b else [],
                }
            )

    cand_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
        ]
    )
    candidates = tiles.mapInPandas(score_tiles, cand_schema)

    va = items.select(sid.alias("id_a"), svec.alias("_va"))
    vb = items.select(sid.alias("id_b"), svec.alias("_vb"))
    return (
        candidates.join(va, "id_a")
        .join(vb, "id_b")
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
