"""LLM-data-pipeline queries: dedup, text analysis, similarity search.

These run over the ``documents`` and ``embeddings`` testdata tables and
are first-class engine capabilities (BASELINE.json north-star), not
demos: every pipeline is shuffle-bounded (fingerprint / shingle / band /
bucket keys) and UDF-free.

The DuckDB oracles reproduce the exact same hash math (md5 + strpos hex
decode, fold-left double accumulation), so even the sketch-based
operators are value-hash-checked, not just row-counted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ue_big_data_project_spark.functions import pround, sql_round
from ue_big_data_project_spark.functions import text as TX
from ue_big_data_project_spark.operators import dedup as DD
from ue_big_data_project_spark.operators.similarity import (
    brute_force_knn,
    build_ivf_index,
    cosine_pairs,
    ivf_knn,
    ivf_knn_indexed,
    lsh_knn,
    pq_codebooks,
    pq_encode,
    pq_knn,
)
from ue_big_data_project_spark.queries import QuerySpec
from ue_big_data_project_spark.queries._replay import stage_batches
from ue_big_data_project_spark.session import load_tables, local_relation

# Shared SQL fragments ------------------------------------------------------
# Normalization must mirror functions.text.normalize_text exactly.
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_WORDS = f"string_split({_NORM}, ' ')"
# Distinct 3-word shingles, mirroring functions.text.word_shingles(n=3).
_SHINGLES_CTE = f"""
toks AS (SELECT doc_id, {_WORDS} AS words FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(words) - 1, 1)),
           i -> array_to_string(words[i:i+2], ' ')
         ))) AS shingle
  FROM toks
)
"""


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup via md5 fingerprint (one shuffle)."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return DD.exact_dedup(d, "doc_id", "text")


DEDUP_EXACT_SQL = f"""
SELECT md5({_NORM}) AS fingerprint,
       count(*) AS n_docs,
       min(doc_id) AS keep_id
FROM documents
GROUP BY 1
"""


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup: screen a new crawl batch (doc_id % 3
    != 0) against the already-ingested corpus index (fingerprints of
    doc_id % 3 == 0) — operators.dedup.incremental_exact_dedup: one
    batch-side shuffle + anti join on the fingerprint, corpus text
    never rescanned. (The Bloom-prefiltered fast path exists for
    CONTINUOUS ingestion, where the sidecar is persisted and its build
    cost amortizes across batches — dedup_ingest_stream(bloom_path=…);
    rebuilding a filter per one-shot batch screen would cost more than
    the anti join it avoids, so this batch query stays plain.)"""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    corpus = d.filter(F.col("doc_id") % 3 == 0)
    batch = d.filter(F.col("doc_id") % 3 != 0)
    seen = DD.exact_dedup(corpus, "doc_id", "text").select("fingerprint")
    return DD.incremental_exact_dedup(batch, seen, "doc_id", "text")


DEDUP_INCREMENTAL_SQL = f"""
WITH seen AS (
  SELECT DISTINCT md5({_NORM}) AS fingerprint
  FROM documents WHERE doc_id % 3 = 0
), batch AS (
  SELECT md5({_NORM}) AS fingerprint,
         count(*) AS n_docs,
         min(doc_id) AS keep_id
  FROM documents WHERE doc_id % 3 <> 0
  GROUP BY 1
)
SELECT b.fingerprint, b.n_docs, b.keep_id
FROM batch b ANTI JOIN seen s ON b.fingerprint = s.fingerprint
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(8) + LSH(4 bands × 2) candidate near-dup pairs."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return DD.minhash_lsh_pairs(d, "doc_id", "text", num_hashes=8, bands=4)


def _hexval(start: int) -> str:
    """8 hex digits of md5(shingle) from ``start`` (1-based) → bigint."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(shingle), {start + k}, 1)) - 1)"
        f" * {16 ** (7 - k)}"
        for k in range(8)
    )


# Kirsch–Mitzenmacher twin of operators.dedup.minhash_signatures:
# hᵢ = (a + i·b) mod p over the two 32-bit md5 halves.
_MINHASH_AGGS = ",\n    ".join(
    f"min((({_hexval(1)}) + {i} * ({_hexval(9)})) % 4294967291) AS h{i}"
    for i in range(8)
)
_BAND_SELECTS = "\n  UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_idx, "
    f"md5(CAST(h{2 * b} AS VARCHAR) || ':' || CAST(h{2 * b + 1} AS VARCHAR)) AS band_val FROM mh"
    for b in range(4)
)
DEDUP_MINHASH_SQL = f"""
WITH {_SHINGLES_CTE},
mh AS (
  SELECT doc_id,
    {_MINHASH_AGGS}
  FROM sh GROUP BY doc_id
),
bands AS (
  {_BAND_SELECTS}
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a
JOIN bands b
  ON a.band_idx = b.band_idx AND a.band_val = b.band_val
 AND a.doc_id < b.doc_id
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard ≥ 0.8 pairs via inverted-index equi-join."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return DD.ngram_jaccard_pairs(d, "doc_id", "text", shingle_n=3, threshold=0.8)


DEDUP_JACCARD_SQL = f"""
WITH {_SHINGLES_CTE},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
sized AS (
  SELECT sh.doc_id, shingle, n_sh FROM sh JOIN sizes USING (doc_id)
),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common,
         max(a.n_sh) AS n_a, max(b.n_sh) AS n_b
  FROM sized a
  JOIN sized b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
   AND least(a.n_sh, b.n_sh) >= 0.8 * greatest(a.n_sh, b.n_sh)
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       {sql_round("common * 1.0 / (n_a + n_b - common)", 4)} AS jaccard
FROM common
WHERE {sql_round("common * 1.0 / (n_a + n_b - common)", 4)} >= 0.8
"""


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 16-bit SimHash signatures."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return DD.simhash(d, "doc_id", "text", bits=16)


_SIMHASH_VOTES = ",\n    ".join(
    f"sum((strpos('0123456789abcdef', substr(md5(tok), {i + 1}, 1)) - 1) % 2 * 2 - 1) AS v{i}"
    for i in range(16)
)
_SIMHASH_VALUE = " + ".join(
    f"(CASE WHEN v{i} > 0 THEN 1 ELSE 0 END) * {1 << i}" for i in range(16)
)
DEDUP_SIMHASH_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({_WORDS}) AS tok FROM documents
),
votes AS (
  SELECT doc_id,
    {_SIMHASH_VOTES}
  FROM tok GROUP BY doc_id
)
SELECT doc_id, CAST({_SIMHASH_VALUE} AS BIGINT) AS simhash
FROM votes
"""


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs within Hamming radius 3."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return DD.simhash_pairs(d, "doc_id", "text", bits=16, max_hamming=3)


DEDUP_SIMHASH_PAIRS_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({_WORDS}) AS tok FROM documents
),
votes AS (
  SELECT doc_id,
    {_SIMHASH_VOTES}
  FROM tok GROUP BY doc_id
),
sig AS (
  SELECT doc_id, CAST({_SIMHASH_VALUE} AS BIGINT) AS simhash FROM votes
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → CLUSTERS via iterative distributed label
    propagation (operators.graph.connected_components); component id =
    min doc_id reachable. The full corpus-dedup closer: keep one doc
    per component. Edges are the exact Jaccard ≥ 0.8 pairs (sparse,
    true near-dups → tiny joins, diameter ~2); oracle = DuckDB
    recursive-CTE transitive closure over the same pair SQL.
    """
    from ue_big_data_project_spark.operators.graph import connected_components

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    pairs = DD.ngram_jaccard_pairs(d, "doc_id", "text", shingle_n=3, threshold=0.8)
    return connected_components(
        d.select("doc_id"),
        pairs,
        node_col="doc_id",
        src_col="id_a",
        dst_col="id_b",
    )


DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({DEDUP_JACCARD_SQL})
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL
  SELECT id_b AS a, id_a AS b FROM pairs
), reach(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.a, r.label FROM reach r JOIN edges e ON e.b = r.node
)
SELECT node AS doc_id, CAST(min(label) AS BIGINT) AS component
FROM reach GROUP BY node
"""


def dedup_clusters_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL cluster maintenance (round-8 verdict task 4): 3/4 of
    the corpus (doc_id % 4 != 3) is clustered the normal way and
    persisted as a component-bucketed cluster map; the remaining quarter
    arrives as an increment whose incident near-dup pairs fold in via
    ``dedup.append_cluster_map`` — a CC over the CONTRACTED
    O(increment) graph plus a touched-buckets-only rewrite, never a
    re-cluster of the full pair graph (at crawl scale, the dedup
    pipeline's largest repeated cost). The oracle is dedup_clusters'
    full-corpus recursive-CTE transitive closure VERBATIM: append ==
    rebuild is the whole contract, so the increment path must hash
    identically to clustering everything at once."""
    import shutil as _sh
    import tempfile as _tf

    from ue_big_data_project_spark.operators.dedup import (
        append_cluster_map,
        read_cluster_map,
        write_cluster_map,
    )
    from ue_big_data_project_spark.operators.graph import (
        connected_components,
    )

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    # The pair pipeline (shingle, prefix-join, verify) feeds both the
    # base and increment splits; materialize it once.
    pairs = DD.ngram_jaccard_pairs(
        d, "doc_id", "text", shingle_n=3, threshold=0.8
    ).localCheckpoint(eager=True)
    new_pred = F.col("doc_id") % 4 == 3
    base_docs = d.where(~new_pred).select("doc_id")
    new_docs = d.where(new_pred).select("doc_id")
    base_pairs = pairs.where(
        (F.col("id_a") % 4 != 3) & (F.col("id_b") % 4 != 3)
    )
    inc_pairs = pairs.where(
        (F.col("id_a") % 4 == 3) | (F.col("id_b") % 4 == 3)
    )
    base = connected_components(
        base_docs, base_pairs,
        node_col="doc_id", src_col="id_a", dst_col="id_b",
    )
    root = _tf.mkdtemp(prefix="spark_graft_cmap_")
    cmap = root + "/cmap"
    try:
        write_cluster_map(base, cmap, n_buckets=16)
        append_cluster_map(spark, cmap, new_docs, inc_pairs)
        return (
            read_cluster_map(spark, cmap)
            .select("doc_id", "component")
            .localCheckpoint(eager=True)
        )
    finally:
        _sh.rmtree(root, ignore_errors=True)


def dedup_jaccard_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided EXACT near-dup pair generation (round-9): 3/4 of the
    corpus persists as a Jaccard probe index (PPJoin prefix rows
    hash-sharded by shingle bucket + frozen frequency order + exact
    verify arrays); the remaining quarter probes it — every qualifying
    pair with ≥1 new endpoint, WITHOUT re-shingling the corpus. The
    oracle is the full-corpus exact-Jaccard pair SQL restricted to
    increment-incident pairs: the frozen-order prefix filter must stay
    lossless across the split (prefix theorems need only a consistent
    total order, not true frequencies)."""
    import shutil as _sh
    import tempfile as _tf

    from ue_big_data_project_spark.operators.dedup import (
        jaccard_probe_index,
        write_jaccard_index,
    )

    # Index HALF the corpus, probe a disjoint quarter (the bench-entry
    # footprint rule the streaming clusters entry follows): the index
    # build — shingle + freq + prefix + arrays over the corpus side —
    # is the dominant, size-linear cost of this self-contained entry.
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    old = d.filter(F.col("doc_id") % 2 == 0)
    new = d.filter(F.col("doc_id") % 4 == 1)
    root = _tf.mkdtemp(prefix="spark_graft_jidx_")
    try:
        idx = root + "/jidx"
        write_jaccard_index(old, idx, shingle_n=3, threshold=0.8)
        return jaccard_probe_index(spark, idx, new)
    finally:
        _sh.rmtree(root, ignore_errors=True)


# Jaccard is PAIRWISE, so restricting the full-corpus pair SQL to the
# (index ∪ probe) membership and ≥1-probe-endpoint predicates is exact.
DEDUP_JACCARD_INCREMENTAL_SQL = f"""
SELECT id_a, id_b, jaccard FROM ({DEDUP_JACCARD_SQL})
WHERE (id_a % 4 = 1 OR id_b % 4 = 1)
  AND (id_a % 2 = 0 OR id_a % 4 = 1)
  AND (id_b % 2 = 0 OR id_b % 4 = 1)
"""


def dedup_jaccard_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETENTION on the Jaccard probe index (round-10): index HALF the
    corpus, expire every 16th doc via ``rewrite_jaccard_index`` (prefix
    + verify-array rows shed in place, the frozen frequency order
    untouched), then probe with a disjoint quarter. The oracle is the
    full-corpus exact pair SQL restricted to pairs whose endpoints all
    survive (keep ∪ probe) with ≥1 probe endpoint — hash-equality
    proves the prune removed exactly the expired docs' pairs and
    nothing else, under the still-frozen order."""
    import shutil as _sh
    import tempfile as _tf

    from ue_big_data_project_spark.operators.dedup import (
        jaccard_probe_index,
        rewrite_jaccard_index,
        write_jaccard_index,
    )

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    old = d.filter(F.col("doc_id") % 2 == 0)
    keep = old.filter(F.col("doc_id") % 16 != 0).select("doc_id")
    new = d.filter(F.col("doc_id") % 4 == 1)
    root = _tf.mkdtemp(prefix="spark_graft_jprune_")
    try:
        idx = root + "/jidx"
        write_jaccard_index(old, idx, shingle_n=3, threshold=0.8)
        rewrite_jaccard_index(spark, idx, keep)
        return jaccard_probe_index(spark, idx, new)
    finally:
        _sh.rmtree(root, ignore_errors=True)


# Pairwise again: endpoints must be in (keep ∪ probe) where keep =
# indexed (even) AND not expired (% 16 ≠ 0), with ≥1 probe endpoint.
DEDUP_JACCARD_PRUNED_SQL = f"""
SELECT id_a, id_b, jaccard FROM ({DEDUP_JACCARD_SQL})
WHERE (id_a % 4 = 1 OR id_b % 4 = 1)
  AND ((id_a % 2 = 0 AND id_a % 16 <> 0) OR id_a % 4 = 1)
  AND ((id_b % 2 = 0 AND id_b % 16 <> 0) OR id_b % 4 = 1)
"""


def streaming_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous cluster maintenance end-to-end (round-9): documents
    replay as 4 REAL micro-batches through
    ``streaming.cluster_ingest_stream`` — each batch LSH-bands its
    docs, folds candidate pairs (vs the growing band index + in-batch)
    into the persisted cluster map via the contracted-graph append, and
    appends its band rows. The oracle clusters the WHOLE corpus at once
    (dedup_minhash_lsh's band-pair SQL under the recursive-CTE
    closure): every band-sharing pair is discovered exactly once across
    batches and CC is edge-order-insensitive, so the streamed map must
    hash identically to the one-shot clustering — batching, index
    growth, ledger, and bucket-partial rewrites all have to cancel
    out."""
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from ue_big_data_project_spark import streaming as ST
    from ue_big_data_project_spark.operators.dedup import read_cluster_map
    from ue_big_data_project_spark.session import apply_session_conf

    apply_session_conf(spark)
    # Half the corpus in 3 batches: the sink's per-batch cost is real
    # (banding + contracted CC + bucket rewrite), so the bench entry
    # stays in its family's footprint; the oracle filters identically.
    # Equivalence in kind is unchanged — full-corpus appends are
    # exercised by dedup_clusters_incremental and the pytest suite.
    d = load_tables(spark, sf_dir, ("documents",))["documents"].filter(
        F.col("doc_id") % 2 == 0
    )
    root = _tf.mkdtemp(prefix="spark_graft_cluststream_")
    try:
        # One staging job for all 3 batch files (round-12, guide §2.4).
        stage = stage_batches(
            d.select("doc_id", "text"),
            (F.col("doc_id") / 2) % 3,
            root,
        )
        sdf = spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", 1
        ).parquet(stage)
        # Right-size the per-batch shuffles for a bounded replay (the
        # drain_to_table precedent): the contracted CC and candidate
        # joins run a dozen tiny jobs per micro-batch, and a vanilla
        # session's 200 (or the engine's 32) partitions pay pure task
        # overhead at this batch size. Scoped to the drain, restored
        # after; production streams size this to real batch width.
        key = "spark.sql.shuffle.partitions"
        prev = spark.conf.get(key)
        spark.conf.set(key, "8")
        try:
            q = ST.cluster_ingest_stream(
                sdf,
                map_path=_os.path.join(root, "cmap"),
                band_index_path=_os.path.join(root, "bands"),
                ledger_dir=_os.path.join(root, "_ledger"),
            )
            ST.run_until_drained(q)
        finally:
            spark.conf.set(key, prev)
        return (
            read_cluster_map(spark, _os.path.join(root, "cmap"))
            .select("doc_id", "component")
            .localCheckpoint(eager=True)
        )
    finally:
        _sh.rmtree(root, ignore_errors=True)


# The oracle clusters the SAME half-corpus: DEDUP_MINHASH_SQL reads the
# `documents` view, so the filter is injected by retargeting it at a
# filtered CTE (string-level, like the shared-oracle sketch twins).
STREAMING_DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE docs_half AS (
  SELECT * FROM documents WHERE doc_id % 2 = 0
), pairs AS (
  SELECT id_a, id_b FROM (
    {DEDUP_MINHASH_SQL.replace("FROM documents", "FROM docs_half")}
  ) p
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL
  SELECT id_b AS a, id_a AS b FROM pairs
), reach(node, label) AS (
  SELECT doc_id, doc_id FROM docs_half
  UNION
  SELECT e.a, r.label FROM reach r JOIN edges e ON e.b = r.node
)
SELECT node AS doc_id, CAST(min(label) AS BIGINT) AS component
FROM reach GROUP BY node
"""


def dedup_clusters_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETENTION on the persisted cluster map (round-10): cluster HALF
    the corpus, persist the component-bucketed map, expire every 16th
    doc via ``rewrite_cluster_map`` (storage shed — survivors keep
    their grouping and their labels, even labels naming expired docs),
    and read the pruned map back. The oracle clusters the same half
    corpus in full (recursive-CTE closure — expired docs still
    participate in connectivity and in the min-label) and then filters
    to the keep set: exactly the prune contract, so hash-equality pins
    both the row shed and the label freeze."""
    import shutil as _sh
    import tempfile as _tf

    from ue_big_data_project_spark.operators.dedup import (
        read_cluster_map,
        rewrite_cluster_map,
        write_cluster_map,
    )
    from ue_big_data_project_spark.operators.graph import (
        connected_components,
    )

    d = load_tables(spark, sf_dir, ("documents",))["documents"].filter(
        F.col("doc_id") % 2 == 0
    )
    pairs = DD.ngram_jaccard_pairs(
        d, "doc_id", "text", shingle_n=3, threshold=0.8
    )
    assign = connected_components(
        d.select("doc_id"), pairs,
        node_col="doc_id", src_col="id_a", dst_col="id_b",
    )
    root = _tf.mkdtemp(prefix="spark_graft_cprune_")
    try:
        cmap = root + "/cmap"
        write_cluster_map(assign, cmap, n_buckets=16)
        keep = d.filter(F.col("doc_id") % 16 != 0).select("doc_id")
        rewrite_cluster_map(spark, cmap, keep)
        return (
            read_cluster_map(spark, cmap)
            .select("doc_id", "component")
            .localCheckpoint(eager=True)
        )
    finally:
        _sh.rmtree(root, ignore_errors=True)


# Same closure as the streaming twin (retargeted at the half corpus),
# with the keep-set filter applied AFTER the closure — labels come from
# the FULL half-corpus connectivity, exactly like the pruned map's.
DEDUP_CLUSTERS_PRUNED_SQL = f"""
WITH RECURSIVE docs_half AS (
  SELECT * FROM documents WHERE doc_id % 2 = 0
), pairs AS (
  SELECT id_a, id_b FROM (
    {DEDUP_JACCARD_SQL.replace("FROM documents", "FROM docs_half")}
  ) p
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL
  SELECT id_b AS a, id_a AS b FROM pairs
), reach(node, label) AS (
  SELECT doc_id, doc_id FROM docs_half
  UNION
  SELECT e.a, r.label FROM reach r JOIN edges e ON e.b = r.node
)
SELECT node AS doc_id, CAST(min(label) AS BIGINT) AS component
FROM reach WHERE node % 16 <> 0 GROUP BY node
"""


def dedup_span_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level (substring) dedup — the Lee et al. 2022 granularity:
    find every 5-token window that also occurs in another document,
    merge overlaps into maximal duplicated spans, and STRIP them,
    keeping each document's unique remainder
    (operators.dedup.span_dedup_docs). Per affected doc: span count,
    covered-token count/fraction, and md5 of the reconstructed
    stripped text — the hash pins the exact byte-level removal, not
    just the counts. Doc-level dedup (exact/minhash/jaccard) cannot
    see these: a boilerplate header shared by thousands of otherwise
    unique pages never pushes whole-doc Jaccard over threshold."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    out = DD.span_dedup_docs(d, "doc_id", "text", n=5, min_docs=2)
    return out.select(
        "doc_id",
        "n_dup_spans",
        "dup_tokens",
        # long, matching DuckDB len() — F.size is int32, and strict
        # dtype-sensitive comparisons (the verify-skill sim) flag it.
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "dup_frac",
        "kept_tokens",
        F.md5("clean_text").alias("clean_fp"),
    )


# Positional 5-gram windows via LOCKSTEP unnest of parallel pos/gram
# lists (DuckDB 1.0 binds struct_pack-of-an-outer-slice inside a lambda
# to the wrong overload, so no struct walk). Islands: window [q,q+5)
# merges with predecessor [p,p+5) iff q−p ≤ 5 (overlap or adjacency);
# lag NULL → new island, mirroring the Spark F.when branch exactly.
DEDUP_SPAN_SQL = f"""
WITH toks AS (SELECT doc_id, {_WORDS} AS words FROM documents),
grams AS (
  SELECT doc_id, len(words) AS n_tokens,
         unnest(CASE WHEN len(words) >= 5
                THEN range(0, len(words) - 4) ELSE [] END) AS pos,
         unnest(CASE WHEN len(words) >= 5
                THEN list_transform(range(1, len(words) - 3),
                     i -> array_to_string(words[i:i+4], ' '))
                ELSE [] END) AS gram
  FROM toks
),
dup AS (
  SELECT gram FROM grams GROUP BY gram
  HAVING count(DISTINCT doc_id) >= 2
),
hits AS (
  SELECT g.doc_id, g.pos, g.n_tokens FROM grams g JOIN dup USING (gram)
),
brk AS (
  SELECT doc_id, pos, n_tokens,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   <= 5 THEN 0 ELSE 1 END AS is_new
  FROM hits
),
isl AS (
  SELECT doc_id, pos, n_tokens,
         sum(is_new) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM brk
),
spans AS (
  SELECT doc_id, island, min(pos) AS s, max(pos) + 5 AS e,
         max(n_tokens) AS n_tokens
  FROM isl GROUP BY 1, 2
),
stats AS (
  SELECT doc_id, count(*) AS n_dup_spans,
         CAST(sum(e - s) AS BIGINT) AS dup_tokens,
         max(n_tokens) AS n_tokens,
         {sql_round("sum(e - s) * 1.0 / max(n_tokens)", 4)} AS dup_frac
  FROM spans GROUP BY doc_id
),
covered AS (
  SELECT DISTINCT doc_id, unnest(range(pos, pos + 5)) AS tokpos FROM hits
),
tokrows AS (
  SELECT doc_id, unnest(range(0, len(words))) AS tokpos,
         unnest(words) AS word
  FROM toks
),
kept AS (
  SELECT t.doc_id, t.tokpos, t.word
  FROM tokrows t ANTI JOIN covered c
    ON t.doc_id = c.doc_id AND t.tokpos = c.tokpos
),
clean AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_tokens,
         string_agg(word, ' ' ORDER BY tokpos) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT s.doc_id, s.n_dup_spans, s.dup_tokens, s.n_tokens, s.dup_frac,
       coalesce(c.kept_tokens, 0) AS kept_tokens,
       md5(coalesce(c.clean_text, '')) AS clean_fp
FROM stats s LEFT JOIN clean c ON s.doc_id = c.doc_id
"""


def text_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass: email/URL redaction with placeholder tokens +
    per-doc counts; md5 of the scrubbed text proves the exact redacted
    bytes match cross-engine."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    emails, urls = TX.pii_counts("text")
    return d.select(
        "doc_id",
        emails.alias("n_emails"),
        urls.alias("n_urls"),
        F.md5(TX.scrub_pii("text")).alias("scrubbed_md5"),
    )


TEXT_SCRUB_SQL = f"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{TX.EMAIL_PATTERN}')) AS INTEGER) AS n_emails,
  CAST(len(regexp_extract_all(text, '{TX.URL_PATTERN}')) AS INTEGER) AS n_urls,
  md5(regexp_replace(
        regexp_replace(text, '{TX.EMAIL_PATTERN}', '<EMAIL>', 'g'),
        '{TX.URL_PATTERN}', '<URL>', 'g')) AS scrubbed_md5
FROM documents
"""


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality scoring, pure expressions (no UDF)."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return d.select(
        "doc_id",
        TX.token_count("text").alias("n_tokens"),
        TX.distinct_token_count("text").alias("n_distinct"),
        TX.avg_token_length("text").alias("avg_token_len"),
        TX.type_token_ratio("text").alias("ttr"),
        TX.quality_score("text").alias("quality"),
    )


_TTR10 = sql_round("CAST(len(list_distinct(words)) AS DOUBLE) / len(words)", 10)
_PUNCT10 = sql_round(
    "(length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')))"
    " * 1.0 / greatest(length(text), 1)",
    10,
)
_QUALITY = sql_round(
    "0.4 * (CASE WHEN n >= 100 AND n <= 2000 THEN 1.0"
    " WHEN n < 100 THEN n / 100.0"
    " ELSE 2000.0 / n END)"
    f" + 0.4 * {_TTR10}"
    f" + 0.2 * (1 - least({_PUNCT10} * 5, 1.0))",
    4,
)
TEXT_STATS_SQL = f"""
WITH t AS (
  SELECT doc_id, text, {_WORDS} AS words, length(text) AS n FROM documents
)
SELECT doc_id,
  CAST(len(words) AS INTEGER) AS n_tokens,
  CAST(len(list_distinct(words)) AS INTEGER) AS n_distinct,
  {sql_round("CAST(list_reduce(list_transform(words, w -> length(w)), (a, b) -> a + b) AS DOUBLE) / len(words)", 4)} AS avg_token_len,
  {sql_round("CAST(len(list_distinct(words)) AS DOUBLE) / len(words)", 4)} AS ttr,
  {_QUALITY} AS quality
FROM t
"""


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-heuristic language ID with per-language scores."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    cols = [F.col("doc_id")]
    for lang in sorted(TX.LANG_STOPWORDS):
        cols.append(TX.stopword_hits("text", lang).alias(f"{lang}_hits"))
    cols.append(TX.langid("text").alias("lang_pred"))
    return d.select(*cols)


def _langid_sql() -> str:
    hit_exprs = []
    for lang in sorted(TX.LANG_STOPWORDS):
        pat = "\\b(" + "|".join(TX.LANG_STOPWORDS[lang]) + ")\\b"
        hit_exprs.append(
            f"CAST(len(regexp_extract_all({_NORM}, '{pat}')) AS INTEGER) AS {lang}_hits"
        )
    langs = sorted(TX.LANG_STOPWORDS)
    best = "greatest(" + ", ".join(f"{lang}_hits" for lang in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN {best} > 0 AND {lang}_hits = {best} THEN '{lang}'" for lang in langs
    ) + " ELSE 'und' END"
    return f"""
WITH hits AS (
  SELECT doc_id, {", ".join(hit_exprs)} FROM documents
)
SELECT doc_id, {", ".join(f"{lang}_hits" for lang in langs)}, {case} AS lang_pred
FROM hits
"""


TEXT_LANGID_SQL = _langid_sql()


def knn_cosine_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for query vectors vec_id < 10 (broadcast side)."""
    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return brute_force_knn(e, queries, k=5)


_DOT = (
    "list_reduce(list_transform(range(1, 65), "
    "i -> a.embedding[i]::DOUBLE * q.query_vec[i]::DOUBLE), (x, y) -> x + y)"
)
_NORM_A = (
    "sqrt(list_reduce(list_transform(a.embedding, "
    "x -> x::DOUBLE * x::DOUBLE), (x, y) -> x + y))"
)
_NORM_Q = (
    "sqrt(list_reduce(list_transform(q.query_vec, "
    "x -> x::DOUBLE * x::DOUBLE), (x, y) -> x + y))"
)
KNN_BRUTE_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS query_vec
  FROM embeddings WHERE vec_id < 10
),
scored AS (
  SELECT q.query_id, a.vec_id,
         {sql_round(f"CASE WHEN {_NORM_A} * {_NORM_Q} > 0 THEN {_DOT} / ({_NORM_A} * {_NORM_Q}) ELSE 0.0 END", 6)} AS cosine_sim
  FROM embeddings a, q
  WHERE a.vec_id <> q.query_id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, vec_id, cosine_sim, rank FROM ranked WHERE rank <= 5
"""


def knn_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via deterministic random-hyperplane LSH buckets."""
    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return lsh_knn(e, queries, k=5, planes=4, dim=64)


def _lsh_sql() -> str:
    from ue_big_data_project_spark.operators.similarity import _md5_parity

    plane_terms = []
    for p in range(4):
        coeffs = ", ".join(
            "1" if _md5_parity(f"{p}:{d}") else "-1" for d in range(64)
        )
        proj = (
            f"list_reduce(list_transform(range(1, 65), "
            f"i -> embedding[i]::DOUBLE * ([{coeffs}])[i]), (x, y) -> x + y)"
        )
        plane_terms.append(f"(CASE WHEN {proj} > 0 THEN 1 ELSE 0 END) * {1 << p}")
    bucket = " + ".join(plane_terms)
    return f"""
WITH b AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, embedding AS query_vec, bucket
  FROM b WHERE vec_id < 10
),
scored AS (
  SELECT q.query_id, a.vec_id,
         {sql_round(f"CASE WHEN {_NORM_A} * {_NORM_Q} > 0 THEN {_DOT} / ({_NORM_A} * {_NORM_Q}) ELSE 0.0 END", 6)} AS cosine_sim
  FROM b a JOIN q ON a.bucket = q.bucket AND a.vec_id <> q.query_id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, vec_id, cosine_sim, rank FROM ranked WHERE rank <= 5
"""


KNN_LSH_SQL = _lsh_sql()


def _cos_sql(va: str, vb: str, dim: int = 64) -> str:
    """Rounded, zero-guarded cosine between two SQL list expressions —
    the oracle twin of ``functions.vectors.cosine`` + ``pround(·, 6)``."""
    dot = (
        f"list_reduce(list_transform(range(1, {dim + 1}), "
        f"i -> {va}[i]::DOUBLE * {vb}[i]::DOUBLE), (x, y) -> x + y)"
    )
    na = (
        f"sqrt(list_reduce(list_transform({va}, "
        "x -> x::DOUBLE * x::DOUBLE), (x, y) -> x + y))"
    )
    nb = (
        f"sqrt(list_reduce(list_transform({vb}, "
        "x -> x::DOUBLE * x::DOUBLE), (x, y) -> x + y))"
    )
    return sql_round(
        f"CASE WHEN {na} * {nb} > 0 THEN {dot} / ({na} * {nb}) ELSE 0.0 END", 6
    )


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact all-pairs, cos ≥ 0.4)."""
    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return cosine_pairs(e, threshold=0.4)


DEDUP_EMBEDDING_SQL = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {_cos_sql("a.embedding", "b.embedding")} AS cosine_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {_cos_sql("a.embedding", "b.embedding")} >= 0.4
"""


def knn_cosine_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via an IVF index: 16 k-means cells (2 Lloyd
    iterations on the default 1-in-4 deterministic training sample,
    md5 init, decimal-exact sum centroids —
    operators/similarity.kmeans_centroids), nprobe=2."""
    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return ivf_knn(e, queries, k=5, n_centroids=16, nprobe=2, kmeans_iters=2)


def knn_cosine_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 against a PERSISTED IVF index (build once, query many):
    the corpus is written partitioned by Voronoi cell
    (operators/similarity.build_ivf_index), then the probe reads only
    the nprobe matched cell directories (ivf_knn_indexed — partition
    pruning asserted in tests/test_approx.py). Same parameters and
    oracle as knn_cosine_ivf: persisting the index must not change the
    answer."""
    import shutil as _sh
    import tempfile as _tf

    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    root = _tf.mkdtemp(prefix="spark_graft_ivf_")
    idx = root + "/ivf"
    # Materialize the (small) result before deleting the scratch index;
    # the finally guarantees failed runs don't accumulate corpus copies
    # in /tmp either.
    try:
        build_ivf_index(e, idx, n_centroids=16, kmeans_iters=2)
        queries = e.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        return ivf_knn_indexed(
            spark, idx, queries, k=5, nprobe=2
        ).localCheckpoint(eager=True)
    finally:
        _sh.rmtree(root, ignore_errors=True)


def knn_cosine_ivf_appended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 against an INCREMENTALLY MAINTAINED IVF index: the
    quantizer trains once on the full corpus, the index is built with
    only the even vectors, and the odd vectors arrive later via
    operators/similarity.ivf_index_append — assigned with the frozen
    centroids, appended into their cell directories, no retrain. The
    appended index must answer exactly like a one-shot build against
    the same centroids, so the oracle is the same IVF SQL replay as
    knn_cosine_ivf / knn_cosine_ivf_indexed.

    The quantizer-train + even-half base build is a session-scoped
    FIXTURE (built once per process via ``_session_index``, the probe
    twins' discipline): a timed run pays only a filesystem copy of the
    small base index plus the operator under measurement — the
    O(increment) append and the pruned probe. Round-10 bench triage
    showed the old self-contained shape (full k-means + base build per
    sample) paid heavy small-file metadata IO per sample, amplifying
    box jitter ~3× without measuring anything the build entries
    (knn_cosine_ivf / knn_cosine_ivf_indexed) don't already cover."""
    import shutil as _sh
    import tempfile as _tf

    from ue_big_data_project_spark.operators.similarity import (
        ivf_index_append,
        kmeans_centroids,
    )

    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]

    def _build_base(p: str) -> None:
        cents = kmeans_centroids(e, n_centroids=16, iters=2)
        build_ivf_index(
            e.filter(F.col("vec_id") % 2 == 0), p, centroids=cents
        )

    base = _session_index("ivf_inc_base", sf_dir, _build_base)
    root = _tf.mkdtemp(prefix="spark_graft_ivf_inc_")
    idx = root + "/ivf"
    try:
        # Appends mutate the index in place, so each run works on a
        # fresh clone of the frozen base (a few MB of parquet —
        # filesystem copy, no Spark job).
        _sh.copytree(base, idx)
        _sh.copytree(base + "_centroids", idx + "_centroids")
        ivf_index_append(spark, idx, e.filter(F.col("vec_id") % 2 == 1))
        queries = e.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        return ivf_knn_indexed(
            spark, idx, queries, k=5, nprobe=2
        ).localCheckpoint(eager=True)
    finally:
        _sh.rmtree(root, ignore_errors=True)


def knn_cosine_ivf_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETENTION for the persisted IVF index — the embeddings family's
    prune path (the `dedup_image_fp_pruned` / `dedup_jaccard_pruned`
    precedent): the session-scoped full-corpus index is cloned,
    operators/similarity.rewrite_ivf_index drops every 3rd vector
    (takedowns) while the frozen quantizer stays untouched, and the
    standard query batch probes the SURVIVORS. Cell boundaries don't
    depend on which vectors exist, so the oracle is the IVF SQL replay
    with ONLY the scored-corpus CTE restricted to kept ids — the Lloyd
    chain still trains on the full sample, exactly as the persisted
    centroids did."""
    import shutil as _sh
    import tempfile as _tf

    from ue_big_data_project_spark.operators.similarity import (
        rewrite_ivf_index,
    )

    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    base = _session_index(
        "ivf",
        sf_dir,
        lambda p: build_ivf_index(e, p, n_centroids=16, kmeans_iters=2),
    )
    root = _tf.mkdtemp(prefix="spark_graft_ivf_prune_")
    idx = root + "/ivf"
    try:
        # The rewrite mutates the index in place, so each run works on
        # a fresh clone of the session base (a few MB of parquet —
        # filesystem copy, no Spark job).
        _sh.copytree(base, idx)
        _sh.copytree(base + "_centroids", idx + "_centroids")
        rewrite_ivf_index(
            spark, idx, e.filter(F.col("vec_id") % 3 != 0).select("vec_id")
        )
        queries = e.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        return ivf_knn_indexed(
            spark, idx, queries, k=5, nprobe=2
        ).localCheckpoint(eager=True)
    finally:
        _sh.rmtree(root, ignore_errors=True)


# Session-scoped prebuilt scratch indexes for the probe-only bench
# twins below: built ONCE per (kind, sf_dir) per process, removed at
# interpreter exit. The build+probe gate entries (knn_cosine_ivf_indexed
# / text_bm25_indexed) stay self-contained — these twins exist so the
# bench can report the 100 TB-relevant probe latency separately from the
# one-time index build it amortizes (round-4 verdict task 4).
_SESSION_INDEXES: dict[tuple[str, str], str] = {}


def _session_index(kind: str, sf_dir: str, build) -> str:
    import atexit as _atexit
    import shutil as _sh
    import tempfile as _tf

    key = (kind, sf_dir)
    if key not in _SESSION_INDEXES:
        root = _tf.mkdtemp(prefix=f"spark_graft_{kind}_session_")
        idx = root + "/index"
        try:
            build(idx)
        except BaseException:
            _sh.rmtree(root, ignore_errors=True)
            raise
        _atexit.register(_sh.rmtree, root, ignore_errors=True)
        _SESSION_INDEXES[key] = idx
    return _SESSION_INDEXES[key]


def warm_session_indexes(spark: SparkSession, sf_dir: str) -> None:
    """Build the session-scoped scratch indexes the probe-only bench
    twins query, WITHOUT timing them. bench.py calls this before its
    timed passes: otherwise the first timed invocation of a probe twin
    pays the one-off index build, and with a single pass (or a budget
    that ends after pass 1) the 'probe-only' number would silently be a
    build+probe number."""
    from ue_big_data_project_spark.operators.retrieval import (
        build_text_index,
    )

    from ue_big_data_project_spark.operators.similarity import (
        kmeans_centroids,
    )

    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    _session_index(
        "ivf",
        sf_dir,
        lambda p: build_ivf_index(e, p, n_centroids=16, kmeans_iters=2),
    )
    # The appended-IVF entry's frozen base (quantizer trained on the
    # full corpus + even-half index) — see knn_cosine_ivf_appended.
    _session_index(
        "ivf_inc_base",
        sf_dir,
        lambda p: build_ivf_index(
            e.filter(F.col("vec_id") % 2 == 0),
            p,
            centroids=kmeans_centroids(e, n_centroids=16, iters=2),
        ),
    )
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    _session_index(
        "bm25", sf_dir, lambda p: build_text_index(d, p, n_buckets=16)
    )


def knn_cosine_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe-only twin of knn_cosine_ivf_indexed: identical parameters,
    answer, and oracle, but the persisted IVF index is built once per
    session and reused, so a timed run measures ONLY the pruned probe
    (read nprobe cell directories + rescore) — the steady-state cost a
    100 TB deployment pays per query batch."""
    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    idx = _session_index(
        "ivf",
        sf_dir,
        lambda p: build_ivf_index(e, p, n_centroids=16, kmeans_iters=2),
    )
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return ivf_knn_indexed(spark, idx, queries, k=5, nprobe=2)


def text_bm25_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe-only twin of text_bm25_indexed: the term-sharded inverted
    index is built once per session, so a timed run measures ONLY the
    bucket-pruned postings probe + BM25 top-k."""
    from ue_big_data_project_spark.operators.retrieval import (
        bm25_topk_indexed,
        build_text_index,
    )

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    idx = _session_index(
        "bm25", sf_dir, lambda p: build_text_index(d, p, n_buckets=16)
    )
    q = local_relation(spark, 
        list(_BM25_QUERIES), "query_id int, query_text string"
    )
    return bm25_topk_indexed(spark, idx, q, k=5)


def knn_cosine_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via product quantization + asymmetric distance:
    4 subspaces x 8-entry L2 codebooks (1 Lloyd iteration, deterministic
    sampled training), items reduced to 4 codes + a stored norm, scored
    entirely from the per-query code lookup table
    (operators/similarity.pq_codebooks/pq_encode/pq_knn)."""
    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    cb = pq_codebooks(e, m=4, k=8, iters=1)
    codes = pq_encode(e, cb)
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return pq_knn(codes, cb, queries, k=5)


def _pq_sql(
    m: int = 4,
    k: int = 8,
    iters: int = 1,
    knn_k: int = 5,
    train_mod: int = 4,
    dim: int = 64,
) -> str:
    """DuckDB replay of pq_codebooks + pq_encode + pq_knn: one unrolled
    L2 k-means chain per subspace (decimal-mean updates), dense-code
    remap, then the ADC join — every float op mirrors the Spark
    expressions (fold-left dots, sqrt-fold norms squared, portable
    rounding, decimal partial sums)."""
    d = dim // m

    def sub_dot(va: str, vb: str) -> str:
        return (
            f"list_reduce(list_transform(range(1, {d + 1}), "
            f"i -> {va}[i]::DOUBLE * {vb}[i]::DOUBLE), (x, y) -> x + y)"
        )

    def sub_norm(v: str) -> str:
        return (
            f"sqrt(list_reduce(list_transform({v}, "
            "x -> x::DOUBLE * x::DOUBLE), (x, y) -> x + y))"
        )

    def l2_score(va: str, vb: str) -> str:
        n = sub_norm(vb)
        return sql_round(f"2.0 * ({sub_dot(va, vb)}) - ({n}) * ({n})", 6)

    parts = ["WITH "]
    chains = []
    for j in range(m):
        lo = j * d + 1
        hi = j * d + d
        chain = f"""
tr{j} AS (
  SELECT vec_id, embedding[{lo}:{hi}] AS sub
  FROM embeddings WHERE vec_id % {train_mod} = 0
),
c{j}_0 AS (
  SELECT vec_id AS cent_id,
         list_transform(sub, x -> x::DOUBLE) AS cent_vec
  FROM tr{j}
  ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
  LIMIT {k}
)"""
        for it in range(iters):
            chain += f""",
a{j}_{it} AS (
  SELECT vec_id, sub, cent_id FROM (
    SELECT t.vec_id, t.sub, c.cent_id,
           row_number() OVER (
             PARTITION BY t.vec_id
             ORDER BY {l2_score("t.sub", "c.cent_vec")} DESC, c.cent_id ASC
           ) AS rn
    FROM tr{j} t, c{j}_{it} c
  ) WHERE rn = 1
),
s{j}_{it} AS (
  SELECT cent_id, pos,
         CAST(sum(CAST(sub[pos]::DOUBLE AS DECIMAL(27,10))) AS DOUBLE)
           / count(*) AS v
  FROM (
    SELECT cent_id, sub, unnest(range(1, len(sub) + 1)) AS pos
    FROM a{j}_{it}
  )
  GROUP BY 1, 2
),
n{j}_{it} AS (
  SELECT cent_id, list(v ORDER BY pos) AS cent_vec
  FROM s{j}_{it} GROUP BY 1
),
c{j}_{it + 1} AS (
  SELECT c.cent_id, coalesce(n.cent_vec, c.cent_vec) AS cent_vec
  FROM c{j}_{it} c LEFT JOIN n{j}_{it} n ON c.cent_id = n.cent_id
)"""
        chain += f""",
cb{j} AS (
  SELECT {j} AS subspace,
         CAST(row_number() OVER (ORDER BY cent_id ASC) - 1 AS INTEGER)
           AS code,
         cent_vec
  FROM c{j}_{iters}
),
enc{j} AS (
  SELECT vec_id, {j} AS subspace, code FROM (
    SELECT e.vec_id, c.code,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {l2_score(f"e.embedding[{lo}:{hi}]", "c.cent_vec")}
                      DESC, c.code ASC
           ) AS rn
    FROM embeddings e, cb{j} c
  ) WHERE rn = 1
)"""
        chains.append(chain)
    parts.append(",".join(chains))
    full_norm = (
        "sqrt(list_reduce(list_transform(embedding, "
        "x -> x::DOUBLE * x::DOUBLE), (x, y) -> x + y))"
    )
    q_norm = (
        "sqrt(list_reduce(list_transform(q.query_vec, "
        "x -> x::DOUBLE * x::DOUBLE), (x, y) -> x + y))"
    )
    lut_dot = (
        f"list_reduce(list_transform(range(1, {d + 1}), "
        f"i -> q.query_vec[cb.subspace * {d} + i]::DOUBLE "
        "* cb.cent_vec[i]::DOUBLE), (x, y) -> x + y)"
    )
    cball = " UNION ALL ".join(f"SELECT * FROM cb{j}" for j in range(m))
    encall = " UNION ALL ".join(f"SELECT * FROM enc{j}" for j in range(m))
    parts.append(f""",
cball AS ({cball}),
encall AS ({encall}),
inorm AS (SELECT vec_id, {full_norm} AS vec_norm FROM embeddings),
q AS (
  SELECT vec_id AS query_id, embedding AS query_vec
  FROM embeddings WHERE vec_id < 10
),
lut AS (
  SELECT q.query_id, cb.subspace, cb.code,
         {sql_round(lut_dot, 6)} AS partial,
         {q_norm} AS qn
  FROM q, cball cb
),
agg AS (
  SELECT l.query_id, e.vec_id,
         CAST(sum(CAST(l.partial AS DECIMAL(27,10))) AS DOUBLE) AS dsum,
         first(l.qn) AS qn, first(i.vec_norm) AS inorm
  FROM encall e
  JOIN lut l ON e.subspace = l.subspace AND e.code = l.code
  JOIN inorm i ON e.vec_id = i.vec_id
  GROUP BY 1, 2
),
scored AS (
  SELECT query_id, vec_id,
         {sql_round("CASE WHEN qn > 0 AND inorm > 0 THEN dsum / (qn * inorm) ELSE 0.0 END", 6)}
           AS cosine_sim
  FROM agg WHERE vec_id <> query_id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, vec_id, cosine_sim, rank FROM ranked WHERE rank <= {knn_k}
""")
    return "".join(parts)


KNN_PQ_SQL = _pq_sql()


def _lloyd_chain_sql(
    n_centroids: int = 16,
    iters: int = 2,
    train_mod: int = 4,
) -> list[str]:
    """The shared DuckDB replay of ``kmeans_centroids``: the Lloyd loop
    UNROLLED as one CTE chain per iteration (assign → decimal sums →
    rebuild → empty-cell coalesce), bit-equal to the Spark plan because
    every step is decimal-exact or rounded at a fixed scale. Returns
    the CTE-prefix parts; the final centroid table is ``c{iters}``.
    Consumed by both the IVF oracle (`_ivf_sql`) and the SemDeDup
    oracle (`_semdedup_sql`)."""
    parts = [
        f"""
WITH train AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % {train_mod} = 0
),
c0 AS (
  SELECT vec_id AS cent_id,
         list_transform(embedding, x -> x::DOUBLE) AS cent_vec
  FROM train
  ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
  LIMIT {n_centroids}
)"""
    ]
    for it in range(iters):
        parts.append(
            f""",
a{it} AS (
  SELECT vec_id, embedding, cent_id AS cell FROM (
    SELECT t.vec_id, t.embedding, c.cent_id,
           row_number() OVER (
             PARTITION BY t.vec_id
             ORDER BY {_cos_sql("t.embedding", "c.cent_vec")} DESC,
                      c.cent_id ASC
           ) AS rn
    FROM train t, c{it} c
  ) WHERE rn = 1
),
s{it} AS (
  SELECT cell AS cent_id, pos,
         CAST(sum(CAST(CAST(embedding[pos] AS DOUBLE)
                       AS DECIMAL(27,10))) AS DOUBLE) AS v
  FROM (
    SELECT cell, embedding,
           unnest(range(1, len(embedding) + 1)) AS pos
    FROM a{it}
  )
  GROUP BY 1, 2
),
n{it} AS (
  SELECT cent_id, list(v ORDER BY pos) AS cent_vec FROM s{it} GROUP BY 1
),
c{it + 1} AS (
  SELECT c.cent_id, coalesce(n.cent_vec, c.cent_vec) AS cent_vec
  FROM c{it} c LEFT JOIN n{it} n ON c.cent_id = n.cent_id
)"""
        )
    return parts


def _ivf_sql(
    n_centroids: int = 16,
    iters: int = 2,
    nprobe: int = 2,
    k: int = 5,
    train_mod: int = 4,
    item_where: str | None = None,
) -> str:
    """DuckDB replay of kmeans_centroids + ivf_knn (Lloyd chain from
    :func:`_lloyd_chain_sql` + tag/probe/score/rank tail).
    ``item_where`` restricts the SCORED corpus only (``item_sc``) — the
    retention oracle's shape: the quantizer is a frozen artifact, so
    the Lloyd chain still trains on the full sample while pruned
    vectors merely vanish from every probe's candidates."""
    parts = _lloyd_chain_sql(n_centroids, iters, train_mod)
    cent = f"c{iters}"
    item_cond = f" WHERE {item_where}" if item_where else ""
    parts.append(
        f""",
item_sc AS (
  SELECT e.vec_id, e.embedding, c.cent_id,
         {_cos_sql("e.embedding", "c.cent_vec")} AS cent_sim
  FROM embeddings e, {cent} c{item_cond}
),
tagged AS (
  SELECT vec_id, embedding, cent_id AS cell FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY cent_sim DESC, cent_id ASC) AS rn
    FROM item_sc
  ) WHERE rn = 1
),
q AS (
  SELECT vec_id AS query_id, embedding AS query_vec
  FROM embeddings WHERE vec_id < 10
),
q_sc AS (
  SELECT q.query_id, q.query_vec, c.cent_id,
         {_cos_sql("q.query_vec", "c.cent_vec")} AS cent_sim
  FROM q, {cent} c
),
probes AS (
  SELECT query_id, query_vec, cent_id AS cell FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cent_sim DESC, cent_id ASC) AS rn
    FROM q_sc
  ) WHERE rn <= {nprobe}
),
scored AS (
  SELECT p.query_id, t.vec_id,
         {_cos_sql("t.embedding", "p.query_vec")} AS cosine_sim
  FROM tagged t JOIN probes p ON t.cell = p.cell AND t.vec_id <> p.query_id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, vec_id, cosine_sim, rank FROM ranked WHERE rank <= {k}
"""
    )
    return "".join(parts)


KNN_IVF_SQL = _ivf_sql()

# Retention twin: same replay, scored corpus restricted to the kept
# vectors (quantizer-training CTEs untouched — frozen artifact).
KNN_IVF_PRUNED_SQL = _ivf_sql(item_where="e.vec_id % 3 <> 0")


def dedup_semantic_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-dup pruning scoped
    to k-means cells (operators.similarity.semdedup) — cluster with the
    deterministic Lloyd quantizer (16 cells, 2 iterations, 1-in-4
    training sample), pair items only WITHIN a cell, drop any item with
    a lower-id cell-mate at rounded cosine ≥ 0.4. Per item: cell +
    kept flag. The cell scoping is what scales: Σ|cell|² pair work vs
    the global block join's O(N²/B) — and it catches paraphrase-level
    duplicates that lexical (token-overlap) dedup cannot see."""
    from ue_big_data_project_spark.operators.similarity import semdedup

    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return semdedup(e, threshold=0.4)


def _semdedup_sql(
    n_centroids: int = 16,
    iters: int = 2,
    train_mod: int = 4,
    threshold: float = 0.4,
) -> str:
    """DuckDB replay of :func:`dedup_semantic_prune`: the shared Lloyd
    chain, the nearest-cell tag, then within-cell lowest-id-wins
    pruning at the same rounded-cosine threshold."""
    parts = _lloyd_chain_sql(n_centroids, iters, train_mod)
    cent = f"c{iters}"
    parts.append(
        f""",
item_sc AS (
  SELECT e.vec_id, e.embedding, c.cent_id,
         {_cos_sql("e.embedding", "c.cent_vec")} AS cent_sim
  FROM embeddings e, {cent} c
),
tagged AS (
  SELECT vec_id, embedding, cent_id AS cell FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY cent_sim DESC, cent_id ASC) AS rn
    FROM item_sc
  ) WHERE rn = 1
),
drops AS (
  SELECT DISTINCT b.vec_id
  FROM tagged a JOIN tagged b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE {_cos_sql("a.embedding", "b.embedding")} >= {threshold}
)
SELECT t.vec_id, t.cell,
       CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS kept
FROM tagged t LEFT JOIN drops d ON t.vec_id = d.vec_id
"""
    )
    return "".join(parts)


DEDUP_SEMANTIC_PRUNE_SQL = _semdedup_sql()


def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace words + BPE-ish subword regex."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return d.select(
        "doc_id",
        TX.token_count("text").alias("n_tokens"),
        TX.bpe_token_count("text").alias("n_tokens_bpe"),
    )


# SQL-escape the embedded single quote in the BPE pattern.
_BPE_SQL_PAT = TX.BPE_SPLIT_PATTERN.replace("'", "''")
TEXT_TOKENS_SQL = f"""
SELECT doc_id,
  CAST(len({_WORDS}) AS INTEGER) AS n_tokens,
  CAST(len(regexp_extract_all({_NORM}, '{_BPE_SQL_PAT}')) AS INTEGER) AS n_tokens_bpe
FROM documents
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 content hash + positional rolling hash."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return d.select(
        "doc_id",
        TX.fingerprint("text").alias("fp_md5"),
        TX.rolling_fingerprint("text").alias("fp_roll"),
    )


_HEX8 = " + ".join(
    f"(strpos('0123456789abcdef', substr(hs[i], {k + 1}, 1)) - 1) * {16 ** (7 - k)}"
    for k in range(8)
)
TEXT_FINGERPRINT_SQL = f"""
WITH t AS (
  SELECT doc_id, md5({_NORM}) AS fp_md5,
         list_transform({_WORDS}, w -> md5(w)) AS hs
  FROM documents
)
SELECT doc_id, fp_md5,
  list_reduce(
    list_transform(range(1, len(hs) + 1), i -> i * ({_HEX8})),
    (a, b) -> a + b
  ) % {TX.ROLL_MOD} AS fp_roll
FROM t
"""


def _hex8_sql(md5_expr: str) -> str:
    """First-8-hex-digits → uint32 over an arbitrary md5-string SQL
    expression — the DuckDB twin of ``functions.text._hash32``."""
    return (
        "("
        + " + ".join(
            f"(strpos('0123456789abcdef', substr({md5_expr}, {k + 1}, 1))"
            f" - 1) * {16 ** (7 - k)}"
            for k in range(8)
        )
        + ")"
    )


def text_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document WINNOWING fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS scheme): min 4-gram hash per 5-gram window,
    rightmost on ties. Selected-set size + a positional digest pin the
    exact selection against the oracle's window-function replay. The
    whole computation is per-row array HOFs — ZERO shuffles, the
    100 TB-embarrassingly-parallel complement to the global
    ``text_fingerprint`` rolling hash (winnowing survives local edits:
    only windows touching an edit change their selection)."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    staged = d.select(
        "doc_id", TX.gram_hashes("text", k=4).alias("hs")
    ).select(
        "doc_id",
        F.size("hs").cast("int").alias("n_grams"),
        TX.winnow_select(F.col("hs"), w=5).alias("fps"),
    )
    return staged.select(
        "doc_id",
        "n_grams",
        F.size("fps").cast("int").alias("n_fp"),
        TX.winnow_digest(F.col("fps")).alias("fp_digest"),
    )


# Shared winnowing replay: positional 4-gram hashes → per-window min
# (rightmost tie via the max(pos) join-back) → distinct selections.
# Parameterized by a membership predicate because the pair query's
# stop-fingerprint cap is CORPUS-DEPENDENT: an incremental oracle must
# scope the df computation to its (index ∪ probe) corpus, not filter
# the full-corpus pair output (the pairwise-Jaccard trick would be
# wrong here).
def _winnow_cte_sql(where: str = "TRUE") -> str:
    return f"""g0 AS (
  SELECT doc_id, {_WORDS} AS words, len({_WORDS}) AS n_words
  FROM documents WHERE {where}
),
grams AS (
  SELECT doc_id, unnest(range(1, greatest(n_words - 3, 0) + 1)) AS pos,
         words
  FROM g0
),
gh AS (
  SELECT doc_id, pos,
    {_hex8_sql("md5(array_to_string(list_slice(words, pos, pos + 3), ' '))")}
      AS h
  FROM grams
),
wmin AS (
  SELECT doc_id, pos AS s,
         min(h) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS mh,
         max(pos) OVER (PARTITION BY doc_id) AS n_grams
  FROM gh
),
starts AS (SELECT * FROM wmin WHERE s <= greatest(1, n_grams - 4)),
sel AS (
  SELECT st.doc_id, st.s, st.mh, max(g.pos) AS sel_pos
  FROM starts st
  JOIN gh g ON g.doc_id = st.doc_id
           AND g.pos BETWEEN st.s AND st.s + 4 AND g.h = st.mh
  GROUP BY st.doc_id, st.s, st.mh
)"""


_WINNOW_CTE = _winnow_cte_sql()

TEXT_WINNOW_SQL = f"""
WITH {_WINNOW_CTE},
fps AS (SELECT DISTINCT doc_id, mh AS h, sel_pos AS p FROM sel),
agg AS (
  SELECT doc_id, count(*) AS n_fp,
         CAST(sum(h * p) % {TX.ROLL_MOD} AS BIGINT) AS fp_digest
  FROM fps GROUP BY doc_id
)
SELECT g0.doc_id,
       CAST(greatest(n_words - 3, 0) AS INTEGER) AS n_grams,
       CAST(coalesce(a.n_fp, 0) AS INTEGER) AS n_fp,
       CAST(coalesce(a.fp_digest, 0) AS BIGINT) AS fp_digest
FROM g0 LEFT JOIN agg a USING (doc_id)
"""


def dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level near-dup pairs by shared winnowing fingerprints
    (operators.dedup.winnow_pairs): ≥ 2 shared selected hashes, hashes
    in > 50 docs dropped as boilerplate before the self-join. On this
    corpus the threshold sits in a measured gap — unrelated docs share
    ≤ 1 fingerprint, true near-dups ≥ 6 — so it separates cleanly."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return DD.winnow_pairs(
        d, "doc_id", "text", k=4, w=5, min_shared=2, max_df=50
    )


DEDUP_WINNOW_PAIRS_SQL = f"""
WITH {_WINNOW_CTE},
fps AS (SELECT DISTINCT doc_id, mh AS h FROM sel),
df AS (SELECT h, count(*) AS ndocs FROM fps GROUP BY h),
keep AS (
  SELECT f.doc_id, f.h FROM fps f JOIN df USING (h) WHERE ndocs <= 50
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM keep a JOIN keep b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= 2
"""


def dedup_winnow_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided winnowing pair search — the FOURTH persisted-index
    family (band screen / Jaccard verify / BM25 terms / winnow
    substrings): HALF the corpus persists as a bucket-sharded
    fingerprint index with per-hash df DELTA rows (aggregated on read —
    nothing to freeze, so no staleness audit is ever needed, unlike the
    frozen-order Jaccard index); a disjoint quarter probes it for every
    probe-incident pair WITHOUT re-fingerprinting the corpus. The
    oracle recomputes the full-batch pair SQL with its CTEs SCOPED to
    the (index ∪ probe) corpus — the stop-fingerprint cap is
    corpus-dependent, so membership-filtering full-corpus pair output
    (the pairwise-Jaccard trick) would be wrong here."""
    import shutil as _sh
    import tempfile as _tf

    from ue_big_data_project_spark.operators.dedup import (
        winnow_probe_index,
        write_winnow_index,
    )

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    old = d.filter(F.col("doc_id") % 2 == 0)
    new = d.filter(F.col("doc_id") % 4 == 1)
    root = _tf.mkdtemp(prefix="spark_graft_widx_")
    try:
        idx = root + "/widx"
        write_winnow_index(old, idx)
        return winnow_probe_index(spark, idx, new)
    finally:
        _sh.rmtree(root, ignore_errors=True)


DEDUP_WINNOW_INCREMENTAL_SQL = f"""
WITH {_winnow_cte_sql("doc_id % 2 = 0 OR doc_id % 4 = 1")},
fps AS (SELECT DISTINCT doc_id, mh AS h FROM sel),
df AS (SELECT h, count(*) AS ndocs FROM fps GROUP BY h),
keep AS (
  SELECT f.doc_id, f.h FROM fps f JOIN df USING (h) WHERE ndocs <= 50
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM keep a JOIN keep b ON a.h = b.h AND a.doc_id < b.doc_id
WHERE a.doc_id % 4 = 1 OR b.doc_id % 4 = 1
GROUP BY 1, 2
HAVING count(*) >= 2
"""


def streaming_winnow_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous winnow-index maintenance end-to-end — the streaming
    drain for the fourth persisted-index family: the even half of the
    corpus replays as 3 REAL micro-batches through
    ``streaming.winnow_ingest_stream`` (each batch fingerprints ONLY
    itself and lands its (id, h) rows + df delta rows in its own
    crash-safe ``batch_id=N`` partition of the bucket sharding), then
    a disjoint quarter probes the STREAMED index. The oracle is
    ``dedup_winnow_incremental``'s union-corpus pair SQL VERBATIM —
    because df aggregates on read, batching must be invisible: the
    streamed index has to answer byte-for-byte like the one-shot
    ``write_winnow_index`` build the incremental entry uses."""
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from ue_big_data_project_spark import streaming as ST
    from ue_big_data_project_spark.operators.dedup import (
        winnow_probe_index,
    )
    from ue_big_data_project_spark.session import apply_session_conf

    apply_session_conf(spark)
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    old = d.filter(F.col("doc_id") % 2 == 0)
    new = d.filter(F.col("doc_id") % 4 == 1)
    root = _tf.mkdtemp(prefix="spark_graft_winstream_")
    try:
        # One staging job for all 3 batch files (round-12, guide §2.4).
        stage = stage_batches(
            old.select("doc_id", "text"),
            (F.col("doc_id") / 2) % 3,
            root,
        )
        sdf = spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", 1
        ).parquet(stage)
        # Right-size per-batch shuffles for the bounded replay (the
        # cluster-stream precedent); production streams size this to
        # real batch width.
        key = "spark.sql.shuffle.partitions"
        prev = spark.conf.get(key)
        spark.conf.set(key, "8")
        try:
            q = ST.winnow_ingest_stream(
                sdf,
                index_path=_os.path.join(root, "widx"),
                ledger_dir=_os.path.join(root, "_ledger"),
            )
            ST.run_until_drained(q)
        finally:
            spark.conf.set(key, prev)
        return winnow_probe_index(
            spark, _os.path.join(root, "widx"), new
        )
    finally:
        _sh.rmtree(root, ignore_errors=True)


# Frozen 24-rule BPE merge table: the byte-identical output of
# operators.bpe.bpe_train_merges(documents @ sf0.001, n_merges=24)
# (provenance pinned by tests/test_bpe.py::test_merge_table_provenance
# — retraining must reproduce this table exactly). Frozen-artifact
# discipline: the table is versioned WITH the code because token
# budgets computed against different merge tables are not comparable;
# retrain deliberately, never implicitly.
# Round 12: retrained WITH the Sennrich end-of-word marker (verdict
# task 8) — word-final subwords are distinct symbols from word-internal
# ones, so the marker shows up merged into frequent suffixes.
BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("e", "r"),
    ("e", "</w>"),
    ("n", "</w>"),
    ("o", "r"),
    ("t", "</w>"),
    ("er", "</w>"),
    ("o", "w"),
    ("ow", "</w>"),
    ("l", "u"),
    ("i", "n"),
    ("y", "</w>"),
    ("a", "r"),
    ("p", "ar"),
    ("g", "</w>"),
    ("a", "s"),
    ("h", "</w>"),
    ("a", "</w>"),
    ("s", "t"),
    ("a", "t"),
    ("a", "n</w>"),
    ("c", "an</w>"),
    ("s", "can</w>"),
    ("c", "o"),
    ("co", "lu"),
)


def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUBWORD token accounting (operators/bpe.bpe_token_counts): every
    document's whitespace words encode against the frozen BPE_MERGES
    table inside one Arrow pass — zero shuffles, per-batch word
    memoization — yielding the per-document word / BPE-token /
    character counts a training pipeline budgets with (packing a 4k
    context window by WORD count mis-fills it by the corpus's subword
    fan-out). The oracle replays the encode per word as a nested
    string-replace chain over the ``(sym)(sym)`` wrapped spelling —
    exactly equivalent to rank-ordered left-to-right non-overlapping
    merging (the operator's documented semantics), so the counts hash
    cross-engine."""
    from ue_big_data_project_spark.operators import bpe as BPE

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return BPE.bpe_token_counts(
        d, list(BPE_MERGES), end_marker=BPE.BPE_END_MARKER
    )


def _bpe_sql_chain(expr: str) -> str:
    for a, b in BPE_MERGES:
        expr = f"replace({expr}, '({a})({b})', '({a}{b})')"
    return expr


# Wrap every char as (c), then apply the merge chain (computed outside
# the f-string: expression parts cannot carry the \1 backref).
# The wrapped spelling appends the end-of-word sentinel (</w>) before
# the merge chain — the marker is a symbol like any other, and the
# '('-count token arithmetic is unchanged (no parens in the marker).
_BPE_WRAPPED = _bpe_sql_chain(
    "regexp_replace(word, '(.)', '(\\1)', 'g') || '(</w>)'"
)

# Empty-word guard (round-11 advice): Python's .split() yields [] for
# empty/whitespace-only text while DuckDB string_split('') yields [''],
# so the word list filters '' to keep n_words aligned. The (sym)(sym)
# wrapped-spelling token count assumes no document word contains a
# literal paren — pinned by test_fixture_documents_have_no_parens.
TEXT_BPE_TOKENS_SQL = f"""
WITH toks AS (SELECT doc_id, list_filter({_WORDS}, w -> w <> '') AS words
              FROM documents),
w AS (SELECT doc_id, len(words) AS n_words, unnest(words) AS word
      FROM toks),
enc AS (
  SELECT doc_id, n_words, length(word) AS wlen,
         {_BPE_WRAPPED} AS s
  FROM w
)
SELECT doc_id,
       CAST(any_value(n_words) AS BIGINT) AS n_words,
       CAST(sum(length(s) - length(replace(s, '(', ''))) AS BIGINT)
         AS n_bpe_tokens,
       CAST(sum(wlen) AS BIGINT) AS n_chars
FROM enc GROUP BY doc_id
"""


def text_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean token surprisal (nats/token) under an add-0.5
    smoothed unigram LM trained on the corpus itself
    (operators/retrieval.unigram_surprisal) — the CCNet-style
    quality/outlier score used to rank pretraining data: corpus-typical
    text scores low, gibberish and off-distribution text scores high.
    One (term) shuffle for the LM, one token⋈LM join reusing its
    partitioning, one per-doc aggregate; 6-dp partials + decimal sums
    keep the score hash-stable."""
    from ue_big_data_project_spark.operators.retrieval import (
        unigram_surprisal,
    )

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return unigram_surprisal(d, alpha=0.5)


TEXT_SURPRISAL_SQL = f"""
WITH base AS (
  SELECT doc_id, list_filter({_WORDS}, w -> w <> '') AS words FROM documents
),
toks AS (
  SELECT doc_id, len(words) AS dl, unnest(words) AS term FROM base
),
postings AS (
  SELECT doc_id, term, count(*) AS tf, max(dl) AS dl
  FROM toks GROUP BY doc_id, term
),
lm AS (SELECT term, CAST(sum(tf) AS BIGINT) AS c_t FROM postings GROUP BY term),
totals AS (
  SELECT CAST(sum(c_t) AS BIGINT) AS n_tok, count(*) AS v FROM lm
),
scored AS (
  SELECT doc_id, dl, tf,
         {sql_round("-ln((c_t + 0.5) / (n_tok + 0.5 * v))", 6)} AS nll
  FROM postings JOIN lm USING (term) CROSS JOIN totals
)
SELECT doc_id,
       CAST(max(dl) AS BIGINT) AS n_tokens,
       {sql_round(
           "CAST(sum(CAST(nll AS DECIMAL(18,6)) * tf) AS DOUBLE) / max(dl)",
           4,
       )} AS mean_nll
FROM scored GROUP BY doc_id
"""


def text_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence (nats) between each crawl source's
    unigram distribution and the whole corpus
    (operators/retrieval.source_unigram_kl) — the domain-drift audit a
    corpus team runs per source/snapshot. Truncated to each source's
    observed terms, add-0.5 smoothed on both sides; the corpus LM
    derives from the per-(source, term) counts, so the corpus is
    tokenized exactly once."""
    from ue_big_data_project_spark.operators.retrieval import (
        source_unigram_kl,
    )

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return source_unigram_kl(d, alpha=0.5, group_col="source")


TEXT_SOURCE_KL_SQL = f"""
WITH base AS (
  SELECT source AS grp, list_filter({_WORDS}, w -> w <> '') AS words
  FROM documents
),
gtoks AS (SELECT grp, unnest(words) AS term FROM base),
gcounts AS (
  SELECT grp, term, count(*) AS c_gt FROM gtoks GROUP BY grp, term
),
corpus AS (
  SELECT term, CAST(sum(c_gt) AS BIGINT) AS c_t FROM gcounts GROUP BY term
),
gtot AS (SELECT grp, CAST(sum(c_gt) AS BIGINT) AS n_g FROM gcounts GROUP BY grp),
totals AS (
  SELECT CAST(sum(c_t) AS BIGINT) AS n_tok, count(*) AS v FROM corpus
),
j AS (
  SELECT grp,
         {sql_round(
             "((c_gt + 0.5) / (n_g + 0.5 * v)) * "
             "ln(((c_gt + 0.5) / (n_g + 0.5 * v)) / "
             "((c_t + 0.5) / (n_tok + 0.5 * v)))", 9
         )} AS kl_term
  FROM gcounts JOIN corpus USING (term) JOIN gtot USING (grp)
  CROSS JOIN totals
)
SELECT grp AS source,
       {sql_round(
           "CAST(sum(CAST(kl_term AS DECIMAL(22,9))) AS DOUBLE)", 6
       )} AS kl_nats
FROM j GROUP BY grp
"""


def text_classify_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes source attribution
    (operators/classify.nb_train → nb_classify): train add-1-smoothed
    NB on the corpus's source labels, score every document, return the
    argmax label with its log-posterior and a correctness flag — the
    fastText-classifier role (source/domain/quality routing) in pure
    DataFrame algebra. Scoring avoids the V×L unseen-term expansion:
    the α-floor factors into a per-label constant times the doc's
    token count, so the join touches only label-OBSERVED (term, label)
    pairs plus L broadcast rows per doc. Logs round at 6 dp and
    combine through exact DECIMAL (the BM25 discipline), so the
    argmax — ties broken label-ascending — hashes cross-engine."""
    from ue_big_data_project_spark.operators.classify import (
        nb_self_classify,
    )

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return nb_self_classify(d)


def _nb_sql(
    train_where: str | None = None, score_where: str | None = None
) -> str:
    """Oracle twin of operators/classify.nb_train + nb_classify:
    identical token stream, formula text, 6-dp rounding, decimal
    combination, (score desc, label asc) argmax. ``train_where``
    restricts the corpus the model fits on; ``score_where`` the
    documents scored — the persisted-model increment shape (train on
    the frozen half, classify the increment)."""
    tw = f" WHERE {train_where}" if train_where else ""
    sw = f" WHERE {score_where}" if score_where else ""
    return f"""
WITH base_train AS (
  SELECT doc_id, source, list_filter({_WORDS}, w -> w <> '') AS words
  FROM documents{tw}
),
base_score AS (
  SELECT doc_id, source, list_filter({_WORDS}, w -> w <> '') AS words
  FROM documents{sw}
),
ttoks AS (
  SELECT doc_id, source AS label, unnest(words) AS term FROM base_train
),
postings AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(words) AS term FROM base_score)
  GROUP BY 1, 2
),
lab_counts AS (
  SELECT label, term, count(*) AS c_lt FROM ttoks GROUP BY 1, 2
),
lab_tot AS (
  SELECT label, CAST(sum(c_lt) AS BIGINT) AS n_l FROM lab_counts GROUP BY 1
),
vocab AS (SELECT count(DISTINCT term) AS v FROM lab_counts),
model AS (
  SELECT label, term,
         {sql_round("ln((c_lt + 1.0) / 1.0)", 6)} AS delta
  FROM lab_counts
),
doc_counts AS (
  SELECT source AS label, count(*) AS docs_l FROM base_train GROUP BY 1
),
total AS (SELECT count(*) AS docs_total FROM base_train),
labels AS (
  SELECT d.label,
         {sql_round("ln(CAST(docs_l AS DOUBLE) / docs_total)", 6)} AS prior,
         {sql_round(
             "ln(1.0 / (CAST(coalesce(n_l, 0) AS DOUBLE) + 1.0 * v))", 6
         )} AS unseen
  FROM doc_counts d
  CROSS JOIN total
  LEFT JOIN lab_tot lt ON d.label = lt.label
  CROSS JOIN vocab
),
partial AS (
  SELECT p.doc_id, m.label,
         sum(CAST(m.delta AS DECIMAL(18,6)) * p.tf) AS s_seen
  FROM postings p JOIN model m USING (term) GROUP BY 1, 2
),
per_doc AS (SELECT doc_id, source, len(words) AS dl FROM base_score),
scored AS (
  SELECT d.doc_id, l.label, d.source,
         {sql_round(
             "CAST(CAST(l.prior AS DECIMAL(18,6)) "
             "+ CAST(l.unseen AS DECIMAL(18,6)) * d.dl "
             "+ coalesce(s.s_seen, CAST(0 AS DECIMAL(18,6))) AS DOUBLE)",
             6,
         )} AS score
  FROM per_doc d
  CROSS JOIN labels l
  LEFT JOIN partial s ON s.doc_id = d.doc_id AND s.label = l.label
),
ranked AS (
  SELECT *, row_number() OVER (
           PARTITION BY doc_id ORDER BY score DESC, label ASC
         ) AS rk
  FROM scored
)
SELECT doc_id, label AS pred, score, (label = source) AS is_correct
FROM ranked WHERE rk = 1
"""


TEXT_CLASSIFY_NB_SQL = _nb_sql()

# Increment twin: model frozen on the even half, odd half classified
# against it — priors, floors and deltas all from the TRAIN corpus
# alone.
TEXT_CLASSIFY_NB_INC_SQL = _nb_sql("doc_id % 2 = 0", "doc_id % 2 = 1")


def text_classify_nb_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Classify a crawl increment against a FROZEN persisted NB model
    (operators/classify.write_nb_model → nb_classify_increment): the
    even half trains and persists as ONE artifact (term lifts + label
    constants in a single table, params as column metadata — no
    model/labels crash window), the odd half classifies in
    O(increment) — the model corpus is never re-scanned. Increment
    terms unseen at fit time contribute zero lift by construction (the
    α-floor rides the per-label constant), so the oracle is the NB
    replay with the model CTEs restricted to the train half and the
    scoring CTEs to the increment."""
    import shutil as _sh
    import tempfile as _tf

    from ue_big_data_project_spark.operators.classify import (
        nb_classify_increment,
        write_nb_model,
    )

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    root = _tf.mkdtemp(prefix="spark_graft_nb_")
    try:
        write_nb_model(d.filter(F.col("doc_id") % 2 == 0), root + "/model")
        out = nb_classify_increment(
            spark, root + "/model", d.filter(F.col("doc_id") % 2 == 1)
        )
        truth = d.select("doc_id", F.col("source").alias("_truth"))
        return (
            out.join(truth, "doc_id")
            .select(
                "doc_id",
                "pred",
                "score",
                (F.col("pred") == F.col("_truth")).alias("is_correct"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        _sh.rmtree(root, ignore_errors=True)


def text_nlp_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate kit: language-ID + token counting + document fingerprinting
    in ONE per-document pass.

    Merges ``text_langid``/``text_tokens``/``text_fingerprint`` into a
    single entry so all three function families keep a driver
    correctness row inside the driver's 50-row window (round-1 hashed
    exactly the first 50 registry entries). The standalone queries stay
    registered for the pytest oracle gate. One scan, zero shuffles —
    exactly how a 100 TB corpus-annotation pass would fuse them.
    """
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return d.select(
        "doc_id",
        TX.langid("text").alias("lang_pred"),
        TX.token_count("text").alias("n_tokens"),
        TX.bpe_token_count("text").alias("n_tokens_bpe"),
        TX.fingerprint("text").alias("fp_md5"),
        TX.rolling_fingerprint("text").alias("fp_roll"),
    )


def _nlp_kit_sql() -> str:
    langs = sorted(TX.LANG_STOPWORDS)
    hit_exprs = []
    for lang in langs:
        pat = "\\b(" + "|".join(TX.LANG_STOPWORDS[lang]) + ")\\b"
        hit_exprs.append(
            f"CAST(len(regexp_extract_all(norm, '{pat}')) AS INTEGER) AS {lang}_hits"
        )
    best = "greatest(" + ", ".join(f"{lang}_hits" for lang in langs) + ")"
    case = (
        "CASE "
        + " ".join(
            f"WHEN {best} > 0 AND {lang}_hits = {best} THEN '{lang}'"
            for lang in langs
        )
        + " ELSE 'und' END"
    )
    return f"""
WITH base AS (
  SELECT doc_id, {_NORM} AS norm, {_WORDS} AS words FROM documents
), h AS (
  SELECT doc_id, norm, words,
         list_transform(words, w -> md5(w)) AS hs,
         {", ".join(hit_exprs)}
  FROM base
)
SELECT doc_id,
  {case} AS lang_pred,
  CAST(len(words) AS INTEGER) AS n_tokens,
  CAST(len(regexp_extract_all(norm, '{_BPE_SQL_PAT}')) AS INTEGER) AS n_tokens_bpe,
  md5(norm) AS fp_md5,
  list_reduce(
    list_transform(range(1, len(hs) + 1), i -> i * ({_HEX8})),
    (a, b) -> a + b
  ) % {TX.ROLL_MOD} AS fp_roll
FROM h
"""


TEXT_NLP_KIT_SQL = _nlp_kit_sql()


def pipeline_prep_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus prep: quality filter → exact dedup → token
    accounting as ONE fused plan (pipelines.prep_documents)."""
    from ue_big_data_project_spark.pipelines import prep_documents

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return prep_documents(d, min_quality=0.75)


PIPELINE_PREP_SQL = f"""
WITH scored AS (
  SELECT doc_id, {_QUALITY} AS quality,
         CAST(len(words) AS INTEGER) AS n_tokens,
         CAST(len(regexp_extract_all(norm, '{_BPE_SQL_PAT}')) AS INTEGER) AS n_tokens_bpe,
         md5(norm) AS fingerprint
  FROM (
    SELECT doc_id, text, {_WORDS} AS words, {_NORM} AS norm,
           length(text) AS n
    FROM documents
  )
), kept AS (
  SELECT * FROM scored WHERE quality >= 0.75
), canonical AS (
  SELECT fingerprint, min(doc_id) AS keep_id FROM kept GROUP BY fingerprint
)
SELECT k.doc_id, k.quality, k.n_tokens, k.n_tokens_bpe, k.fingerprint
FROM kept k
JOIN canonical c ON k.fingerprint = c.fingerprint AND k.doc_id = c.keep_id
"""


def pipeline_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus accounting over the prepped corpus: the doc/token budget a
    training run starts from (pipelines.corpus_stats over prep_documents)."""
    from ue_big_data_project_spark.pipelines import corpus_stats, prep_documents

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return corpus_stats(prep_documents(d, min_quality=0.75))


PIPELINE_STATS_SQL = f"""
WITH prepped AS ({PIPELINE_PREP_SQL})
SELECT count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(n_tokens_bpe) AS BIGINT) AS total_tokens_bpe
FROM prepped
"""


def pipeline_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 50% downsample + train/val/test assignment by id
    hash (pipelines.split_assign / sample_deterministic): reproducible
    across runs/engines/cluster sizes, counted per (split, lang)."""
    from ue_big_data_project_spark.pipelines import (
        sample_deterministic,
        split_assign,
    )

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    out = split_assign(sample_deterministic(d, rate_pct=50))
    return out.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc_id"),
    )


def _hash_mod_sql(buckets: int) -> str:
    """DuckDB twin of pipelines.hash_bucket: first 12 md5 hex digits of
    the stringified id → bigint, mod ``buckets``."""
    return (
        "("
        + " + ".join(
            f"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {k + 1}, 1)) - 1)"
            f" * {16 ** (11 - k)}"
            for k in range(12)
        )
        + f") % {buckets}"
    )


def pipeline_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + shard manifest for training
    export (pipelines.training_shards): shard and within-shard order
    both hash the doc id (md5), so the layout is identical on any
    cluster size or engine; ``order_fp`` (position-weighted hash mod
    2^31−1, computed distributed — one window + one agg on the shard
    key) pins the exact document ORDER per shard, not just membership."""
    from ue_big_data_project_spark.pipelines import training_shards

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return training_shards(d, shards=8)


# h = the 48-bit md5 prefix as bigint (the pre-mod value hash_bucket
# reduces); the strpos hex decode is the engine-portable idiom used by
# every md5-derived integer in this file.
_HEX12 = (
    "("
    + " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {k + 1}, 1)) - 1)"
        f" * {16 ** (11 - k)}"
        for k in range(12)
    )
    + ")"
)
PIPELINE_TRAINING_SHARDS_SQL = f"""
WITH b AS (
  SELECT doc_id, n_chars,
         md5(CAST(doc_id AS VARCHAR)) AS key,
         {_HEX12} AS h,
         {_hash_mod_sql(8)} AS shard
  FROM documents
), p AS (
  SELECT shard, n_chars, h,
         row_number() OVER (PARTITION BY shard ORDER BY key, doc_id) AS pos
  FROM b
)
SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(CAST(sum(((pos % 2147483647) * (h % 2147483647)) % 2147483647)
                 AS DECIMAL(38,0)) % 2147483647 AS BIGINT) AS order_fp
FROM p GROUP BY shard
"""


_HASH100 = _hash_mod_sql(100)
PIPELINE_SPLIT_SQL = f"""
WITH b AS (
  SELECT doc_id, lang, {_HASH100} AS bucket FROM documents
), sampled AS (
  SELECT doc_id, lang,
         CASE WHEN bucket < 5 THEN 'val'
              WHEN bucket < 10 THEN 'test'
              ELSE 'train' END AS split
  FROM b WHERE bucket < 50
)
SELECT split, lang, count(*) AS n_docs, min(doc_id) AS min_doc_id
FROM sampled GROUP BY split, lang
"""


def pipeline_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (pipelines.weighted_sample, Efraimidis–Spirakis): top-10 documents
    by ``ln(u)/w`` key with weight = n_chars — longer documents are
    proportionally likelier, yet the draw is an auditable md5 function
    of the doc id. Global top-k plans as TakeOrderedAndProject."""
    from ue_big_data_project_spark.pipelines import weighted_sample

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    s = weighted_sample(d, k=10, weight_col="n_chars")
    w = Window.orderBy(F.col("wkey").desc(), F.col("doc_id").asc())
    return s.select("doc_id", "n_chars", "wkey").withColumn(
        "rank", F.row_number().over(w).cast("int")
    )


_MD5_48 = (
    "("
    + " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {k + 1}, 1)) - 1)"
        f" * {16 ** (11 - k)}"
        for k in range(12)
    )
    + ")"
)
PIPELINE_WEIGHTED_SAMPLE_SQL = f"""
WITH keyed AS (
  SELECT doc_id, n_chars,
         {sql_round(f"ln(({_MD5_48} + 1) / CAST(281474976710657 AS DOUBLE)) / n_chars", 9)}
           AS wkey
  FROM documents WHERE n_chars > 0
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
           ORDER BY wkey DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM keyed
)
SELECT doc_id, n_chars, wkey, rank FROM ranked WHERE rank <= 10
"""


def pipeline_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened language mixing at T = 2
    (pipelines.temperature_mix): keep rates DERIVED from corpus counts,
    ``rate = sqrt(n_lang / n_max)`` — the mBERT/XLM-R rebalance that
    upweights low-resource languages. sqrt/divide are IEEE-correctly-
    rounded, so the integer keep threshold is bit-identical cross-engine
    (a pow/exp·ln temperature would be libm-dependent). Per-doc fate =
    md5('mix:'‖doc_id) vs floor(rate·2³²)."""
    from ue_big_data_project_spark.pipelines import temperature_mix

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return temperature_mix(d, "lang")


PIPELINE_TEMPERATURE_MIX_SQL = f"""
WITH counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_total FROM documents
  GROUP BY lang
),
mx AS (SELECT max(n_total) AS mx FROM counts),
rated AS (
  SELECT lang, n_total,
    CAST(floor(sqrt(CAST(n_total AS DOUBLE) / mx) * 4294967296.0)
         AS BIGINT) AS thr,
    CAST(floor(sqrt(CAST(n_total AS DOUBLE) / mx) * 1000.0)
         AS INTEGER) AS target_permille
  FROM counts CROSS JOIN mx
),
scored AS (
  SELECT lang,
    {_hex8_sql("md5('mix:' || CAST(doc_id AS VARCHAR))")} AS k
  FROM documents
)
SELECT r.lang, r.n_total,
       CAST(sum(CASE WHEN s.k < r.thr THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       r.target_permille
FROM scored s JOIN rated r USING (lang)
GROUP BY r.lang, r.n_total, r.target_permille
"""


def pipeline_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic downsample (rebalance the training
    mix: keep 80% en, 50% zh/es, 25% de/fr), counted per language
    (pipelines.stratified_sample — pure codegen CASE, zero shuffle
    before the count)."""
    from ue_big_data_project_spark.pipelines import stratified_sample

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    out = stratified_sample(
        d,
        "lang",
        {"en": 80, "zh": 50, "es": 50, "de": 25, "fr": 25},
        default_pct=0,
    )
    return out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


PIPELINE_STRATIFIED_SQL = f"""
WITH b AS (
  SELECT doc_id, lang, {_HASH100} AS bucket FROM documents
), kept AS (
  SELECT doc_id, lang FROM b
  WHERE bucket < CASE lang
    WHEN 'en' THEN 80 WHEN 'zh' THEN 50 WHEN 'es' THEN 50
    WHEN 'de' THEN 25 WHEN 'fr' THEN 25 ELSE 0 END
)
SELECT lang, count(*) AS n_docs,
       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
FROM kept GROUP BY lang
"""


def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing (concat-and-chunk shard layout):
    documents hash into 8 packing streams, fill 512-token packs in id
    order (pipelines.pack_sequences — one shuffle on the stream key,
    window running-sum within streams)."""
    from ue_big_data_project_spark.functions.text import token_count
    from ue_big_data_project_spark.pipelines import pack_sequences

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    counted = d.select(
        "doc_id", token_count("text").alias("n_tokens")
    )
    return pack_sequences(
        counted, id_col="doc_id", token_col="n_tokens", budget=512, writers=8
    )


PIPELINE_PACK_SQL = f"""
WITH t AS (
  SELECT doc_id, CAST(len({_WORDS}) AS INTEGER) AS n_tokens,
         {_hash_mod_sql(8)} AS stream
  FROM documents
), r AS (
  SELECT doc_id, n_tokens, stream,
         CAST(sum(n_tokens) OVER (
           PARTITION BY stream ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS run
  FROM t
)
SELECT doc_id, n_tokens, stream,
       (run - n_tokens) // 512 AS pack_id,
       n_tokens > 0 AND (run - 1) // 512 > (run - n_tokens) // 512
         AS straddles,
       n_tokens > 512 AS oversize
FROM r
"""


def pipeline_pack_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing budgeted in SUBWORD tokens — the composition
    that makes the BPE accounting load-bearing: per-document counts
    from ``operators/bpe.bpe_token_counts`` (one zero-shuffle Arrow
    pass against the frozen merge table) feed
    ``pipelines.pack_sequences``' 512-token concat-and-chunk layout
    (one stream-key shuffle + in-stream running window). Word-budgeted
    packing mis-fills a context window by the corpus's subword
    fan-out; this entry pins the ACTUAL layout a trainer would read,
    end-to-end and cross-engine (the oracle replays encode + packing
    in one SQL chain)."""
    from ue_big_data_project_spark.operators import bpe as BPE
    from ue_big_data_project_spark.pipelines import pack_sequences

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    counted = BPE.bpe_token_counts(
        d, list(BPE_MERGES), end_marker=BPE.BPE_END_MARKER
    ).select(
        "doc_id", F.col("n_bpe_tokens").alias("n_tokens")
    )
    return pack_sequences(
        counted, id_col="doc_id", token_col="n_tokens", budget=512, writers=8
    )


PIPELINE_PACK_BPE_SQL = f"""
WITH toks AS (SELECT doc_id, list_filter({_WORDS}, w -> w <> '') AS words
              FROM documents),
w AS (SELECT doc_id, unnest(words) AS word FROM toks),
enc AS (
  SELECT doc_id, {_BPE_WRAPPED} AS s
  FROM w
), cnt AS (
  SELECT doc_id,
         CAST(sum(length(s) - length(replace(s, '(', ''))) AS BIGINT)
           AS n_tokens
  FROM enc GROUP BY doc_id
), t AS (
  SELECT doc_id, n_tokens, {_hash_mod_sql(8)} AS stream FROM cnt
), r AS (
  SELECT doc_id, n_tokens, stream,
         CAST(sum(n_tokens) OVER (
           PARTITION BY stream ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS run
  FROM t
)
SELECT doc_id, n_tokens, stream,
       (run - n_tokens) // 512 AS pack_id,
       n_tokens > 0 AND (run - 1) // 512 > (run - n_tokens) // 512
         AS straddles,
       n_tokens > 512 AS oversize
FROM r
"""


def pipeline_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping passage chunking (64-token chunks, 8-token overlap,
    stride 56): the pretokenization step between documents and packing
    (pipelines.chunk_documents — native sequence/slice/posexplode, one
    scan, zero shuffle). Chunk text leaves as md5 so the driver hash
    pins content without shipping passages."""
    from ue_big_data_project_spark.pipelines import chunk_documents

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return chunk_documents(
        d, chunk_tokens=64, overlap=8
    ).select(
        "doc_id",
        "chunk_idx",
        F.md5("chunk_text").alias("chunk_md5"),
        "n_tokens",
    )


PIPELINE_CHUNK_SQL = f"""
WITH t AS (
  SELECT doc_id, {_WORDS} AS toks FROM documents
), c AS (
  SELECT doc_id, toks,
         CASE WHEN len(toks) <= 64 THEN 1
              ELSE CAST(ceil((len(toks) - 64) / 56.0) AS INTEGER) + 1
         END AS n_chunks
  FROM t
), x AS (
  SELECT doc_id, toks,
         CAST(unnest(range(0, n_chunks)) AS INTEGER) AS chunk_idx
  FROM c
)
SELECT doc_id, chunk_idx,
       md5(array_to_string(toks[chunk_idx * 56 + 1 : chunk_idx * 56 + 64], ' '))
         AS chunk_md5,
       CAST(len(toks[chunk_idx * 56 + 1 : chunk_idx * 56 + 64]) AS INTEGER)
         AS n_tokens
FROM x
"""


def pipeline_scrub_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate removal (the C4/RefinedWeb
    drop-repeated-lines stage, pipelines.scrub_boilerplate_lines):
    3-word token lines whose document frequency exceeds 1 are dropped
    corpus-wide; per doc, how many lines existed, how many survived,
    and the length of the order-preserving reassembly."""
    from ue_big_data_project_spark.pipelines import scrub_boilerplate_lines

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return scrub_boilerplate_lines(d, line_words=3, max_doc_freq=1)


PIPELINE_SCRUB_BOILERPLATE_SQL = f"""
WITH t AS (
  SELECT doc_id, {_WORDS} AS toks FROM documents WHERE len({_WORDS}) > 0
), x AS (
  SELECT doc_id, toks,
         CAST(unnest(range(0, CAST(ceil(len(toks) / 3.0) AS INTEGER)))
              AS INTEGER) AS pos
  FROM t
), l AS (
  SELECT doc_id, pos,
         array_to_string(toks[pos * 3 + 1 : pos * 3 + 3], ' ') AS line
  FROM x
), freq AS (
  SELECT line, count(DISTINCT doc_id) AS df FROM l GROUP BY line
), k AS (
  SELECT l.doc_id, l.pos, l.line, (f.df <= 1) AS keep
  FROM l JOIN freq f USING (line)
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS INTEGER) AS n_kept,
       CAST(coalesce(
         length(string_agg(CASE WHEN keep THEN line END, ' ' ORDER BY pos)),
         0) AS INTEGER) AS clean_len
FROM k GROUP BY doc_id
"""


def pipeline_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-level constraint verification (observability.
    check_constraints — the Deequ VerificationSuite role): one
    aggregate pass over the documents table renders the suite verdict
    a pipeline gates a source drop on — row count, id distinctness,
    text completeness, language/source domain checks, n_chars
    range + decimal-exact mean — each as (constraint, observed,
    passed). The lang in-set bound is deliberately set above the
    fixture's share so the suite exercises a FAILED row (a verifier
    whose fixtures always pass can't prove it fails). One scan, one
    scalar row, a literal unpivot — verification costs what one
    aggregation of the ingest already costs."""
    from ue_big_data_project_spark.observability import check_constraints

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return check_constraints(d, _documents_suite())


def streaming_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous data-quality monitoring end-to-end
    (streaming.constraints_ingest_stream): the documents corpus
    replays as 3 REAL micro-batches, each batch's suite verdict
    landing crash-safe under its own ``batch_id=N`` partition of the
    verdict ledger table — the quality timeline a 100 TB ingest alerts
    on (a drop that fails ``in_set(lang)`` shows up in ITS batch's
    rows). Per-batch cost is one aggregation of the batch; earlier
    batches are never re-scanned. Batch order is enforced by staged
    mtimes, so the oracle is the batch suite SQL evaluated per batch
    membership, batch ids in replay order."""
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from ue_big_data_project_spark import streaming as ST
    from ue_big_data_project_spark.session import apply_session_conf

    apply_session_conf(spark)
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    root = _tf.mkdtemp(prefix="spark_graft_expstream_")
    try:
        # One staging job for all 3 batch files (round-12, guide §2.4);
        # the staged mtimes still govern the FileStreamSource order —
        # here the order is SEMANTIC (batch_id i must verify membership
        # class i).
        stage = stage_batches(
            d.select("doc_id", "text", "lang", "source", "n_chars"),
            F.col("doc_id") % 3,
            root,
        )
        sdf = spark.readStream.schema(
            "doc_id long, text string, lang string, source string, "
            "n_chars long"
        ).option("maxFilesPerTrigger", 1).parquet(stage)
        key = "spark.sql.shuffle.partitions"
        prev = spark.conf.get(key)
        spark.conf.set(key, "8")
        try:
            q = ST.constraints_ingest_stream(
                sdf,
                verdict_path=_os.path.join(root, "verdicts"),
                constraints=_documents_suite(),
                ledger_dir=_os.path.join(root, "_ledger"),
            )
            ST.run_until_drained(q)
        finally:
            spark.conf.set(key, prev)
        return (
            spark.read.parquet(_os.path.join(root, "verdicts"))
            .select(
                F.col("batch_id").cast("int").alias("batch_id"),
                "constraint",
                "observed",
                "passed",
            )
            .localCheckpoint(eager=True)
        )
    finally:
        _sh.rmtree(root, ignore_errors=True)


def _documents_suite():
    """The shared 8-constraint documents suite (batch entry + the
    streaming drain's per-batch evaluation)."""
    from ue_big_data_project_spark.observability import (
        c_completeness,
        c_distinct_ratio,
        c_in_set,
        c_matches,
        c_max,
        c_mean,
        c_min,
        c_row_count,
    )

    return [
        c_row_count(lo=1.0),
        c_distinct_ratio("doc_id", lo=1.0),
        c_completeness("text", lo=1.0),
        c_in_set("lang", ["en", "fr", "es", "de"], lo=0.95),
        c_matches("source", "^src[0-9]+$", lo=1.0),
        c_min("n_chars", lo=1.0),
        c_max("n_chars", hi=500.0),
        c_mean("n_chars", lo=100.0, hi=400.0),
    ]


def _expectations_sql(
    where: str | None = None, batch_id: int | None = None
) -> str:
    """Oracle twin of the shared documents suite; ``where`` scopes the
    verified corpus (the streaming drain's per-batch shape),
    ``batch_id`` prepends the batch's literal id column."""
    cond = f" WHERE {where}" if where else ""
    bsel = (
        f"CAST({batch_id} AS INTEGER) AS batch_id, " if batch_id is not None
        else ""
    )
    return f"""
WITH agg AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_rows,
         CAST(count(DISTINCT doc_id) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS dr,
         CAST(count(*) FILTER (text IS NOT NULL) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS comp,
         CAST(count(*) FILTER (lang IN ('en','fr','es','de')) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS inset,
         CAST(count(*) FILTER (regexp_matches(source, '^src[0-9]+$'))
              AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mt,
         CAST(min(n_chars) AS DOUBLE) AS mn,
         CAST(max(n_chars) AS DOUBLE) AS mx,
         {sql_round(
             "CAST(sum(CAST(n_chars AS DECIMAL(27,6))) AS DOUBLE)"
             " / CAST(count(*) AS DOUBLE)", 6
         )} AS mean_nc
  FROM documents{cond}
)
SELECT {bsel}'row_count' AS "constraint", n_rows AS observed,
       n_rows >= 1.0 AS passed FROM agg
UNION ALL SELECT {bsel}'distinct_ratio(doc_id)', dr, dr >= 1.0 FROM agg
UNION ALL SELECT {bsel}'completeness(text)', comp, comp >= 1.0 FROM agg
UNION ALL SELECT {bsel}'in_set(lang)', inset, inset >= 0.95 FROM agg
UNION ALL SELECT {bsel}'matches(source)', mt, mt >= 1.0 FROM agg
UNION ALL SELECT {bsel}'min(n_chars)', mn, mn >= 1.0 FROM agg
UNION ALL SELECT {bsel}'max(n_chars)', mx, mx <= 500.0 FROM agg
UNION ALL SELECT {bsel}'mean(n_chars)', mean_nc,
                 mean_nc >= 100.0 AND mean_nc <= 400.0 FROM agg
"""


PIPELINE_EXPECTATIONS_SQL = _expectations_sql()

# Per-batch verdicts for the streamed suite: the same SQL evaluated
# over each batch's membership, batch ids in staged-mtime order.
STREAMING_EXPECTATIONS_SQL = "\nUNION ALL\n".join(
    f"SELECT * FROM ({_expectations_sql(f'doc_id % 3 = {i}', batch_id=i)})"
    for i in range(3)
)


def pipeline_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass table profile of the documents table (per-column row/
    null/exact-distinct counts + numeric min/max —
    observability.profile_columns): the pre-ingest audit step, computed
    as ONE scan with partial aggregation, then unpivoted."""
    from ue_big_data_project_spark.observability import profile_columns

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return profile_columns(d, ["doc_id", "lang", "n_chars", "text"])


PIPELINE_PROFILE_SQL = """
SELECT 'doc_id' AS column, count(*) AS n_rows,
       count(*) FILTER (doc_id IS NULL) AS n_null,
       count(DISTINCT doc_id) AS n_distinct,
       CAST(min(doc_id) AS DOUBLE) AS min_num,
       CAST(max(doc_id) AS DOUBLE) AS max_num
FROM documents
UNION ALL
SELECT 'lang', count(*), count(*) FILTER (lang IS NULL),
       count(DISTINCT lang), NULL, NULL
FROM documents
UNION ALL
SELECT 'n_chars', count(*), count(*) FILTER (n_chars IS NULL),
       count(DISTINCT n_chars),
       CAST(min(n_chars) AS DOUBLE), CAST(max(n_chars) AS DOUBLE)
FROM documents
UNION ALL
SELECT 'text', count(*), count(*) FILTER (text IS NULL),
       count(DISTINCT text), NULL, NULL
FROM documents
"""


def pipeline_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination screen: for each test-split document
    (the id-hash split of pipeline_split), the fraction of its distinct
    3-gram shingles found anywhere in the train split
    (pipelines.contamination_report — inverted-index join keyed on the
    shingle, no doc×doc comparison)."""
    from ue_big_data_project_spark.pipelines import (
        contamination_report,
        hash_bucket,
    )

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    b = hash_bucket("doc_id", 100)
    train = d.filter(b >= 10)
    test = d.filter((b >= 5) & (b < 10))
    return contamination_report(
        train, test, "doc_id", "text", shingle_n=3, threshold=0.5
    )


PIPELINE_CONTAMINATION_SQL = f"""
WITH {_SHINGLES_CTE},
buckets AS (
  SELECT doc_id, {_HASH100} AS bucket FROM documents
),
train_sh AS (
  SELECT DISTINCT shingle FROM sh
  JOIN buckets USING (doc_id) WHERE bucket >= 10
),
test_sh AS (
  SELECT DISTINCT doc_id, shingle FROM sh
  JOIN buckets USING (doc_id) WHERE bucket >= 5 AND bucket < 10
),
hits AS (
  SELECT t.doc_id, count(*) AS n_shingles,
         CAST(sum(CASE WHEN tr.shingle IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hit
  FROM test_sh t LEFT JOIN train_sh tr ON t.shingle = tr.shingle
  GROUP BY t.doc_id
)
SELECT doc_id, n_shingles, n_hit,
       {sql_round("n_hit * 1.0 / n_shingles", 4)} AS overlap,
       n_hit * 1.0 / n_shingles >= 0.5 AS contaminated
FROM hits
"""


def pipeline_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document caps (the crawl-balancing step that stops one
    domain from dominating the mix): keep at most 10 documents per
    source, chosen by a DETERMINISTIC pseudo-random rank (md5 of the id,
    ties on id) so the kept set is stable across runs and engines.

    One shuffle on the source key; the window sorts within source
    partitions only. Skew lever at 100 TB: sources big enough to
    overflow a partition get pre-pruned by a salted partial top-k
    (operators/topk.py) before the exact window.
    """
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    kept = d.withColumn("_rk", F.row_number().over(w)).filter(
        F.col("_rk") <= 10
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


PIPELINE_SOURCE_QUOTA_SQL = """
WITH ranked AS (
  SELECT source, doc_id,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rk
  FROM documents
)
SELECT source, count(*) AS n_kept,
       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
FROM ranked WHERE rk <= 10 GROUP BY source
"""


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition metrics (the Gopher-rule family that
    drops boilerplate/spam): distinct-word ratio and the fraction of
    the document taken by its single most frequent word.

    Zero shuffle: both metrics are per-row array expressions. The top
    word's count is the longest equal-run in the SORTED token array,
    computed by one native ``aggregate`` fold (run, best, prev) — no
    explode, no per-(doc, word) shuffle, so at 100 TB the whole query
    is an embarrassingly parallel scan. (An earlier form exploded words
    through two shuffles; the fold is both faster and scale-flat.)
    """
    from ue_big_data_project_spark.functions.text import tokens

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    words = tokens("text")

    def _merge(acc: Column, x: Column) -> Column:
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(
            F.lit(1)
        )
        return F.struct(
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
            x.alias("prev"),
        )

    top_count = F.aggregate(
        F.array_sort(words),
        F.struct(
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
            F.lit(None).cast("string").alias("prev"),
        ),
        _merge,
        lambda acc: acc["best"],
    )
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        pround(
            F.size(F.array_distinct(words)) / F.size(words), 4
        ).alias("distinct_ratio"),
        pround(top_count / F.size(words), 4).alias("top_word_frac"),
    ).where(F.size(words) > 0)


TEXT_REPETITION_SQL = f"""
WITH base AS (
  SELECT doc_id, {_WORDS} AS words FROM documents
), stats AS (
  SELECT doc_id,
         CAST(len(words) AS INTEGER) AS n_words,
         {sql_round("len(list_distinct(words)) * 1.0 / len(words)", 4)}
           AS distinct_ratio,
         unnest(words) AS w
  FROM base
), per_word AS (
  SELECT doc_id, n_words, distinct_ratio, w, count(*) AS c
  FROM stats GROUP BY doc_id, n_words, distinct_ratio, w
)
SELECT doc_id, n_words, distinct_ratio,
       {sql_round("max(c) * 1.0 / any_value(n_words)", 4)} AS top_word_frac
FROM per_word GROUP BY doc_id, n_words, distinct_ratio
"""


_BM25_QUERIES = (
    (0, "spark join window"),
    (1, "customer order data"),
    (2, "hash merge sort batch"),
    (3, "vector stream group"),
)


def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-5 retrieval over the documents corpus for four fixed
    query strings (operators/retrieval.bm25_topk).

    The inverted index is built in one (doc_id, term) shuffle; query
    terms broadcast onto the postings, so candidate generation never
    shuffles the index. Per-term partials round at 6 dp and sum through
    DECIMAL so the score is partition-order-independent (hash-stable
    against the DuckDB oracle).
    """
    from ue_big_data_project_spark.operators.retrieval import bm25_topk

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    q = local_relation(spark, 
        list(_BM25_QUERIES), "query_id int, query_text string"
    )
    return bm25_topk(d, q, k=5)


def _bm25_sql(
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 5,
    queries: tuple[tuple[int, str], ...] = _BM25_QUERIES,
    where: str | None = None,
    max_df_expr: str | None = None,
) -> str:
    """Oracle twin of operators/retrieval.bm25_topk: identical token
    stream, query normalization, idf form, FP op order, 6-dp per-term
    rounding, decimal sum. ``where`` restricts the CORPUS (the ``base``
    CTE — every downstream stat, df and posting derives from it), the
    retention oracle's shape: scoring a pruned index must equal scoring
    the kept corpus from scratch. ``max_df_expr`` is a SQL expression
    (may reference ``n_docs``) replaying the stop-term cap: candidate
    rows of terms past it never score."""
    values = ", ".join(f"({i}, '{t}')" for i, t in queries)
    corpus_cond = f" WHERE {where}" if where else ""
    cap_cond = f"\n  WHERE df_t <= {max_df_expr}" if max_df_expr else ""
    avgdl = "(total_len::DOUBLE / n_docs)"
    idf = "ln(1.0 + ((n_docs - df_t) + 0.5) / (df_t + 0.5))"
    partial = sql_round(
        f"{idf} * (tf * {k1 + 1.0!r}) / "
        f"(tf + {k1!r} * ({1.0 - b!r} + ({b!r} * dl) / {avgdl}))",
        6,
    )
    return f"""
WITH base AS (
  SELECT doc_id, list_filter({_WORDS}, w -> w <> '') AS words
  FROM documents{corpus_cond}
),
toks AS (
  SELECT doc_id, len(words) AS dl, unnest(words) AS term FROM base
),
postings AS (
  SELECT doc_id, term, count(*) AS tf, max(dl) AS dl
  FROM toks GROUP BY doc_id, term
),
doclen AS (
  SELECT doc_id, len(words) AS dl FROM base WHERE len(words) > 0
),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS total_len FROM doclen),
termdf AS (SELECT term, count(*) AS df_t FROM postings GROUP BY term),
q(query_id, query_text) AS (VALUES {values}),
qterms AS (
  -- Mirrors the Spark path (operators/retrieval._query_terms →
  -- functions/text.normalize_text): lowercase, collapse whitespace,
  -- trim, split, distinct, drop empties — so a future query string
  -- with uppercase or doubled spaces cannot silently diverge.
  SELECT query_id,
         unnest(list_filter(
           list_distinct(string_split(
             trim(regexp_replace(lower(query_text), '\\s+', ' ', 'g')), ' ')),
           w -> w <> '')) AS term
  FROM q
),
cand AS (
  SELECT qt.query_id, p.doc_id, {partial} AS s
  FROM postings p
  JOIN qterms qt USING (term)
  JOIN termdf USING (term)
  CROSS JOIN stats{cap_cond}
),
scores AS (
  SELECT query_id, doc_id,
         CAST(sum(CAST(s AS DECIMAL(18,6))) AS DOUBLE) AS bm25
  FROM cand GROUP BY query_id, doc_id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY bm25 DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scores
)
SELECT query_id, doc_id, bm25, rank FROM ranked WHERE rank <= {k}
"""


TEXT_BM25_SQL = _bm25_sql()


def text_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval, the standard RAG shape: BM25 generates a
    lexical candidate pool (top-50 per query), the pool is re-ranked by
    embedding cosine against the query's vector (here: the embedding of
    the query's seed document, ids aligned across the testdata tables),
    and the final score is max-normalized BM25 + cosine.

    Scale shape: the expensive lexical stage is the already-audited
    bm25_topk; the rerank then touches only |queries| × 50 rows — the
    embedding join is a candidate-side lookup, never a corpus scan.
    """
    from ue_big_data_project_spark.functions.vectors import cosine
    from ue_big_data_project_spark.operators.retrieval import bm25_topk

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    q = local_relation(spark, 
        list(_BM25_QUERIES), "query_id int, query_text string"
    )
    cand = bm25_topk(d, q, k=50)
    qvec = e.filter(F.col("vec_id") < len(_BM25_QUERIES)).select(
        F.col("vec_id").cast("int").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    dvec = e.select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("doc_vec")
    )
    j = (
        cand.join(F.broadcast(qvec), "query_id")
        .join(dvec, "doc_id")
        .withColumn(
            "cos_sim", pround(cosine(F.col("doc_vec"), F.col("query_vec")), 6)
        )
    )
    wmax = Window.partitionBy("query_id")
    scored = j.withColumn(
        "hybrid_score",
        pround(
            F.col("bm25") / F.max("bm25").over(wmax) + F.col("cos_sim"), 6
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("hybrid_score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "doc_id", "hybrid_score", "rank")
    )


def _hybrid_sql() -> str:
    """Oracle twin of text_hybrid_search: the k=50 BM25 oracle nested as
    a derived table, the same fold-left cosine, identical FP op order."""
    cos = _cos_sql("dv.doc_vec", "qv.query_vec")
    return f"""
WITH bm AS (SELECT * FROM ({_bm25_sql(k=50)}) b),
qv AS (
  SELECT vec_id::INTEGER AS query_id, embedding AS query_vec
  FROM embeddings WHERE vec_id < {len(_BM25_QUERIES)}
),
dv AS (SELECT vec_id AS doc_id, embedding AS doc_vec FROM embeddings),
j AS (
  SELECT bm.query_id, bm.doc_id, bm.bm25, {cos} AS cos_sim
  FROM bm
  JOIN qv ON bm.query_id = qv.query_id
  JOIN dv ON bm.doc_id = dv.doc_id
),
h AS (
  SELECT query_id, doc_id,
         {sql_round("bm25 / max(bm25) OVER (PARTITION BY query_id) + cos_sim", 6)}
           AS hybrid_score
  FROM j
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY hybrid_score DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM h
)
SELECT query_id, doc_id, hybrid_score, rank FROM ranked WHERE rank <= 5
"""


TEXT_HYBRID_SQL = _hybrid_sql()


def text_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-5 against a PERSISTED term-sharded inverted index
    (operators/retrieval.build_text_index → bm25_topk_indexed): the
    probe reads only the term-bucket partitions the query terms hash to
    (partition pruning asserted in tests/test_retrieval.py). Same
    parameters and oracle as text_bm25_search: persisting the index
    must not change the answer."""
    import shutil as _sh
    import tempfile as _tf

    from ue_big_data_project_spark.operators.retrieval import (
        bm25_topk_indexed,
        build_text_index,
    )

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    q = local_relation(spark, 
        list(_BM25_QUERIES), "query_id int, query_text string"
    )
    root = _tf.mkdtemp(prefix="spark_graft_bm25_")
    idx = root + "/text_index"
    # Materialize the (small) result before deleting the scratch index;
    # the finally keeps failed runs from accumulating copies in /tmp.
    try:
        build_text_index(d, idx, n_buckets=16)
        return bm25_topk_indexed(spark, idx, q, k=5).localCheckpoint(
            eager=True
        )
    finally:
        _sh.rmtree(root, ignore_errors=True)


def text_bm25_appended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-5 against an index built on HALF the corpus and then
    incrementally APPENDED with the other half
    (operators/retrieval.append_text_index — postings land in their
    term-bucket dirs, the _termdf vocabulary and 1-row _stats merge
    additively; the existing corpus is never re-tokenized). Same
    parameters and oracle as text_bm25_search over the FULL corpus:
    hash-equality here proves the append path is exactly equivalent to
    a fresh full build — the knn_cosine_ivf_appended pattern for the
    text index."""
    import shutil as _sh
    import tempfile as _tf

    from ue_big_data_project_spark.operators.retrieval import (
        append_text_index,
        bm25_topk_indexed,
        build_text_index,
    )

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    q = local_relation(spark, 
        list(_BM25_QUERIES), "query_id int, query_text string"
    )
    root = _tf.mkdtemp(prefix="spark_graft_bm25_app_")
    idx = root + "/text_index"
    try:
        build_text_index(d.filter(F.col("doc_id") % 2 == 0), idx, n_buckets=16)
        append_text_index(spark, d.filter(F.col("doc_id") % 2 == 1), idx)
        return bm25_topk_indexed(spark, idx, q, k=5).localCheckpoint(
            eager=True
        )
    finally:
        _sh.rmtree(root, ignore_errors=True)


def text_bm25_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETENTION for the persisted BM25 index — the text-retrieval
    family's prune path: the session-scoped full-corpus index is
    cloned, operators/retrieval.rewrite_text_index drops every 3rd
    document (takedowns) and recomputes BOTH sidecars exactly from the
    surviving postings, and the standard query batch probes the
    SURVIVORS. Nothing in this index is frozen, so the oracle is the
    BM25 SQL replay over the kept corpus alone — N, avgdl and every
    df_t genuinely stop counting removed documents (a tombstone overlay
    would get the stats wrong; hash-equality here proves the rewrite
    doesn't)."""
    import shutil as _sh
    import tempfile as _tf

    from ue_big_data_project_spark.operators.retrieval import (
        bm25_topk_indexed,
        build_text_index,
        rewrite_text_index,
    )

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    base = _session_index(
        "bm25", sf_dir, lambda p: build_text_index(d, p, n_buckets=16)
    )
    root = _tf.mkdtemp(prefix="spark_graft_bm25_prune_")
    idx = root + "/text_index"
    try:
        # The rewrite mutates all three layouts in place, so each run
        # clones the session base (filesystem copy, no Spark job).
        for suf in ("", "_termdf", "_stats"):
            _sh.copytree(base + suf, idx + suf)
        rewrite_text_index(
            spark, idx, d.filter(F.col("doc_id") % 3 != 0).select("doc_id")
        )
        q = local_relation(spark, 
            list(_BM25_QUERIES), "query_id int, query_text string"
        )
        return bm25_topk_indexed(spark, idx, q, k=5).localCheckpoint(
            eager=True
        )
    finally:
        _sh.rmtree(root, ignore_errors=True)


TEXT_BM25_PRUNED_SQL = _bm25_sql(where="doc_id % 3 <> 0")

# Stop-term-capped twin: terms in more than 78% of documents leave the
# scoring (exact integer arithmetic so the threshold is identical in
# both engines at any corpus size).
TEXT_BM25_CAPPED_SQL = _bm25_sql(max_df_expr="(78 * n_docs) // 100")


def text_bm25_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 probe under the STOP-TERM CAP (max_term_df — the lexical
    edition of winnow max_df / fp max_band_freq): terms in more than
    78% of documents leave the scoring entirely, and — against the
    persisted index, where the ``_termdf`` sidecar knows every df
    before any posting row is read — their df-sized posting fan-out
    leaves the probe's SCAN too. On this synthetic corpus the query
    vocabulary's df spread straddles the threshold (df 382–402 of
    500), so the cap genuinely drops some query terms and keeps
    others — the capped ranking differs from the uncapped one, which
    is what makes this entry non-vacuous. Semantics: a capped term
    scores as if absent from every query; surviving terms' tf/df are
    untouched."""
    from ue_big_data_project_spark.operators.retrieval import (
        bm25_topk_indexed,
        build_text_index,
    )

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    idx = _session_index(
        "bm25", sf_dir, lambda p: build_text_index(d, p, n_buckets=16)
    )
    from ue_big_data_project_spark.operators.retrieval import (
        BM25_STATS_SCHEMA,
    )

    n_docs = int(
        spark.read.schema(BM25_STATS_SCHEMA)
        .parquet(idx + "_stats")
        .first()["n_docs"]
    )
    q = local_relation(spark, 
        list(_BM25_QUERIES), "query_id int, query_text string"
    )
    return bm25_topk_indexed(
        spark, idx, q, k=5, max_term_df=(78 * n_docs) // 100
    )


def streaming_bm25_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous BM25-index maintenance end-to-end — the streaming
    drain for the text-retrieval persisted family: the corpus replays
    as 3 REAL micro-batches through ``streaming.bm25_ingest_stream``
    (each batch tokenizes ONLY itself and lands its term-bucket posting
    rows plus df/stats DELTA rows in its own crash-safe ``batch_id=N``
    partitions), then the standard query batch probes the STREAMED
    index. The probe aggregates the sidecars on read, so batching must
    be invisible: the oracle is ``text_bm25_search``'s full-corpus SQL
    VERBATIM — the streamed index has to answer byte-for-byte like the
    one-shot ``build_text_index`` build."""
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from ue_big_data_project_spark import streaming as ST
    from ue_big_data_project_spark.operators.retrieval import (
        bm25_topk_indexed,
    )
    from ue_big_data_project_spark.session import apply_session_conf

    apply_session_conf(spark)
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    root = _tf.mkdtemp(prefix="spark_graft_bm25stream_")
    try:
        # One staging job for all 3 batch files (round-12, guide §2.4).
        stage = stage_batches(
            d.select("doc_id", "text"), F.col("doc_id") % 3, root
        )
        sdf = spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", 1
        ).parquet(stage)
        # Right-size per-batch shuffles for the bounded replay (the
        # cluster-stream precedent).
        key = "spark.sql.shuffle.partitions"
        prev = spark.conf.get(key)
        spark.conf.set(key, "8")
        try:
            q = ST.bm25_ingest_stream(
                sdf,
                index_path=_os.path.join(root, "bm25idx"),
                ledger_dir=_os.path.join(root, "_ledger"),
                n_buckets=16,
            )
            ST.run_until_drained(q)
        finally:
            spark.conf.set(key, prev)
        queries = local_relation(spark, 
            list(_BM25_QUERIES), "query_id int, query_text string"
        )
        return bm25_topk_indexed(
            spark, _os.path.join(root, "bm25idx"), queries, k=5
        ).localCheckpoint(eager=True)
    finally:
        _sh.rmtree(root, ignore_errors=True)


def pipeline_upsert_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus maintenance (operators/cdc.upsert_latest):
    apply an update batch (re-crawled text for every 7th document) and a
    tombstone batch (takedowns for every 13th) onto the corpus snapshot,
    keeping the latest version per doc — one grouped max_by pass, no
    window sort."""
    from ue_big_data_project_spark.operators.cdc import upsert_latest

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    snap = d.select("doc_id", "text", F.lit(0).alias("version"))
    updates = (
        d.filter(F.col("doc_id") % 7 == 0)
        .select(
            "doc_id",
            F.upper(F.col("text")).alias("text"),
            F.lit(1).alias("version"),
        )
        .withColumn("_deleted", F.lit(False))
    )
    deletes = (
        d.filter(F.col("doc_id") % 13 == 0)
        .select("doc_id", "text", F.lit(2).alias("version"))
        .withColumn("_deleted", F.lit(True))
    )
    nxt = upsert_latest(
        snap,
        updates.unionByName(deletes),
        keys=["doc_id"],
        version_col="version",
        tombstone_col="_deleted",
    )
    return nxt.select(
        "doc_id", "version", F.length("text").alias("n_chars")
    )


PIPELINE_UPSERT_SQL = """
WITH snap AS (
  SELECT doc_id, text, 0 AS version, FALSE AS del FROM documents
), upd AS (
  SELECT doc_id, upper(text) AS text, 1 AS version, FALSE AS del
  FROM documents WHERE doc_id % 7 = 0
), dele AS (
  SELECT doc_id, text, 2 AS version, TRUE AS del
  FROM documents WHERE doc_id % 13 = 0
), u AS (
  SELECT * FROM snap UNION ALL SELECT * FROM upd UNION ALL SELECT * FROM dele
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY version DESC
  ) AS rn FROM u
)
SELECT doc_id, version, CAST(length(text) AS INTEGER) AS n_chars
FROM r WHERE rn = 1 AND NOT del
"""


def pipeline_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.,
    NeurIPS 2023) — over the crawl corpus: sources src1–src3 play the
    small clean TARGET domain, every document scores a hashed
    unigram+bigram importance weight ``ln p_target − ln p_raw``
    (``pipelines.dsir_logweights``), and the selection is the
    Gumbel-top-20 resample (``pipelines.dsir_sample``) — sampling
    without replacement from the softmax of the weights, made
    deterministic by md5-seeded Gumbel noise so the draw itself is
    oracle-checkable. Plan: one ≤1024-row bucket count (map-side
    partial agg), broadcast log-ratio join, one per-doc sum,
    TakeOrderedAndProject top-k."""
    from ue_big_data_project_spark.pipelines import dsir_sample

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    s = dsir_sample(
        d, F.col("source").isin("src1", "src2", "src3"), k=20
    )
    w = Window.orderBy(F.col("gkey").desc(), F.col("doc_id").asc())
    return s.withColumn("rank", F.row_number().over(w).cast("int"))


_DSIR_B = 1024
_DSIR_LR = sql_round(
    f"ln((c_t + 1.0) / (n_t + {float(_DSIR_B)}))"
    f" - ln((c_r + 1.0) / (n_r + {float(_DSIR_B)}))",
    9,
)
_DSIR_GUMBEL = sql_round(
    "-ln(-ln((("
    + _hex8_sql("md5('dsir:' || CAST(doc_id AS VARCHAR))")
    + ") + 0.5) / 4294967296.0))",
    9,
)
PIPELINE_DSIR_SQL = f"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN source IN ('src1','src2','src3') THEN 1 ELSE 0 END AS t,
         {_WORDS} AS words
  FROM documents
), feats AS (
  SELECT doc_id, t,
         unnest(list_concat(words, list_transform(
           range(1, greatest(len(words), 1)),
           i -> words[i] || ' ' || words[i + 1]
         ))) AS f
  FROM base
), bf AS (
  SELECT doc_id, t, ({_hex8_sql("md5('f:' || f)")}) % {_DSIR_B} AS b
  FROM feats
), counts AS (
  SELECT b, CAST(sum(t) AS BIGINT) AS c_t, CAST(count(*) AS BIGINT) AS c_r
  FROM bf GROUP BY b
), tot AS (
  SELECT CAST(sum(c_t) AS BIGINT) AS n_t, CAST(sum(c_r) AS BIGINT) AS n_r
  FROM counts
), ratio AS (
  SELECT b, {_DSIR_LR} AS lr FROM counts CROSS JOIN tot
), perdoc AS (
  SELECT doc_id,
         {sql_round("CAST(sum(CAST(lr AS DECIMAL(22,9))) AS DOUBLE)", 6)}
           AS logw
  FROM bf JOIN ratio USING (b) GROUP BY doc_id
), keyed AS (
  SELECT doc_id, logw, {sql_round(f"logw + {_DSIR_GUMBEL}", 6)} AS gkey
  FROM perdoc
), ranked AS (
  SELECT doc_id, logw, gkey,
         CAST(row_number() OVER (ORDER BY gkey DESC, doc_id ASC)
              AS INTEGER) AS rank
  FROM keyed
)
SELECT doc_id, logw, gkey, rank FROM ranked WHERE rank <= 20
"""


def pipeline_dsir_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental DSIR (the persisted-model complement of
    ``pipeline_dsir_sample``): fit the importance model on ¾ of the
    corpus (``pipelines.write_dsir_model`` — a ≤1024-row count table with
    recorded params), then score the remaining quarter against the FROZEN
    model in O(increment) (``pipelines.dsir_score_increment``) — the
    steady-state shape of DSIR over a rolling crawl, where the
    reference distributions are fit once and every arriving increment
    scores without re-scanning the fit corpus. Buckets the fit never
    produced take the smoothed zero-count ratio (left join +
    coalesce). Output: the increment's top-20 by frozen-model score."""
    import shutil as _sh
    import tempfile as _tf

    from ue_big_data_project_spark.pipelines import (
        dsir_score_increment,
        write_dsir_model,
    )

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    base = d.filter(F.col("doc_id") % 4 != 0)
    inc = d.filter(F.col("doc_id") % 4 == 0)
    root = _tf.mkdtemp(prefix="spark_graft_dsir_")
    try:
        model = root + "/model"
        write_dsir_model(
            base, F.col("source").isin("src1", "src2", "src3"), model
        )
        scored = dsir_score_increment(spark, model, inc)
        # Materialize before the tempdir vanishes (probe-index rule).
        scored = scored.orderBy(
            F.col("logw").desc(), F.col("doc_id").asc()
        ).limit(20)
        w = Window.orderBy(F.col("logw").desc(), F.col("doc_id").asc())
        return (
            scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .localCheckpoint(eager=True)
        )
    finally:
        _sh.rmtree(root, ignore_errors=True)


_DSIR_LR0 = sql_round(
    f"ln(1.0 / (n_t + {float(_DSIR_B)})) - ln(1.0 / (n_r + {float(_DSIR_B)}))",
    9,
)
PIPELINE_DSIR_INCREMENTAL_SQL = f"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN source IN ('src1','src2','src3') THEN 1 ELSE 0 END AS t,
         {_WORDS} AS words
  FROM documents
), feats AS (
  SELECT doc_id, t,
         unnest(list_concat(words, list_transform(
           range(1, greatest(len(words), 1)),
           i -> words[i] || ' ' || words[i + 1]
         ))) AS f
  FROM base
), bf AS (
  SELECT doc_id, t, ({_hex8_sql("md5('f:' || f)")}) % {_DSIR_B} AS b
  FROM feats
), counts AS (
  SELECT b, CAST(sum(t) AS BIGINT) AS c_t, CAST(count(*) AS BIGINT) AS c_r
  FROM bf WHERE doc_id % 4 <> 0 GROUP BY b
), tot AS (
  SELECT CAST(sum(c_t) AS BIGINT) AS n_t, CAST(sum(c_r) AS BIGINT) AS n_r
  FROM counts
), ratio AS (
  SELECT b, {_DSIR_LR} AS lr FROM counts CROSS JOIN tot
), perdoc AS (
  SELECT doc_id,
         {sql_round(
             "CAST(sum(CAST(coalesce(lr, " + _DSIR_LR0 + ") AS DECIMAL(22,9))) AS DOUBLE)",
             6,
         )} AS logw
  FROM bf LEFT JOIN ratio USING (b) CROSS JOIN tot
  WHERE doc_id % 4 = 0 GROUP BY doc_id
), ranked AS (
  SELECT doc_id, logw,
         CAST(row_number() OVER (ORDER BY logw DESC, doc_id ASC)
              AS INTEGER) AS rank
  FROM perdoc
)
SELECT doc_id, logw, rank FROM ranked WHERE rank <= 20
"""


def streaming_dsir_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous DSIR scoring end-to-end: the model fits once on ¾ of
    the corpus, then the remaining quarter arrives as 3 REAL
    micro-batches through ``streaming.dsir_score_stream`` — each batch
    scores against the frozen model and lands in its own ``batch_id=N``
    partition (deterministic overwrite = replay-safe with no ledger,
    the HLL-sink class). The oracle is ``pipeline_dsir_incremental``'s
    SQL VERBATIM: scores are per-document pure functions of the frozen
    model, so batching must be invisible — the streamed score table's
    top-20 hashes identically to the one-shot increment scoring."""
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from ue_big_data_project_spark import streaming as ST
    from ue_big_data_project_spark.pipelines import write_dsir_model
    from ue_big_data_project_spark.session import apply_session_conf

    apply_session_conf(spark)
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    base = d.filter(F.col("doc_id") % 4 != 0)
    inc = d.filter(F.col("doc_id") % 4 == 0)
    root = _tf.mkdtemp(prefix="spark_graft_dsirstream_")
    try:
        model = _os.path.join(root, "model")
        write_dsir_model(
            base, F.col("source").isin("src1", "src2", "src3"), model
        )
        # One staging job for all 3 batch files (round-12, guide §2.4).
        stage = stage_batches(
            inc.select("doc_id", "text"),
            (F.col("doc_id") / 4) % 3,
            root,
        )
        sdf = spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", 1
        ).parquet(stage)
        key = "spark.sql.shuffle.partitions"
        prev = spark.conf.get(key)
        spark.conf.set(key, "8")
        try:
            q = ST.dsir_score_stream(
                sdf, model, _os.path.join(root, "scores")
            )
            ST.run_until_drained(q)
        finally:
            spark.conf.set(key, prev)
        scored = ST.read_dsir_scores(spark, _os.path.join(root, "scores"))
        scored = scored.orderBy(
            F.col("logw").desc(), F.col("doc_id").asc()
        ).limit(20)
        w = Window.orderBy(F.col("logw").desc(), F.col("doc_id").asc())
        return (
            scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .localCheckpoint(eager=True)
        )
    finally:
        _sh.rmtree(root, ignore_errors=True)


def pipeline_leakage_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware train/val/test split (``pipelines.leakage_split``):
    split by CLUSTER of the exact-Jaccard ≥ 0.8 pair graph, not by
    document id, so a train document's near-twin can never land in
    val/test — the eval-leakage mode an id-hash split
    (``pipeline_split``) admits at the background duplicate rate.
    Output: per-split doc/cluster accounting (the co-clustered surplus
    is exactly the docs whose twin dictated their split)."""
    from ue_big_data_project_spark.pipelines import leakage_split

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    pairs = DD.ngram_jaccard_pairs(
        d, "doc_id", "text", shingle_n=3, threshold=0.8
    )
    s = leakage_split(d.select("doc_id"), pairs)
    n = F.count(F.lit(1))
    return s.groupBy("split").agg(
        n.alias("n_docs"),
        F.countDistinct("component").alias("n_clusters"),
        (n - F.countDistinct("component")).alias("n_coclustered"),
        F.min("component").alias("min_component"),
        F.max("component").alias("max_component"),
    )


def _hash100_sql(expr: str) -> str:
    """DuckDB twin of ``pipelines.hash_bucket(expr, 100)`` over an
    arbitrary string SQL expression (``_hash_mod_sql`` is fixed to
    doc_id)."""
    return (
        "("
        + " + ".join(
            f"(strpos('0123456789abcdef', substr(md5({expr}), {k + 1}, 1))"
            f" - 1) * {16 ** (11 - k)}"
            for k in range(12)
        )
        + ") % 100"
    )


PIPELINE_LEAKAGE_SPLIT_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({DEDUP_JACCARD_SQL}) p
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL
  SELECT id_b AS a, id_a AS b FROM pairs
), reach(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.a, r.label FROM reach r JOIN edges e ON e.b = r.node
), comp AS (
  SELECT node AS doc_id, CAST(min(label) AS BIGINT) AS component
  FROM reach GROUP BY node
), assigned AS (
  SELECT doc_id, component,
         CASE WHEN h < 10 THEN 'val'
              WHEN h < 20 THEN 'test'
              ELSE 'train' END AS split
  FROM (
    SELECT doc_id, component,
           {_hash100_sql("CAST(component AS VARCHAR)")} AS h
    FROM comp
  )
)
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT component) AS BIGINT) AS n_clusters,
       CAST(count(*) - count(DISTINCT component) AS BIGINT)
         AS n_coclustered,
       min(component) AS min_component,
       max(component) AS max_component
FROM assigned GROUP BY split
"""


QUERIES = {
    "pipeline_prep_documents": QuerySpec(
        pipeline_prep_documents, PIPELINE_PREP_SQL
    ),
    "pipeline_split": QuerySpec(pipeline_split, PIPELINE_SPLIT_SQL),
    "pipeline_corpus_stats": QuerySpec(
        pipeline_corpus_stats, PIPELINE_STATS_SQL
    ),
    "pipeline_stratified_sample": QuerySpec(
        pipeline_stratified_sample, PIPELINE_STRATIFIED_SQL
    ),
    "pipeline_profile": QuerySpec(pipeline_profile, PIPELINE_PROFILE_SQL),
    "pipeline_expectations": QuerySpec(
        pipeline_expectations, PIPELINE_EXPECTATIONS_SQL
    ),
    "streaming_expectations": QuerySpec(
        streaming_expectations, STREAMING_EXPECTATIONS_SQL
    ),
    "pipeline_chunk_documents": QuerySpec(
        pipeline_chunk_documents, PIPELINE_CHUNK_SQL
    ),
    "pipeline_scrub_boilerplate": QuerySpec(
        pipeline_scrub_boilerplate, PIPELINE_SCRUB_BOILERPLATE_SQL
    ),
    "pipeline_pack_sequences": QuerySpec(
        pipeline_pack_sequences, PIPELINE_PACK_SQL
    ),
    "pipeline_contamination": QuerySpec(
        pipeline_contamination, PIPELINE_CONTAMINATION_SQL
    ),
    "pipeline_source_quota": QuerySpec(
        pipeline_source_quota, PIPELINE_SOURCE_QUOTA_SQL
    ),
    "pipeline_weighted_sample": QuerySpec(
        pipeline_weighted_sample, PIPELINE_WEIGHTED_SAMPLE_SQL
    ),
    "pipeline_upsert_corpus": QuerySpec(
        pipeline_upsert_corpus, PIPELINE_UPSERT_SQL
    ),
    "pipeline_training_shards": QuerySpec(
        pipeline_training_shards, PIPELINE_TRAINING_SHARDS_SQL
    ),
    "pipeline_dsir_sample": QuerySpec(
        pipeline_dsir_sample, PIPELINE_DSIR_SQL
    ),
    "pipeline_dsir_incremental": QuerySpec(
        pipeline_dsir_incremental, PIPELINE_DSIR_INCREMENTAL_SQL
    ),
    "streaming_dsir_scores": QuerySpec(
        streaming_dsir_scores, PIPELINE_DSIR_INCREMENTAL_SQL
    ),
    "pipeline_leakage_split": QuerySpec(
        pipeline_leakage_split, PIPELINE_LEAKAGE_SPLIT_SQL
    ),
    "text_repetition": QuerySpec(text_repetition, TEXT_REPETITION_SQL),
    "dedup_exact": QuerySpec(dedup_exact, DEDUP_EXACT_SQL),
    "dedup_incremental": QuerySpec(dedup_incremental, DEDUP_INCREMENTAL_SQL),
    "dedup_minhash_lsh": QuerySpec(dedup_minhash_lsh, DEDUP_MINHASH_SQL),
    "dedup_ngram_jaccard": QuerySpec(dedup_ngram_jaccard, DEDUP_JACCARD_SQL),
    "dedup_simhash": QuerySpec(dedup_simhash, DEDUP_SIMHASH_SQL),
    "dedup_simhash_pairs": QuerySpec(dedup_simhash_pairs, DEDUP_SIMHASH_PAIRS_SQL),
    "dedup_embedding_cosine": QuerySpec(dedup_embedding_cosine, DEDUP_EMBEDDING_SQL),
    "dedup_clusters": QuerySpec(dedup_clusters, DEDUP_CLUSTERS_SQL),
    "dedup_clusters_incremental": QuerySpec(
        dedup_clusters_incremental, DEDUP_CLUSTERS_SQL
    ),
    "streaming_dedup_clusters": QuerySpec(
        streaming_dedup_clusters, STREAMING_DEDUP_CLUSTERS_SQL
    ),
    "dedup_jaccard_incremental": QuerySpec(
        dedup_jaccard_incremental, DEDUP_JACCARD_INCREMENTAL_SQL
    ),
    "dedup_clusters_pruned": QuerySpec(
        dedup_clusters_pruned, DEDUP_CLUSTERS_PRUNED_SQL
    ),
    "dedup_jaccard_pruned": QuerySpec(
        dedup_jaccard_pruned, DEDUP_JACCARD_PRUNED_SQL
    ),
    "dedup_span_ngrams": QuerySpec(dedup_span_ngrams, DEDUP_SPAN_SQL),
    "dedup_semantic_prune": QuerySpec(
        dedup_semantic_prune, DEDUP_SEMANTIC_PRUNE_SQL
    ),
    "text_scrub": QuerySpec(text_scrub, TEXT_SCRUB_SQL),
    "text_stats": QuerySpec(text_stats, TEXT_STATS_SQL),
    "text_langid": QuerySpec(text_langid, TEXT_LANGID_SQL),
    "text_tokens": QuerySpec(text_tokens, TEXT_TOKENS_SQL),
    "text_fingerprint": QuerySpec(text_fingerprint, TEXT_FINGERPRINT_SQL),
    "text_winnow": QuerySpec(text_winnow, TEXT_WINNOW_SQL),
    "dedup_winnow_pairs": QuerySpec(
        dedup_winnow_pairs, DEDUP_WINNOW_PAIRS_SQL
    ),
    "dedup_winnow_incremental": QuerySpec(
        dedup_winnow_incremental, DEDUP_WINNOW_INCREMENTAL_SQL
    ),
    # The streamed index must answer exactly like the one-shot build —
    # same oracle SQL verbatim (batching is invisible by construction:
    # df aggregates on read).
    "streaming_winnow_index": QuerySpec(
        streaming_winnow_index, DEDUP_WINNOW_INCREMENTAL_SQL
    ),
    "text_bpe_tokens": QuerySpec(text_bpe_tokens, TEXT_BPE_TOKENS_SQL),
    "pipeline_pack_bpe": QuerySpec(pipeline_pack_bpe, PIPELINE_PACK_BPE_SQL),
    "pipeline_temperature_mix": QuerySpec(
        pipeline_temperature_mix, PIPELINE_TEMPERATURE_MIX_SQL
    ),
    "text_nlp_kit": QuerySpec(text_nlp_kit, TEXT_NLP_KIT_SQL),
    "text_surprisal": QuerySpec(text_surprisal, TEXT_SURPRISAL_SQL),
    "text_source_kl": QuerySpec(text_source_kl, TEXT_SOURCE_KL_SQL),
    "text_classify_nb": QuerySpec(text_classify_nb, TEXT_CLASSIFY_NB_SQL),
    "text_classify_nb_incremental": QuerySpec(
        text_classify_nb_incremental, TEXT_CLASSIFY_NB_INC_SQL
    ),
    "text_bm25_search": QuerySpec(text_bm25_search, TEXT_BM25_SQL),
    "text_bm25_indexed": QuerySpec(text_bm25_indexed, TEXT_BM25_SQL),
    "text_bm25_appended": QuerySpec(text_bm25_appended, TEXT_BM25_SQL),
    "text_bm25_pruned": QuerySpec(text_bm25_pruned, TEXT_BM25_PRUNED_SQL),
    "text_bm25_capped": QuerySpec(text_bm25_capped, TEXT_BM25_CAPPED_SQL),
    # The streamed index must answer exactly like the one-shot build —
    # the full-corpus search oracle VERBATIM (sidecars aggregate on
    # read, so batching is invisible by construction).
    "streaming_bm25_index": QuerySpec(streaming_bm25_index, TEXT_BM25_SQL),
    "text_hybrid_search": QuerySpec(text_hybrid_search, TEXT_HYBRID_SQL),
    "knn_cosine_brute": QuerySpec(knn_cosine_brute, KNN_BRUTE_SQL),
    "knn_cosine_lsh": QuerySpec(knn_cosine_lsh, KNN_LSH_SQL),
    "knn_cosine_ivf": QuerySpec(knn_cosine_ivf, KNN_IVF_SQL),
    "knn_cosine_ivf_indexed": QuerySpec(knn_cosine_ivf_indexed, KNN_IVF_SQL),
    "knn_cosine_ivf_appended": QuerySpec(knn_cosine_ivf_appended, KNN_IVF_SQL),
    "knn_cosine_ivf_probe": QuerySpec(knn_cosine_ivf_probe, KNN_IVF_SQL),
    "knn_cosine_ivf_pruned": QuerySpec(
        knn_cosine_ivf_pruned, KNN_IVF_PRUNED_SQL
    ),
    "text_bm25_probe": QuerySpec(text_bm25_probe, TEXT_BM25_SQL),
    "knn_cosine_pq": QuerySpec(knn_cosine_pq, KNN_PQ_SQL),
}
