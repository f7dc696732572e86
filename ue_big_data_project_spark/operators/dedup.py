"""Deduplication operators for large-scale document corpora.

Four families, all expressed as DataFrame pipelines (no driver-side
loops, no Python UDFs), each scaling to 100 TB by shuffling on bounded
keys (fingerprints, shingles, band buckets) instead of comparing all
pairs:

- **exact**: md5 fingerprint of normalized text → groupBy. One shuffle.
- **MinHash + LSH**: shingle → 8 min-hashes → 4 banded buckets →
  bucket equi-join. Only documents sharing a band bucket are paired, so
  the candidate set is ~linear for realistic corpora instead of O(n²).
- **SimHash**: 16-bit signature from token hash-bit majorities; near-dup
  pairs = signatures within a Hamming radius.
- **n-gram Jaccard**: exact set overlap via a shingle-keyed equi-join
  (inverted-index join, not a cross product).

Hash discipline: every hash is md5 (cross-engine standard) and hex→int
decoding is ``instr``-based (``functions.hex_digit_value``), so the
DuckDB oracle reproduces results bit-for-bit. xxhash/crc32 would be
faster but unverifiable; at 100 TB you'd swap one constant.

The reference's own dedup is ``dropDuplicates(["entry_id"])``
(src/previous_tp_code.py:149,212); ``exact_dedup`` generalizes it to
content-addressed dedup; the streaming keyed form lives in
``streaming.dedup_stream``.

Cache lifetime: ``ngram_jaccard_pairs`` and ``simhash_pairs`` `.cache()`
an intermediate that feeds multiple subtrees of the returned plan. The
cache is keyed to the returned plan's lineage, so callers running many
invocations in one long-lived session should ``spark.catalog.clearCache()``
(or unpersist) between invocations once the result is materialized —
the bench harness and tests do exactly that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ue_big_data_project_spark.session import local_relation

from ue_big_data_project_spark.functions import hex_digit_value, pround
from ue_big_data_project_spark.functions.text import (
    fingerprint,
    tokens,
    word_shingles,
)


MINHASH_PRIME = 4294967291  # largest 32-bit prime


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Content-exact dedup groups: one row per distinct normalized text.

    Output: ``fingerprint``, ``n_docs``, ``keep_id`` (min id = canonical
    representative — deterministic, unlike ``dropDuplicates``).
    """
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("keep_id"),
        )
    )


def _spread(df: DataFrame) -> DataFrame:
    """Match partition count to the cluster before CPU-heavy per-row work.

    A small parquet file arrives as ONE input split, which would pin the
    whole shingle/tokenize explosion to a single core; at 100 TB the
    scan has thousands of splits and this is a no-op. The repartition
    shuffles only the raw documents (cheap) to unlock N-way parallelism
    on the expensive expressions.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def shingle_rows(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) exploded rows — the inverted-index building block."""
    return _spread(df).select(
        F.col(id_col), F.explode(word_shingles(text_col, n)).alias("shingle")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document MinHash signature: ``h0..h{k-1}`` (bigints).

    ONE md5 per shingle, then the Kirsch–Mitzenmacher construction
    ``hᵢ = (a + i·b) mod p`` with a/b = the two 32-bit halves of the md5
    prefix and p = 4294967291 (largest 32-bit prime): k independent-enough
    min-hash functions for the cost of one hash evaluation — an 8× cut in
    the dominant per-shingle work. All integer ops, so any engine with
    md5 reproduces the signatures exactly. One explode + one grouped
    aggregation (map-side partial min ⇒ the shuffle carries k ints per
    doc, not the shingles).
    """
    sh = shingle_rows(df, id_col, text_col, shingle_n)
    h = F.md5(F.col("shingle"))
    a = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    b = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    aggs = [
        F.min((a + F.lit(i) * b) % F.lit(MINHASH_PRIME)).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_band_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, band_idx, band_val) LSH band rows — the join/index key shape
    shared by pairwise LSH (:func:`minhash_lsh_pairs`) and the
    incremental corpus index (:func:`incremental_minhash_filter`)."""
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes={num_hashes} must divide evenly into bands={bands}; "
            "trailing hashes would be silently dropped, weakening the LSH "
            "guarantee"
        )
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    band_structs = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.md5(
                F.concat_ws(
                    ":",
                    *[
                        F.col(f"h{b * rows_per_band + r}").cast("string")
                        for r in range(rows_per_band)
                    ],
                )
            ).alias("band_val"),
        )
        for b in range(bands)
    ]
    return sig.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("band")
    ).select(id_col, "band.band_idx", "band.band_val")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH over MinHash.

    ``bands`` bands of ``num_hashes/bands`` rows; a pair is a candidate if
    any band hashes identically. The pair join is an equi-join on
    (band_idx, band_val) — the only shuffle keys — so no O(n²) compare.
    Output: ``id_a < id_b`` distinct pairs.
    """
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes={num_hashes} must divide evenly into bands={bands}; "
            "trailing hashes would be silently dropped, weakening the LSH "
            "guarantee"
        )
    banded = minhash_band_rows(
        df, id_col, text_col, num_hashes, bands, shingle_n
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.

    Inverted-index join: explode shingles, equi-join on the shingle key,
    count intersections, then |A∪B| = |A|+|B|−|A∩B|. Candidate
    generation joins on ``xxhash64(shingle)`` (8-byte shuffle keys; the
    text itself never shuffles until verification), and hot shingles
    (stopword runs) remain the skew risk — at scale, additionally drop
    ultra-frequent shingles first (df-style pruning).

    Prefix filtering (Bayardo/PPJoin, lossless): order each document's
    shingles globally by (document frequency asc, shingle asc) and index
    only its first ``n − ⌈t·n⌉ + 1`` shingles. If J(A,B) ≥ t then
    |A∩B| ≥ t·|A|, so the intersection cannot fit inside A's unindexed
    ⌈t·|A|⌉−1 suffix — every qualifying pair shares a *prefix* shingle.
    Candidates therefore come from an inverted-index join over ~(1−t) of
    the shingle volume (rarest shingles first ⇒ smallest postings), with
    the size-compatibility bound J ≤ min/max(|A|,|B|) applied in the
    join. Candidates are then verified EXACTLY by intersecting the full
    (sorted, distinct) shingle arrays — results are identical to the
    naive all-postings join, at a fraction of the shuffle.
    Output: id_a, id_b, jaccard (rounded 4), filtered ≥ threshold.
    """
    from pyspark.sql import Window

    # The shingle explosion feeds four subtrees (frequencies, ranking,
    # and both verification sides); cache it so the regex/explode work
    # runs once. Storage is ~|corpus shingles| rows — the same order as
    # one shuffle of the naive join, and LRU-evicted under pressure.
    sh = shingle_rows(df, id_col, text_col, shingle_n).cache()
    # Candidate generation runs on xxhash64 KEYS, not shingle strings:
    # every frequency/rank/join shuffle then moves 8-byte longs instead
    # of n-word text (the "hash them first" lever the scale note below
    # prescribes, now the default). Still LOSSLESS: the global order is
    # (df(h), h) — a fixed preorder consistent across documents — and
    # rank ties occur ONLY among rows with equal h, so however a tie
    # splits across the prefix boundary, some equal-h representative
    # stays in the prefix and the h-equality join still surfaces the
    # pair. A 64-bit collision can only ADD a spurious candidate (two
    # different shingles, same key), and the exact string-array
    # verification below rejects it — candidates are a superset, the
    # verified output is identical.
    shh = sh.select(
        F.col(id_col), F.xxhash64("shingle").alias("_h")
    )
    # df as a WINDOW over the hash key instead of a groupBy + join-back
    # (round-12, guide §2.4 "share one exchange"): one exchange on _h
    # feeds the count, where the join formulation paid the aggregate's
    # exchange AND re-shuffled the postings to meet it.
    ranked = shh.withColumn(
        "_df", F.count(F.lit(1)).over(Window.partitionBy("_h"))
    ).select(
        id_col,
        "_h",
        F.row_number()
        .over(Window.partitionBy(id_col).orderBy(F.asc("_df"), F.asc("_h")))
        .alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy(id_col)).alias("n_sh"),
    )
    # ⌈t·n⌉ computed with a tiny downward nudge so float error can only
    # LENGTHEN the prefix (more candidates, never a missed pair).
    prefix_len = F.col("n_sh") - F.ceil(
        F.lit(threshold) * F.col("n_sh") - F.lit(1e-9)
    ) + 1
    prefix = ranked.filter(F.col("_rn") <= prefix_len)
    a, b = prefix.alias("a"), prefix.alias("b")
    # Positional filter (PPJoin, lossless — round-12 verdict task 4):
    # take the lexicographically MINIMAL matched (a-rank, b-rank) pair
    # (i, j) per candidate. Every truly-shared shingle s has global
    # order ≥ the minimum matched hash's (if o(s) were smaller, s's
    # ranks in BOTH docs would precede (i, j), putting s inside both
    # prefixes and making s's hash an earlier match — contradiction),
    # so s occupies a rank ≥ i in A and ≥ j in B, giving
    # |A∩B| ≤ 1 + min(n_a − i, n_b − j). J ≥ t requires
    # |A∩B| ≥ t/(1+t)·(n_a+n_b); pairs whose positional bound cannot
    # reach that are dropped BEFORE the full-array verification join.
    # Hash collisions only ADD matched rows, which can only move the
    # minimum earlier and LOOSEN the bound — a collision never drops a
    # true pair (the r12 deferral's concern), and spurious survivors
    # are still rejected by the exact string-array verification. The
    # former `.distinct()` on (id_a, id_b) becomes a groupBy on the
    # same keys — one exchange either way, no new shuffle.
    candidates = (
        a.join(
            b,
            (F.col("a._h") == F.col("b._h"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (
                F.least(F.col("a.n_sh"), F.col("b.n_sh"))
                >= threshold * F.greatest(F.col("a.n_sh"), F.col("b.n_sh"))
            ),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a._rn").alias("_ia"),
            F.col("b._rn").alias("_jb"),
            F.col("a.n_sh").alias("_na"),
            F.col("b.n_sh").alias("_nb"),
        )
    )
    candidates = _positional_prune(candidates, "id_a", "id_b", threshold)
    sets = sh.groupBy(id_col).agg(
        F.sort_array(F.collect_list("shingle")).alias("_arr"),
        F.count(F.lit(1)).alias("n_sh"),
    )
    sa = sets.select(
        F.col(id_col).alias("id_a"),
        F.col("_arr").alias("_arr_a"),
        F.col("n_sh").alias("n_a"),
    )
    sb = sets.select(
        F.col(id_col).alias("id_b"),
        F.col("_arr").alias("_arr_b"),
        F.col("n_sh").alias("n_b"),
    )
    # Plain shuffle joins on id: `sets` carries every document's full
    # shingle array, which grows with the corpus, so it must never be
    # broadcast. Candidates are the small side by construction
    # (prefix + size pruning); AQE is free to pick a broadcast at
    # runtime if the *measured* candidate side fits — a size-based
    # decision, unlike a hint that pins the unbounded side.
    verified = (
        candidates.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "common", F.size(F.array_intersect("_arr_a", "_arr_b"))
        )
        .withColumn(
            "jaccard",
            pround(
                F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")),
                4,
            ),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = 16
) -> DataFrame:
    """Per-document SimHash signature (``bits`` ≤ 32).

    Bit i's vote per token is the parity of hex digit i of md5(token):
    +1 / −1; the signature bit is the sign of the summed votes. All
    integer ops ⇒ bit-identical across engines. One explode + one grouped
    sum (map-side combine), shuffle carries ``bits`` ints per doc.
    """
    tok = _spread(df).select(
        F.col(id_col), F.explode(tokens(text_col)).alias("tok")
    )
    h = F.md5(F.col("tok"))
    votes = [
        F.sum(
            (hex_digit_value(F.substring(h, i + 1, 1)) % 2) * 2 - 1
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    summed = tok.groupBy(id_col).agg(*votes)
    sig: Column = F.lit(0).cast("long")
    for i in range(bits):
        sig = sig + F.when(F.col(f"v{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ) * (1 << i)
    return summed.select(F.col(id_col), sig.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 16,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance — EXACT results
    via pigeonhole banding (no all-pairs join).

    The signature splits into ``max_hamming + 1`` bit-bands: a pair
    within the radius differs in ≤ ``max_hamming`` bits, which can touch
    at most ``max_hamming`` bands, so at least one band matches EXACTLY
    — candidates come from equi-joins on (band_idx, band_value), the
    only shuffle keys, and are then verified with the full Hamming test.
    Identical output to the naive O(n²) join at any corpus size.
    """
    if bits < max_hamming + 1:
        raise ValueError(
            f"bits={bits} < max_hamming+1={max_hamming + 1}: zero-width "
            "bands would make every pair a candidate (quadratic blowup)"
        )
    sig = simhash(df, id_col, text_col, bits).cache()
    n_bands = max_hamming + 1
    base = bits // n_bands
    # Distribute remainder bits over the leading bands.
    widths = [base + (1 if i < bits % n_bands else 0) for i in range(n_bands)]
    offsets = [sum(widths[:i]) for i in range(n_bands)]
    band_structs = [
        F.struct(
            F.lit(i).alias("band_idx"),
            F.shiftright(F.col("simhash"), offsets[i])
            .bitwiseAND(F.lit((1 << widths[i]) - 1))
            .alias("band_val"),
        )
        for i in range(n_bands)
    ]
    banded = sig.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("b")
    ).select(id_col, "b.band_idx", "b.band_val")
    ba, bb = banded.alias("a"), banded.alias("b")
    candidates = (
        ba.join(
            bb,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    sa = sig.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sim_a"))
    sb = sig.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sim_b"))
    # Shuffle joins on id — the signature table is one row per document
    # (unbounded at corpus scale), so it is never hinted broadcast; AQE
    # may still broadcast the measured-small side at runtime.
    return (
        candidates.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "hamming",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def _winnow_fp_rows(
    df: DataFrame, id_col: str, text_col: str, k: int, w: int
) -> tuple[DataFrame, DataFrame]:
    """Distinct selected ``(id, h)`` winnowing fingerprint rows, plus
    the cached per-doc staging frame (callers unpersist it, or rely on
    the documented clearCache lifecycle).

    The cache is a PLAN BARRIER, not (only) a reuse cache: Generate
    (explode) is not CollapseProject-protected, so without it the
    optimizer folds both staged projections into the generator input —
    winnow_select references its hs input ~14 times (slices, sizes,
    branch guards), HOF expressions are interpreted (no codegen CSE),
    and the collapsed plan re-tokenizes + re-hashes every document once
    per reference (measured: md5 ×29 in the optimized plan, 18.7 s vs
    1.8 s on 5k docs). Cached rows are one struct array per document —
    O(selected fingerprints), ~3× smaller than the gram sequence.
    """
    from ue_big_data_project_spark.functions.text import (
        gram_hashes,
        winnow_select,
    )

    fp_rows = (
        df.select(F.col(id_col), gram_hashes(text_col, k=k).alias("hs"))
        .select(
            F.col(id_col), winnow_select(F.col("hs"), w=w).alias("fps")
        )
        .cache()
    )
    fps = (
        fp_rows.select(id_col, F.explode("fps").alias("f"))
        .select(id_col, F.col("f.h").alias("h"))
        .distinct()
    )
    return fps, fp_rows


def winnow_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 4,
    w: int = 5,
    min_shared: int = 2,
    max_df: int = 50,
) -> DataFrame:
    """Near-dup pairs by shared WINNOWING fingerprints (Schleimer et al.,
    SIGMOD 2003) — substring-level evidence, the MOSS scheme.

    Winnowing guarantees any shared token run of ≥ ``w + k - 1`` tokens
    shares a selected hash, while keeping only ~2/(w+1) of grams — so the
    inverted-index join below is over a sequence ~3× sparser than the
    full gram postings ``span_gram_rows`` builds, with a detection
    guarantee the order-free MinHash bands can't give. Pipeline: per-doc
    selection (zero shuffles, pure array HOFs in
    ``functions.text.winnow_select``) → distinct (doc, hash) →
    stop-fingerprint cap (hashes in > ``max_df`` docs are boilerplate,
    dropped BEFORE the self-join, bounding the per-key fan-out at scale)
    → hash equi-join → pairs sharing ≥ ``min_shared`` hashes. Never
    all-pairs; every shuffle key is a fingerprint hash or a doc-id pair.
    """
    from pyspark.sql import Window

    fps, _ = _winnow_fp_rows(df, id_col, text_col, k, w)
    # df-cap as a WINDOW over the hash key (not a groupBy + join-back):
    # one exchange on h, which the self-join below then reuses. Cached
    # because ``keep`` feeds both sides of the self-join (see module
    # docstring on cache lifetime).
    keep = (
        fps.withColumn(
            "_df", F.count(F.lit(1)).over(Window.partitionBy("h"))
        )
        .filter(F.col("_df") <= max_df)
        .drop("_df")
        .cache()
    )
    a = keep.select(F.col(id_col).alias("id_a"), "h")
    b = keep.select(F.col(id_col).alias("id_b"), "h")
    return (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


# Stats-sidecar schemas, shared by writer and readers: an explicit
# read schema skips the one-task parquet footer-inference job every
# spark.read.parquet() otherwise schedules (round-12, guide §1.2 —
# fewer scheduled jobs; partition columns of streamed layouts are
# still discovered and appended).
WINNOW_STATS_SCHEMA = (
    "id_col string, k int, w int, min_shared int, "
    "max_df int, n_buckets int"
)
JACCARD_STATS_SCHEMA = (
    "shingle_n int, threshold double, n_buckets int, id_col string"
)
# Frequency-sidecar data schemas (hash + count are longs in every
# layout; the _hbucket / batch_id partition columns are discovered
# and appended on read).
WINNOW_FREQ_SCHEMA = "h long, _df long"
JACCARD_FREQ_SCHEMA = "_h long, _df long"


def write_winnow_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 5,
    min_shared: int = 2,
    max_df: int = 50,
    n_buckets: int = 16,
) -> str:
    """Persist the corpus side of the winnowing pair search: distinct
    selected ``(id, h)`` fingerprint rows hash-partitioned by
    ``_hbucket = pmod(h, n_buckets)`` (probes read only the buckets
    their hashes fall in — the Jaccard/BM25 index layout), plus
    per-hash document-frequency DELTA rows in the same sharding,
    aggregated on read. ``<path>_stats`` carries the constants.

    Unlike the Jaccard index there is NOTHING to freeze: the
    stop-fingerprint cap needs TRUE total df, and delta rows give it
    exactly at any append depth — ``append_winnow_index`` appends its
    increment's counts and never rewrites (or even reads) existing
    rows, so probe == full rebuild row-for-row forever, with no
    staleness/selectivity decay to audit.
    """
    spark = df.sparkSession
    root = path.rstrip("/")
    fps, fp_rows = _winnow_fp_rows(df, id_col, text_col, k, w)
    try:
        bucket = F.pmod(F.col("h"), F.lit(n_buckets)).cast("int")
        (
            fps.withColumn("_hbucket", bucket)
            .repartition(n_buckets, "_hbucket")
            .write.mode("overwrite")
            .partitionBy("_hbucket")
            .parquet(root)
        )
        freq = fps.groupBy("h").agg(F.count(F.lit(1)).alias("_df"))
        (
            freq.withColumn("_hbucket", bucket)
            .repartition(n_buckets, "_hbucket")
            .write.mode("overwrite")
            .partitionBy("_hbucket")
            .parquet(root + "_freq")
        )
        local_relation(spark, 
            [(id_col, k, w, min_shared, max_df, n_buckets)],
            "id_col string, k int, w int, min_shared int, "
            "max_df int, n_buckets int",
        ).write.mode("overwrite").parquet(root + "_stats")
        return root
    finally:
        fp_rows.unpersist()


def append_winnow_index(
    spark, path: str, new_docs: DataFrame, text_col: str = "text"
) -> None:
    """Append an increment to a :func:`write_winnow_index` layout:
    fingerprint the increment ONLY and append its ``(id, h)`` rows and
    its per-hash df DELTA rows into the existing bucket partitions —
    O(increment), no corpus scan, no rewrite. Because df aggregates on
    read, the cap stays exact (no frozen-order drift)."""
    root = path.rstrip("/")
    meta = spark.read.schema(WINNOW_STATS_SCHEMA).parquet(
        root + "_stats"
    ).first()
    id_col, k, w = meta["id_col"], int(meta["k"]), int(meta["w"])
    n_buckets = int(meta["n_buckets"])
    if "batch_id" in spark.read.parquet(root).columns:
        # The ivf_index_append guard, same hazard: a STREAM-ingested
        # layout (streaming.winnow_ingest_stream writes
        # batch_id=N/_hbucket=M) with flat _hbucket=M dirs appended
        # next to it gives conflicting partition schemas and bricks
        # every subsequent read. Route increments through the stream,
        # or rewrite_winnow_index first (it compacts to the flat
        # layout).
        raise ValueError(
            f"{root} uses the stream-ingested batch_id=N/_hbucket=M "
            "layout; a flat append would conflict with it — ingest "
            "increments through winnow_ingest_stream, or compact with "
            "rewrite_winnow_index first"
        )
    fps, fp_rows = _winnow_fp_rows(new_docs, id_col, text_col, k, w)
    try:
        bucket = F.pmod(F.col("h"), F.lit(n_buckets)).cast("int")
        (
            fps.withColumn("_hbucket", bucket)
            .repartition("_hbucket")
            .write.mode("append")
            .partitionBy("_hbucket")
            .parquet(root)
        )
        freq = fps.groupBy("h").agg(F.count(F.lit(1)).alias("_df"))
        (
            freq.withColumn("_hbucket", bucket)
            .repartition("_hbucket")
            .write.mode("append")
            .partitionBy("_hbucket")
            .parquet(root + "_freq")
        )
    finally:
        fp_rows.unpersist()


def winnow_probe_index(
    spark, path: str, new_docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """One-sided winnowing pair search: every pair ``(id_a, id_b,
    n_shared >= min_shared)`` with AT LEAST ONE endpoint in
    ``new_docs`` — probe-vs-index plus probe-vs-probe — without
    re-fingerprinting the corpus. Results are EXACTLY the full
    :func:`winnow_pairs` output over (indexed ∪ probe) restricted to
    probe-incident pairs (equivalence-tested): the stop-fingerprint cap
    uses index df (delta-summed) + probe df = true union-corpus df.

    Scale shape: the probe reads only the ``_hbucket`` partitions its
    hashes fall in (bounded bucket-id collect); index rows are
    semi-joined to the probe's hash set BEFORE pairing, so the join
    fan-out is probe-hash-incident and per-hash ≤ max_df — never
    corpus × corpus. ``new_docs`` ids must be disjoint from indexed
    ids (same contract as :func:`jaccard_probe_index`)."""
    root = path.rstrip("/")
    meta = spark.read.schema(WINNOW_STATS_SCHEMA).parquet(
        root + "_stats"
    ).first()
    id_col, k, w = meta["id_col"], int(meta["k"]), int(meta["w"])
    min_shared, max_df = int(meta["min_shared"]), int(meta["max_df"])
    n_buckets = int(meta["n_buckets"])
    fps, fp_rows = _winnow_fp_rows(new_docs, id_col, text_col, k, w)
    probe = fps.localCheckpoint(eager=True)  # feeds hashes, df, pairing
    fp_rows.unpersist()
    buckets = sorted(
        r.b
        for r in probe.select(
            F.pmod(F.col("h"), F.lit(n_buckets)).cast("int").alias("b")
        )
        .distinct()
        .collect()
    )
    probe_h = probe.select("h").distinct()
    # Probe-incident index rows only: the equi-join to the probe's hash
    # set bounds everything downstream.
    idx_rows = (
        spark.read.parquet(root)
        .filter(F.col("_hbucket").isin(buckets))
        .join(probe_h, "h")
        .select(id_col, "h")
    )
    idx_df = (
        spark.read.schema(WINNOW_FREQ_SCHEMA)
        .parquet(root + "_freq")
        .filter(F.col("_hbucket").isin(buckets))
        .join(probe_h, "h")
        .groupBy("h")
        .agg(F.sum("_df").alias("_df"))
    )
    probe_df = probe.groupBy("h").agg(F.count(F.lit(1)).alias("_df"))
    ok = (
        idx_df.unionByName(probe_df)
        .groupBy("h")
        .agg(F.sum("_df").alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("h")
    )
    # Cached: feeds both sides of the pair self-join (same lifecycle
    # note as winnow_pairs — callers clearCache once materialized).
    rows = (
        probe.withColumn("_probe", F.lit(1))
        .unionByName(idx_rows.withColumn("_probe", F.lit(0)))
        .join(ok, "h")
        .cache()
    )
    a = rows.select(
        F.col(id_col).alias("id_a"), "h", F.col("_probe").alias("_pa")
    )
    b = rows.select(
        F.col(id_col).alias("id_b"), "h", F.col("_probe").alias("_pb")
    )
    out = (
        a.join(b, "h")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("_pa") + F.col("_pb") >= 1)
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    # Materialize before returning (jaccard_probe_index precedent): the
    # result must not lazily re-read index files a caller may have
    # already expired/removed; O(qualifying pairs) rows.
    out = out.localCheckpoint(eager=True)
    rows.unpersist()
    return out


def rewrite_winnow_index(spark, path: str, keep_docs: DataFrame) -> int:
    """RETENTION for the winnow fingerprint index: drop fingerprint
    rows of documents not in ``keep_docs`` and RECOMPUTE the df table
    from the survivors, rewriting both sharded layouts in place. Unlike
    :func:`rewrite_jaccard_index` (which must leave its frozen order
    untouched), there is no frozen state here — df is true corpus df,
    so the prune recomputes it exactly and doubles as COMPACTION of the
    append-deltas (the freq table returns to one row per hash, bounding
    the aggregate-on-read cost over a long append history).

    Post-prune probe == a fresh :func:`write_winnow_index` on the kept
    documents, row-for-row (test-pinned). Returns the surviving
    fingerprint-row count.

    Accepts BOTH layouts: the flat ``_hbucket=M`` sharding and the
    stream-ingested ``batch_id=N/_hbucket=M`` one
    (``streaming.winnow_ingest_stream``) — the rewrite always emits
    the canonical flat layout, so it doubles as the COMPACTION that
    retires a streamed index into an ``append_winnow_index``-able
    artifact (the overwrite drops the old batch directories with the
    rest of the previous layout)."""
    root = path.rstrip("/")
    meta = spark.read.schema(WINNOW_STATS_SCHEMA).parquet(
        root + "_stats"
    ).first()
    id_col, n_buckets = meta["id_col"], int(meta["n_buckets"])
    keep = keep_docs.select(
        F.col(keep_docs.columns[0]).alias(id_col)
    ).distinct()
    fps = (
        spark.read.parquet(root)
        .join(keep, id_col, "left_semi")
        .select(id_col, "h", "_hbucket")  # drop batch_id if streamed
        .localCheckpoint(eager=True)
    )
    n = fps.count()
    (
        fps.repartition(n_buckets, "_hbucket")
        .write.mode("overwrite")
        .partitionBy("_hbucket")
        .parquet(root)
    )
    freq = (
        fps.groupBy("h", "_hbucket")
        .agg(F.count(F.lit(1)).alias("_df"))
        .localCheckpoint(eager=True)
    )
    (
        freq.repartition(n_buckets, "_hbucket")
        .write.mode("overwrite")
        .partitionBy("_hbucket")
        .parquet(root + "_freq")
    )
    return n


# ---------------------------------------------------------------------------
# Incremental dedup: a NEW batch against the persisted corpus index.
# A training corpus is not deduped once — every crawl increment must be
# screened against everything already ingested WITHOUT rescanning it.
# The index holds fingerprints/band rows, never text: screening cost is
# O(batch + index-join), independent of corpus text volume.
# ---------------------------------------------------------------------------


def incremental_exact_dedup(
    new_docs: DataFrame,
    seen: DataFrame | None,
    id_col: str,
    text_col: str,
    prefilter=None,
) -> DataFrame:
    """Exact-dedup a new batch within itself AND against the corpus
    fingerprint index ``seen`` (a ``fingerprint`` column; None = empty
    corpus). Output matches :func:`exact_dedup`: one row per surviving
    distinct content — ``fingerprint``, ``n_docs`` (batch occurrences),
    ``keep_id`` (min id, the canonical representative).

    Scale: one batch-side shuffle on fingerprint plus an anti join. The
    index side is one slim row per distinct corpus content; store it
    bucketed by fingerprint so only the (small) batch shuffles, and the
    runtime bloom filter prunes index partitions the batch never touches.

    ``prefilter`` (a ``bloom.BloomSpec`` covering a SUPERSET of the
    index's fingerprints) splits the batch before the anti join:
    bloom-NEGATIVE fingerprints cannot be in the index (no false
    negatives) and bypass the join entirely; only the bloom-positive
    fraction — true dups plus the FP rate — shuffles against the index.
    In steady-state ingestion most arrivals are new content, so the
    anti-join input shrinks to roughly the duplicate rate. Result is
    EXACTLY the unfiltered screen (equivalence-tested); correctness
    requires only the superset property, which the streaming ingest
    maintains by committing bloom updates before index appends.
    """
    batch = exact_dedup(new_docs, id_col, text_col)
    if seen is None:
        return batch
    index = seen.select("fingerprint")
    if prefilter is not None:
        from ue_big_data_project_spark.operators.bloom import (
            bloom_might_contain,
        )

        maybe_seen = bloom_might_contain(F.col("fingerprint"), prefilter)
        fresh = batch.where(~maybe_seen)
        suspects = batch.where(maybe_seen)
        return fresh.unionByName(
            suspects.join(index, "fingerprint", "left_anti")
        )
    return batch.join(index, "fingerprint", "left_anti")


def incremental_minhash_filter(
    new_docs: DataFrame,
    index_bands: DataFrame | None,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    batch_bands: DataFrame | None = None,
) -> DataFrame:
    """Near-dup screen of a new batch against the corpus LSH band index
    AND within the batch itself: drops any new document sharing a
    MinHash band with an indexed document or with a lower-id batchmate
    (recall-oriented — candidates are dropped without a verify pass, the
    standard crawl-screening tradeoff; like the pairwise dedup keep-min
    convention, the in-batch screen is greedy, so a chain a~b~c keeps
    only a). Returns surviving (id, band_idx, band_val) rows — distinct
    ids are the kept docs, and the rows are exactly what gets appended
    to the index.

    Two equi joins on (band_idx, band_val) — index screen and in-batch
    screen; the index never rematerializes its documents. Pass
    ``batch_bands`` (rows from :func:`minhash_band_rows` with the SAME
    num_hashes/bands/shingle_n) to reuse an already-computed banding —
    the shingle+minhash aggregation is the dominant screen cost and
    callers that also need the band rows should not pay it twice.
    """
    if batch_bands is None:
        batch_bands = minhash_band_rows(
            new_docs, id_col, text_col, num_hashes, bands, shingle_n
        )
    # In-batch screen first: any id that shares a band with a LOWER id
    # in the same batch is a near-dup of a kept (or earlier-dropped)
    # batchmate. Without this, a batch's internal near-dups would all
    # survive and be appended to the index forever — the asymmetry the
    # exact path never had (exact_dedup collapses in-batch).
    a, b = batch_bands.alias("a"), batch_bands.alias("b")
    in_batch_dups = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") > F.col(f"b.{id_col}")),
            "left_semi",
        )
        .select(id_col)
        .distinct()
    )
    survivors = batch_bands.join(in_batch_dups, id_col, "left_anti")
    if index_bands is None:
        return survivors
    hit_ids = (
        survivors.join(
            index_bands.select("band_idx", "band_val"),
            ["band_idx", "band_val"],
            "left_semi",
        )
        .select(id_col)
        .distinct()
    )
    return survivors.join(hit_ids, id_col, "left_anti")


def update_dedup_index(
    spark,
    new_docs: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Persisted exact-dedup index maintenance: screen ``new_docs``
    against the parquet fingerprint index at ``index_path``, append the
    survivors' fingerprints, and return the survivors (materialized
    BEFORE the append so the batch never screens against itself twice).

    Idempotence note: replaying the same batch after a successful append
    yields zero survivors (all fingerprints are then indexed) — safe
    under at-least-once batch delivery.

    Index existence is probed THROUGH Spark (not the local filesystem),
    so hdfs:///s3a:// index paths behave identically to local ones — a
    local-only probe would silently screen against an empty index on
    remote stores and admit every duplicate.
    """
    from pyspark.errors import AnalysisException

    try:
        seen = spark.read.parquet(index_path)
        seen.schema  # force resolution; missing/empty path raises here
    except AnalysisException:
        seen = None
    survivors = incremental_exact_dedup(new_docs, seen, id_col, text_col)
    survivors = survivors.localCheckpoint(eager=True)
    survivors.select("fingerprint").write.mode("append").parquet(index_path)
    return survivors


# --------------------------------------------------------------------------
# Persisted cluster map + incremental maintenance (round-8 verdict task 4).
# --------------------------------------------------------------------------

_CLUSTER_META = "_cluster_meta.json"


def _comp_bucket(comp_col: str, n_buckets: int):
    return F.pmod(
        F.xxhash64(F.col(comp_col).cast("string")), F.lit(n_buckets)
    ).cast("int")


def write_cluster_map(
    assign: DataFrame,
    path: str,
    node_col: str = "doc_id",
    comp_col: str = "component",
    n_buckets: int = 32,
) -> str:
    """Persist a ``(node, component)`` assignment hash-partitioned BY
    COMPONENT (``_cbucket`` dirs): cluster merges relabel whole
    components, so a component-bucketed layout lets
    :func:`append_cluster_map` rewrite ONLY the buckets whose
    components the increment touches — the bucketed-merge-sink layout
    lever applied to the dedup cluster map. ``n_buckets`` rides a meta
    sidecar (fs seam, object-store-safe) so appends need no
    out-of-band config."""
    import json
    import os

    from ue_big_data_project_spark import fs

    df = assign.select(node_col, comp_col).withColumn(
        "_cbucket", _comp_bucket(comp_col, n_buckets)
    )
    (
        df.repartition(n_buckets, "_cbucket")
        .write.mode("overwrite")
        .partitionBy("_cbucket")
        .parquet(path)
    )
    fs.write_text_atomic(
        os.path.join(path, _CLUSTER_META),
        json.dumps({"n_buckets": n_buckets, "node_col": node_col,
                    "comp_col": comp_col}),
    )
    return path


def read_cluster_map(spark, path: str) -> DataFrame:
    """The current assignment, partition column dropped."""
    return spark.read.parquet(path).drop("_cbucket")


def append_cluster_map(
    spark,
    path: str,
    new_nodes: DataFrame,
    new_edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Fold an increment (new docs + their near-dup pairs, e.g. from
    the :func:`incremental_minhash_filter` screen or a one-sided
    Jaccard probe) into the persisted cluster map WITHOUT re-running
    connected components over the full pair graph.

    Mechanics (``operators/graph.append_components_detail`` does the
    math): the increment contracts against the existing labels, a CC
    over the O(increment)-sized contracted graph produces the bounded
    relabel map, and only the buckets holding (a) relabeled components,
    (b) relabel TARGETS, or (c) fresh rows' components are read and
    rewritten (dynamic partition overwrite — untouched bucket dirs are
    never opened). Result ≡ rebuilding the map from scratch over the
    union graph, test-pinned; cost is O(increment + touched buckets),
    not O(corpus) — re-clustering per crawl increment is the dedup
    pipeline's largest repeated cost, and this removes it.

    Base-map cost per append (round-10 tightening): exactly two
    map-side scans of the persisted map — the endpoint-label
    contraction pass and the new-node overlap pass, both inside
    ``append_components_detail``, both streaming against broadcast
    increment-derived sets — plus the touched-bucket read. The base is
    never shuffled and never broadcast. (Previously the relabel map and
    the fresh set were re-derived by joining the FULL updated
    assignment back against the base — two O(corpus) shuffles per
    append that the detail API eliminates.)

    Returns the (bounded) relabel map ``(_old, _new)`` — callers use it
    to patch any downstream artifacts keyed by cluster id.
    """
    import json
    import os

    from ue_big_data_project_spark import fs
    from ue_big_data_project_spark.operators.graph import (
        append_components_detail,
    )

    meta = json.loads(fs.read_text(os.path.join(path, _CLUSTER_META)))
    n_buckets = int(meta["n_buckets"])
    node_col, comp_col = meta["node_col"], meta["comp_col"]
    base = read_cluster_map(spark, path)
    parts = append_components_detail(
        base,
        new_nodes.select(F.col(new_nodes.columns[0]).alias(node_col))
        if node_col not in new_nodes.columns
        else new_nodes.select(node_col),
        new_edges,
        node_col=node_col,
        comp_col=comp_col,
        src_col=src_col,
        dst_col=dst_col,
    )
    # The bounded relabel + fresh sets decide which buckets rewrite —
    # taken straight from the contraction (bounded by the increment),
    # never re-derived against the base.
    changed = parts.relabel.localCheckpoint(eager=True)
    fresh = parts.fresh.localCheckpoint(eager=True)
    # ONE bounded collect for the touched-bucket set (three separate
    # jobs here cost ~1 s/batch of pure scheduling in the streaming
    # sink).
    touched = {
        int(r["_t"])
        for r in (
            changed.select(F.col("_old").alias("_c"))
            .unionByName(changed.select(F.col("_new").alias("_c")))
            .unionByName(fresh.select(F.col(comp_col).alias("_c")))
            .select(_comp_bucket("_c", n_buckets).alias("_t"))
            .distinct()
            .collect()
        )
    }
    if not touched:
        return changed
    # Rewrite = surviving rows of touched buckets (relabeled where the
    # map says so) + fresh rows, all of which land in touched buckets
    # by construction of the touched set.
    bucket_list = sorted(touched)
    old_rows = spark.read.parquet(path).where(
        F.col("_cbucket").isin(bucket_list)
    ).drop("_cbucket")
    relabeled = (
        old_rows.join(
            F.broadcast(changed.withColumnRenamed("_old", comp_col)),
            comp_col,
            "left",
        )
        .select(
            node_col,
            F.coalesce("_new", F.col(comp_col)).alias(comp_col),
        )
    )
    out = (
        relabeled.unionByName(fresh.select(node_col, comp_col))
        # Crash-window convergence: if a previous append died BETWEEN
        # the dynamic-overwrite commit and the drained-bucket rmtree
        # below, a relabeled node's row survives in both its old and
        # its new bucket. On ledger replay both copies are read here,
        # relabel to the SAME final component (the stale label
        # reconnects through its duplicated edge-endpoint labels in
        # append_components' contraction), and without this dedupe
        # would be written back as permanent duplicate rows. One
        # bounded exchange over touched-bucket rows buys the
        # "replay converges to the rebuild fixpoint" contract.
        .dropDuplicates([node_col])
        .withColumn("_cbucket", _comp_bucket(comp_col, n_buckets))
    )
    out = out.localCheckpoint(eager=True)  # consumed by write + audit
    prev_mode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            out.repartition(max(len(bucket_list), 1), "_cbucket")
            .write.mode("overwrite")
            .partitionBy("_cbucket")
            .parquet(path)
        )
    finally:
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", prev_mode
        )
    # Dynamic overwrite only rewrites partitions PRESENT in the output:
    # a touched bucket drained of every row (all its components
    # relabeled into other buckets) would keep its stale dir and the
    # old rows would resurface on read — clear those explicitly.
    written = {
        int(r["_cbucket"])
        for r in out.select("_cbucket").distinct().collect()
    }
    for b_empty in touched - written:
        fs.rmtree(os.path.join(path, f"_cbucket={b_empty}"))
    return changed


# --------------------------------------------------------------------------
# Persisted one-sided Jaccard probe index (round-9): incremental EXACT
# near-dup pair generation — the pair-generation complement to the
# cluster-map append (the band screen is recall-oriented; this is the
# exact-verify path, incremental).
# --------------------------------------------------------------------------


def _positional_prune(
    pairs: DataFrame, left: str, right: str, threshold: float
) -> DataFrame:
    """PPJoin positional filter over matched prefix rows (lossless).

    ``pairs`` carries one row per matched prefix hash with the ranks
    ``_ia``/``_jb`` of the matched rows in each document's frozen-order
    list and the documents' distinct-shingle counts ``_na``/``_nb``.
    Take the lexicographically MINIMAL matched ``(_ia, _jb)`` per
    ``(left, right)`` pair: every truly-shared shingle has global order
    ≥ the minimum matched hash's (were it smaller, its ranks in both
    documents would precede the minimum and put it inside both
    prefixes, making it an earlier match), so it occupies a rank ≥ _ia
    in A and ≥ _jb in B, giving |A∩B| ≤ 1 + min(n_a−_ia, n_b−_jb).
    J ≥ t requires |A∩B| ≥ t/(1+t)·(n_a+n_b); pairs whose bound cannot
    reach it are dropped BEFORE the full-array verification join. Hash
    collisions only ADD matched rows — the minimum can only move
    earlier, which LOOSENS the bound, so a collision never drops a
    true pair; spurious survivors are rejected by the exact
    verification. The former per-pair ``.distinct()`` becomes a
    groupBy on the same keys — one exchange either way. The 1e-9 nudge
    means float error can only KEEP a borderline pair."""
    return (
        pairs.groupBy(left, right)
        .agg(
            F.min(F.struct("_ia", "_jb")).alias("_m"),
            F.first("_na").alias("_na"),
            F.first("_nb").alias("_nb"),
        )
        .filter(
            F.lit(1)
            + F.least(
                F.col("_na") - F.col("_m._ia"),
                F.col("_nb") - F.col("_m._jb"),
            )
            >= F.lit(threshold / (1.0 + threshold))
            * (F.col("_na") + F.col("_nb"))
            - F.lit(1e-9)
        )
        .select(left, right)
    )


def _jaccard_prefix(
    shh: DataFrame,
    freq: DataFrame,
    id_col: str,
    threshold: float,
) -> DataFrame:
    """PPJoin prefix rows ``(id, _h, _rn, n_sh)`` under the given
    FROZEN global order ``(_df asc, _h asc)`` — unseen hashes take
    _df = 0 (front of the order). ``_rn`` is the row's rank in its
    document's full frozen-order shingle list; persisting it is what
    lets probes run the POSITIONAL filter (:func:`_positional_prune`)
    against index rows without re-ranking the corpus. Losslessness
    needs only a CONSISTENT total order shared by index and probe, not
    true frequencies (the Bayardo/PPJoin prefix theorem holds for any
    fixed order), which is what lets the order freeze at index-build
    time like the IVF quantizer."""
    from pyspark.sql import Window

    ranked = shh.join(freq, "_h", "left").select(
        id_col,
        "_h",
        F.row_number()
        .over(
            Window.partitionBy(id_col).orderBy(
                F.asc(F.coalesce("_df", F.lit(0))), F.asc("_h")
            )
        )
        .alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy(id_col)).alias("n_sh"),
    )
    prefix_len = F.col("n_sh") - F.ceil(
        F.lit(threshold) * F.col("n_sh") - F.lit(1e-9)
    ) + 1
    return ranked.filter(F.col("_rn") <= prefix_len).select(
        id_col, "_h", "_rn", "n_sh"
    )


def write_jaccard_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.8,
    n_buckets: int = 16,
) -> str:
    """Persist the corpus side of the exact-Jaccard pair search: PPJoin
    PREFIX rows hash-partitioned by ``_hbucket = pmod(_h, n_buckets)``
    (the term-sharded ``build_text_index`` layout — probes read only
    the buckets their hashes fall in), the frozen shingle-frequency
    table (same sharding), and the full sorted shingle ARRAYS for exact
    verification. ``<path>_stats`` carries the constants. The frequency
    ORDER freezes here: appends and probes rank with it (df 0 for
    unseen shingles), which keeps the prefix filter lossless forever —
    re-index to re-tighten prefix sizes after heavy drift (a recall-
    neutral, purely perf decision)."""
    sh = shingle_rows(df, id_col, text_col, shingle_n).cache()
    try:
        shh = sh.select(F.col(id_col), F.xxhash64("shingle").alias("_h"))
        freq = shh.groupBy("_h").agg(F.count(F.lit(1)).alias("_df"))
        prefix = _jaccard_prefix(shh, freq, id_col, threshold)
        bucket = F.pmod(F.col("_h"), F.lit(n_buckets)).cast("int")
        root = path.rstrip("/")
        (
            prefix.withColumn("_hbucket", bucket)
            .repartition(n_buckets, "_hbucket")
            .write.mode("overwrite")
            .partitionBy("_hbucket")
            .parquet(root)
        )
        (
            freq.withColumn("_hbucket", bucket)
            .repartition(n_buckets, "_hbucket")
            .write.mode("overwrite")
            .partitionBy("_hbucket")
            .parquet(root + "_freq")
        )
        sets = sh.groupBy(id_col).agg(
            F.sort_array(F.collect_list("shingle")).alias("_arr"),
            F.count(F.lit(1)).alias("n_sh"),
        )
        sets.write.mode("overwrite").parquet(root + "_arrays")
        spark = df.sparkSession
        local_relation(spark, 
            [(shingle_n, float(threshold), n_buckets, id_col)],
            "shingle_n int, threshold double, n_buckets int, id_col string",
        ).write.mode("overwrite").parquet(root + "_stats")
        return root
    finally:
        sh.unpersist()


def append_jaccard_index(
    spark,
    path: str,
    new_docs: DataFrame,
    text_col: str = "text",
) -> None:
    """Append an increment to a :func:`write_jaccard_index` layout:
    shingle the increment ONLY, rank its prefixes under the FROZEN
    order, and append prefix + array rows into the existing partitions.
    The frequency table stays frozen (the quantizer-freeze pattern), so
    the append never scans the corpus."""
    root = path.rstrip("/")
    meta = spark.read.schema(JACCARD_STATS_SCHEMA).parquet(
        root + "_stats"
    ).first()
    id_col, shingle_n = meta["id_col"], int(meta["shingle_n"])
    threshold, n_buckets = float(meta["threshold"]), int(meta["n_buckets"])
    sh = shingle_rows(new_docs, id_col, text_col, shingle_n).cache()
    try:
        shh = sh.select(F.col(id_col), F.xxhash64("shingle").alias("_h"))
        freq = (
            spark.read.schema(JACCARD_FREQ_SCHEMA)
            .parquet(root + "_freq")
            .drop("_hbucket")
        )
        prefix = _jaccard_prefix(shh, freq, id_col, threshold)
        bucket = F.pmod(F.col("_h"), F.lit(n_buckets)).cast("int")
        (
            prefix.withColumn("_hbucket", bucket)
            .repartition("_hbucket")
            .write.mode("append")
            .partitionBy("_hbucket")
            .parquet(root)
        )
        sh.groupBy(id_col).agg(
            F.sort_array(F.collect_list("shingle")).alias("_arr"),
            F.count(F.lit(1)).alias("n_sh"),
        ).write.mode("append").parquet(root + "_arrays")
    finally:
        sh.unpersist()


def jaccard_probe_index(
    spark,
    path: str,
    new_docs: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """One-sided exact-Jaccard pair search: every pair ``(id_a, id_b,
    jaccard ≥ threshold)`` with AT LEAST ONE endpoint in ``new_docs`` —
    probe-vs-index plus probe-vs-probe — without re-shingling the
    corpus. Results are EXACTLY the full :func:`ngram_jaccard_pairs`
    output restricted to increment-incident pairs (equivalence-tested):
    candidates come from the lossless frozen-order prefix join, then
    verify against the exact sorted shingle arrays.

    Scale shape: the probe reads only the ``_hbucket`` partitions its
    prefix hashes fall in (bounded bucket-id collect, the BM25-probe
    idiom); candidate and verify joins are bounded by the increment ×
    matched postings, never corpus × corpus. ``new_docs`` ids must be
    disjoint from the indexed ids."""
    root = path.rstrip("/")
    meta = spark.read.schema(JACCARD_STATS_SCHEMA).parquet(
        root + "_stats"
    ).first()
    id_col, shingle_n = meta["id_col"], int(meta["shingle_n"])
    threshold, n_buckets = float(meta["threshold"]), int(meta["n_buckets"])
    sh = shingle_rows(new_docs, id_col, text_col, shingle_n).cache()
    try:
        shh = sh.select(F.col(id_col), F.xxhash64("shingle").alias("_h"))
        buckets = sorted(
            r.b
            for r in shh.select(
                F.pmod(F.col("_h"), F.lit(n_buckets)).cast("int").alias("b")
            )
            .distinct()
            .collect()
        )
        freq = (
            spark.read.schema(JACCARD_FREQ_SCHEMA)
            .parquet(root + "_freq")
            .filter(F.col("_hbucket").isin(buckets))
            .drop("_hbucket")
        )
        prefix_new = _jaccard_prefix(
            shh, freq, id_col, threshold
        ).localCheckpoint(eager=True)  # feeds cross AND in-batch joins
        index_prefix = spark.read.parquet(root).filter(
            F.col("_hbucket").isin(buckets)
        )
        size_ok = F.least(F.col("a.n_sh"), F.col("b.n_sh")) >= (
            threshold * F.greatest(F.col("a.n_sh"), F.col("b.n_sh"))
        )
        pos_cols = (
            F.col("a._rn").alias("_ia"),
            F.col("b._rn").alias("_jb"),
            F.col("a.n_sh").alias("_na"),
            F.col("b.n_sh").alias("_nb"),
        )
        a, b = prefix_new.alias("a"), index_prefix.alias("b")
        # id inequality guards a contract violation (probe id also in
        # the index) from surfacing as a jaccard-1.0 self-pair.
        # Both candidate sets run the POSITIONAL filter
        # (:func:`_positional_prune`, lossless under the frozen order
        # both sides were ranked with) before the exact-array verify.
        cand_cross = _positional_prune(
            a.join(
                b,
                (F.col("a._h") == F.col("b._h"))
                & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
                & size_ok,
            ).select(
                F.col(f"a.{id_col}").alias("_new"),
                F.col(f"b.{id_col}").alias("_old"),
                *pos_cols,
            ),
            "_new",
            "_old",
            threshold,
        )
        a2, b2 = prefix_new.alias("a"), prefix_new.alias("b")
        cand_batch = _positional_prune(
            a2.join(
                b2,
                (F.col("a._h") == F.col("b._h"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
                & size_ok,
            ).select(
                F.col(f"a.{id_col}").alias("_new"),
                F.col(f"b.{id_col}").alias("_old"),
                *pos_cols,
            ),
            "_new",
            "_old",
            threshold,
        )
        batch_sets = sh.groupBy(id_col).agg(
            F.sort_array(F.collect_list("shingle")).alias("_arr"),
            F.count(F.lit(1)).alias("n_sh"),
        )
        index_sets = spark.read.parquet(root + "_arrays")

        def verify(cand: DataFrame, old_sets: DataFrame) -> DataFrame:
            sa = batch_sets.select(
                F.col(id_col).alias("_new"),
                F.col("_arr").alias("_arr_a"),
                F.col("n_sh").alias("n_a"),
            )
            sb = old_sets.select(
                F.col(id_col).alias("_old"),
                F.col("_arr").alias("_arr_b"),
                F.col("n_sh").alias("n_b"),
            )
            # `sets` sides carry full shingle arrays (corpus-growing):
            # never broadcast them — candidates are the small side.
            j = cand.join(sa, "_new").join(sb, "_old")
            common = F.size(F.array_intersect("_arr_a", "_arr_b"))
            jac = pround(
                common / (F.col("n_a") + F.col("n_b") - common), 4
            )
            return j.select(
                F.least(F.col("_new"), F.col("_old")).alias("id_a"),
                F.greatest(F.col("_new"), F.col("_old")).alias("id_b"),
                jac.alias("jaccard"),
            ).filter(F.col("jaccard") >= threshold)

        out = verify(cand_cross, index_sets).unionByName(
            verify(cand_batch, batch_sets)
        )
        return out.localCheckpoint(eager=True)
    finally:
        sh.unpersist()


def rewrite_cluster_map(spark, path: str, keep_docs: DataFrame) -> int:
    """RETENTION for the persisted cluster map (round-9 verdict
    task 6): keep only the rows whose node id appears in ``keep_docs``
    (single-column frame), rewriting the component-bucketed layout in
    place — the entry point a 100 TB deployment uses to shed expired
    documents, which `append_cluster_map` alone never does (the map
    otherwise only grows).

    Contract — STORAGE shed, not connectivity re-derivation: expired
    docs' edges stay baked into the merged components (components never
    split retroactively), and a component whose min-id doc expires
    keeps its old label (labels are opaque ids to every consumer;
    appends contract against them regardless). Re-deriving connectivity
    without the expired docs is a rebuild, not a prune — the same
    contract as expiring batches under an IVF index's frozen quantizer.

    Offline cost: one scan + one keyed semi join + full-layout rewrite.
    ``keep_docs`` may be corpus-sized, so the join is NOT broadcast.
    Returns the surviving row count."""
    import json
    import os

    from ue_big_data_project_spark import fs

    meta = json.loads(fs.read_text(os.path.join(path, _CLUSTER_META)))
    n_buckets = int(meta["n_buckets"])
    node_col = meta["node_col"]
    comp_col = meta["comp_col"]
    keep = keep_docs.select(
        F.col(keep_docs.columns[0]).alias(node_col)
    ).distinct()
    survivors = (
        spark.read.parquet(path)
        .drop("_cbucket")
        .join(keep, node_col, "left_semi")
        # Materialize BEFORE the overwrite — Spark cannot overwrite a
        # path it is still reading from.
        .localCheckpoint(eager=True)
    )
    n = survivors.count()
    (
        survivors.withColumn("_cbucket", _comp_bucket(comp_col, n_buckets))
        .repartition(n_buckets, "_cbucket")
        .write.mode("overwrite")
        .partitionBy("_cbucket")
        .parquet(path)
    )
    fs.write_text_atomic(
        os.path.join(path, _CLUSTER_META),
        json.dumps(
            {
                "n_buckets": n_buckets,
                "node_col": node_col,
                "comp_col": comp_col,
            }
        ),
    )
    return n


def rewrite_jaccard_index(spark, path: str, keep_docs: DataFrame) -> int:
    """RETENTION for the Jaccard probe index (round-9 verdict task 6):
    drop prefix and exact-verify rows of documents not in ``keep_docs``,
    rewriting the sharded layouts in place. The FROZEN frequency table
    is deliberately left untouched — the order is the freeze, and any
    consistent order stays lossless, so pruning must not move it
    (re-freezing to re-tighten prefixes is a separate, measured rebuild
    decision: :func:`jaccard_index_staleness` + the drift curve in
    ``scripts/jaccard_drift_check.py``).

    Probe equivalence after the prune (test-pinned): probe results ==
    pre-prune results restricted to pairs whose INDEX endpoint
    survives. Returns the surviving prefix-row count."""
    root = path.rstrip("/")
    meta = spark.read.schema(JACCARD_STATS_SCHEMA).parquet(
        root + "_stats"
    ).first()
    id_col, n_buckets = meta["id_col"], int(meta["n_buckets"])
    keep = keep_docs.select(
        F.col(keep_docs.columns[0]).alias(id_col)
    ).distinct()
    prefix = (
        spark.read.parquet(root)
        .join(keep, id_col, "left_semi")
        .localCheckpoint(eager=True)
    )
    n = prefix.count()
    (
        prefix.repartition(n_buckets, "_hbucket")
        .write.mode("overwrite")
        .partitionBy("_hbucket")
        .parquet(root)
    )
    arrays = (
        spark.read.parquet(root + "_arrays")
        .join(keep, id_col, "left_semi")
        .localCheckpoint(eager=True)
    )
    arrays.write.mode("overwrite").parquet(root + "_arrays")
    return n


def jaccard_index_staleness(spark, path: str) -> dict:
    """How much the FROZEN frequency order has degraded as the corpus
    drifted (round-9 verdict task 4 — the quantizer-drift audit applied
    to the Jaccard probe index).

    The prefix filter stays LOSSLESS forever (any consistent total
    order satisfies the Bayardo/PPJoin theorem), but prefix
    SELECTIVITY decays: appends rank unseen shingles df = 0 (the
    most-selective slot), so a shingle that became common after the
    freeze still sits at the front of the order and lands in prefixes,
    inflating candidate counts. This audit recomputes CURRENT document
    frequencies from the exact-verify arrays sidecar (no re-shingling
    — the arrays already hold every doc's shingle set) and compares
    the candidate exposure of the STORED frozen-order prefixes against
    the prefixes a fresh order would pick:

        exposure(prefix set) = Σ_docs Σ_{h ∈ prefix(doc)} (df_now(h) − 1)

    — each prefix posting can pair with every other doc containing the
    shingle, so exposure is the (up-to-dedup) prefix-join candidate
    count. ``staleness_ratio = exposure_frozen / exposure_fresh ≥ ~1``;
    1.0 means the frozen order is still candidate-optimal, and the
    drift curve in ``scripts/jaccard_drift_check.py`` maps the ratio to
    measured probe-candidate inflation (SCALE.md records the rebuild
    threshold). One corpus-size pass over the arrays sidecar — an
    OFFLINE audit/retention decision, not a probe-path cost.
    """
    root = path.rstrip("/")
    meta = spark.read.schema(JACCARD_STATS_SCHEMA).parquet(
        root + "_stats"
    ).first()
    id_col, threshold = meta["id_col"], float(meta["threshold"])
    postings = (
        spark.read.parquet(root + "_arrays")
        .select(id_col, F.explode("_arr").alias("shingle"))
        .select(F.col(id_col), F.xxhash64("shingle").alias("_h"))
    ).localCheckpoint(eager=True)  # feeds df, fresh prefix, exposure
    df_now = postings.groupBy("_h").agg(F.count(F.lit(1)).alias("_df"))
    frozen_prefix = spark.read.parquet(root).drop("_hbucket")
    fresh_prefix = _jaccard_prefix(postings, df_now, id_col, threshold)

    def exposure(prefix: DataFrame) -> int:
        row = (
            prefix.join(df_now, "_h")
            .agg(
                F.sum(F.col("_df") - F.lit(1)).cast("long").alias("_e")
            )
            .first()
        )
        return int(row["_e"] or 0)

    frozen_e, fresh_e = exposure(frozen_prefix), exposure(fresh_prefix)
    return {
        "exposure_frozen": frozen_e,
        "exposure_fresh": fresh_e,
        # +1-smoothed so an all-unique corpus (fresh exposure 0) reads
        # 1.0 only when the frozen order is ALSO collision-free — a
        # plain ratio would mask positive frozen exposure behind a
        # zero-division guard.
        "staleness_ratio": float(frozen_e + 1) / (fresh_e + 1),
    }


# ---------------------------------------------------------------------------
# Span-level (substring) dedup — duplicated n-token SPANS inside docs
# ---------------------------------------------------------------------------
# The fourth dedup granularity: exact/minhash/jaccard/simhash score WHOLE
# documents, but web corpora mostly repeat at the sub-document level
# (boilerplate headers, quoted passages, mirrored paragraphs). Span dedup
# finds every n-token window that also occurs in another document, merges
# overlapping windows into maximal duplicated spans, and can strip those
# spans out, keeping the document's unique remainder — the suffix-array
# substring dedup of Lee et al. 2022 ("Deduplicating Training Data Makes
# Language Models Better"), re-expressed as a positional n-gram join so it
# runs as bounded-key shuffles instead of a distributed suffix array.
#
# Scale shape (100 TB): the only corpus-sized shuffles key on the GRAM
# (inverted-index join, the dedup-family discipline — never all pairs) and
# on the doc id (one window + one agg, same partitioning). Gram strings
# ride the shuffle verbatim so the DuckDB oracle can replay the join
# byte-for-byte; a production deployment would hash them to 64-bit first
# (xxhash64(gram)) and cut shuffle bytes ~5× — same plan, one projection
# swap, exactly the md5-vs-xxhash tradeoff documented in the module header.


def span_gram_rows(
    df: DataFrame, id_col: str, text_col: str, n: int = 5
) -> DataFrame:
    """(id, n_tokens, pos, gram): positional n-token windows.

    ``pos`` is the 0-based index of the window's first token in the
    normalized token stream; a doc with fewer than ``n`` tokens emits no
    rows. One row per window position — unlike :func:`shingle_rows`,
    which set-dedups, positions here are the unit of coverage.
    """
    words = tokens(text_col)
    sized = _spread(df).select(
        F.col(id_col), words.alias("_words"), F.size(words).alias("n_tokens")
    )
    # sequence() DESCENDS when start > stop, so guard short docs to an
    # empty gram list instead of a phantom descending index walk.
    grams = F.when(
        F.col("n_tokens") >= n,
        F.transform(
            F.sequence(F.lit(1), F.col("n_tokens") - n + 1),
            lambda i: F.concat_ws(" ", F.slice("_words", i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return sized.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.posexplode(grams).alias("pos", "gram"),
    )


def duplicated_span_positions(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """(id, pos, n_tokens) — window positions whose gram occurs in at
    least ``min_docs`` distinct documents. The building block both the
    stats and the strip path consume; cached because both traverse it
    (small: only duplicated positions survive the semi join)."""
    occ = span_gram_rows(df, id_col, text_col, n)
    dup = (
        occ.groupBy("gram")
        .agg(F.countDistinct(id_col).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("gram")
    )
    # Inverted-index semi join: occ is scanned twice (df discovery +
    # hit join) — two codegen scans beat caching the full exploded gram
    # table, which is the one corpus-sized intermediate here.
    return occ.join(dup, "gram").select(id_col, "pos", "n_tokens")


def span_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_docs: int = 2,
    hits: DataFrame | None = None,
) -> DataFrame:
    """Maximal duplicated spans: (id, span_start, span_end, n_tokens).

    Gaps-and-islands over the duplicated window positions: window
    [q, q+n) merges into the island of its predecessor [p, p+n) iff
    q − p ≤ n (overlap or exact adjacency — contiguous duplicated text
    is ONE span). ``span_end`` is exclusive. Both the window and the
    per-island agg partition on the doc id — one shuffle, reused.
    """
    from pyspark.sql import Window

    if hits is None:
        hits = duplicated_span_positions(df, id_col, text_col, n, min_docs)
    w = Window.partitionBy(id_col).orderBy("pos")
    is_new = F.when(
        F.col("pos") - F.lag("pos").over(w) <= n, F.lit(0)
    ).otherwise(F.lit(1))  # lag NULL (first row) → otherwise → new island
    return (
        hits.withColumn("_new", is_new)
        .withColumn("_island", F.sum("_new").over(w))
        .groupBy(id_col, "_island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + n).alias("span_end"),
            F.max("n_tokens").alias("n_tokens"),
        )
        .drop("_island")
    )


def span_dedup_docs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document span-dedup report + stripped text, affected docs only.

    Output: id, ``n_dup_spans``, ``dup_tokens`` (tokens covered by ≥1
    duplicated window), ``n_tokens``, ``dup_frac`` (4-dp portable
    round), ``kept_tokens``, ``clean_text`` (the doc with every
    duplicated span removed, single-space re-joined; '' when the whole
    doc is duplicated — dup_frac 1.0). ``dup_tokens + kept_tokens ==
    n_tokens`` by construction.

    The strip is positional: token index t survives iff no duplicated
    window [p, p+n) covers it. Reconstruction collects one doc's kept
    tokens into an array (bounded by the document length — the same
    per-doc bound every text operator here carries), sorts by position,
    and re-joins. Downstream: filter ``dup_frac`` against a corpus
    threshold to drop boilerplate-heavy docs, or swap ``text`` for
    ``clean_text`` to keep their unique remainder.
    """
    hits = duplicated_span_positions(
        df, id_col, text_col, n, min_docs
    ).cache()
    stats = (
        span_duplicate_spans(df, id_col, text_col, n, min_docs, hits=hits)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_dup_spans"),
            F.sum(F.col("span_end") - F.col("span_start"))
            .cast("long")
            .alias("dup_tokens"),
            F.max("n_tokens").alias("n_tokens"),
        )
        .withColumn(
            "dup_frac",
            pround(F.col("dup_tokens") / F.col("n_tokens"), 4),
        )
    )
    covered = hits.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + F.lit(n - 1))
        ).alias("_tokpos"),
    ).distinct()
    tokrows = _spread(df).select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("_tokpos", "_word")
    )
    clean = (
        tokrows.join(covered, [id_col, "_tokpos"], "left_anti")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("kept_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_tokpos", "_word"))),
                    lambda s: s["_word"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )
    return stats.join(clean, id_col, "left").select(
        id_col,
        "n_dup_spans",
        "dup_tokens",
        "n_tokens",
        "dup_frac",
        F.coalesce("kept_tokens", F.lit(0).cast("long")).alias("kept_tokens"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )
