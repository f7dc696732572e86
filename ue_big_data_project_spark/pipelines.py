"""Composed training-data preparation pipeline.

The end-to-end shape a 100 TB pre-training corpus pass actually runs:
score → quality-filter → content-dedup → token accounting, expressed as
one declarative DataFrame so Catalyst fuses the scoring expressions into
the scan and the only shuffle is the dedup fingerprint group-by. Each
stage is an operator this engine already oracle-checks in isolation
(functions.text, operators.dedup); the pipeline is itself registered and
hash-checked end-to-end (queries.textops.pipeline_prep_documents).

Scale notes: scoring is pure whole-stage-codegen expressions (zero
shuffle); dedup shuffles once on the md5 fingerprint; the canonical-doc
semi join rides the same fingerprint key. Nothing touches the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ue_big_data_project_spark.functions import pround
from ue_big_data_project_spark.functions import text as TX


def prep_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.75,
) -> DataFrame:
    """Quality-filter + exact-dedup + token accounting in one plan.

    Keeps documents scoring ≥ ``min_quality`` whose id is the canonical
    (minimum) id for their normalized-content fingerprint. Output:
    id, quality, n_tokens, n_tokens_bpe, fingerprint.
    """
    scored = docs.select(
        F.col(id_col),
        TX.quality_score(text_col).alias("quality"),
        TX.token_count(text_col).alias("n_tokens"),
        TX.bpe_token_count(text_col).alias("n_tokens_bpe"),
        TX.fingerprint(text_col).alias("fingerprint"),
    ).filter(F.col("quality") >= min_quality)
    canonical = scored.groupBy("fingerprint").agg(
        F.min(id_col).alias("_keep_id")
    )
    return (
        scored.join(
            canonical,
            (scored["fingerprint"] == canonical["fingerprint"])
            & (scored[id_col] == canonical["_keep_id"]),
            "left_semi",
        )
    )


def hash_bucket(col: Column | str, buckets: int = 10_000) -> Column:
    """Deterministic uniform bucket in [0, buckets) from a column value.

    md5-based, so sampling/splitting decisions are reproducible across
    runs, engines, and cluster sizes — unlike ``rand()``/``sampleBy``,
    whose draws depend on partitioning. The first 12 hex digits (48
    bits) are more than enough uniformity for split assignment.
    """
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 12), 16, 10)
    return F.pmod(h.cast("long"), F.lit(buckets))


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    val_pct: int = 5,
    test_pct: int = 5,
) -> DataFrame:
    """Reproducible train/val/test assignment by id hash.

    A document's split NEVER changes as the corpus grows (the hash
    depends only on the id), which is the property that matters for
    contamination control; percentage knobs move the boundaries only.
    """
    b = hash_bucket(id_col, 100)
    return df.withColumn(
        "split",
        F.when(b < val_pct, F.lit("val"))
        .when(b < val_pct + test_pct, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def sample_deterministic(
    df: DataFrame, rate_pct: int, id_col: str = "doc_id"
) -> DataFrame:
    """Keep a reproducible ``rate_pct``% of rows by id hash (a stable
    downsample: the kept set only shrinks/grows at the rate boundary)."""
    return df.filter(hash_bucket(id_col, 100) < rate_pct)


def weighted_sample(
    df: DataFrame, k: int, weight_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministically:
    Efraimidis–Spirakis (A-ES) — each row draws ``key = ln(u) / w``
    with ``u`` an md5-uniform in (0, 1], and the global top-``k`` keys
    are exactly a weight-proportional sample. The log form of the
    classic ``u^(1/w)`` keeps keys well-spread for large weights.

    The "random" draw is the same id-hash discipline as
    :func:`hash_bucket` (48 md5 bits), so the sample is reproducible
    across runs, engines, and cluster sizes — a corpus-mixing decision
    you can audit. Rows with non-positive weight are excluded (they
    have zero sampling mass; this also keeps ``ln(u)/w`` finite).

    Scale: the key is a pure codegen expression and the global top-k is
    ``TakeOrderedAndProject`` (per-partition heaps + one k-row merge),
    never a full sort.
    """
    c = F.col(id_col)
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 12), 16, 10).cast(
        "long"
    )
    u = (h + F.lit(1)) / F.lit(float(16**12 + 1))
    key = pround(F.log(u) / F.col(weight_col).cast("double"), 9)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("wkey", key)
        .orderBy(F.col("wkey").desc(), c.asc())
        .limit(k)
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates_pct: dict[str, int],
    default_pct: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum downsample (e.g. rebalance languages or
    quality tiers in a pre-training mix).

    Each stratum keeps ``rates_pct[stratum]``% of its rows, decided by
    the same id-hash as :func:`sample_deterministic` — so a document's
    keep/drop fate is stable across runs AND across rate changes in
    *other* strata. Pure codegen expressions (the rate table is a
    literal CASE, not a join): zero shuffle, fully pushed into the scan.
    """
    b = hash_bucket(id_col, 100)
    rate: Column = F.lit(default_pct)
    for stratum, pct in sorted(rates_pct.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(pct)).otherwise(rate)
    return df.filter(b < rate)


def temperature_mix(
    df: DataFrame, domain_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Temperature-flattened domain mixing at T = 2 — the standard
    multilingual/multi-domain rebalance (sampling mass ∝ share^(1/T),
    mBERT/XLM-R style): unlike :func:`stratified_sample`, the keep rates
    are DERIVED from the corpus itself, so the mix tracks the data.

    Rates are normalized to the LARGEST domain (kept in full, it defines
    the budget): ``rate_d = sqrt(n_d / n_max)`` — smaller domains keep a
    proportionally larger share, flattening the distribution toward
    uniform. T = 2 is deliberate: IEEE divide and sqrt are correctly
    rounded in every engine, so the double ``rate`` — and therefore the
    integer keep threshold ``floor(rate · 2³²)`` — is bit-identical in
    Spark and any oracle engine, where a ``pow(n, 1/T)``/``exp·ln`` chain
    would be libm-dependent. A document's fate is ``md5('mix:'‖id)`` vs
    the threshold: reproducible across runs, engines, and cluster sizes.

    Returns one row per domain: ``n_total``, ``n_kept``, and the applied
    ``target_permille`` = floor(rate·1000). Two shuffles on the domain
    key (the count pass, then the keep pass); the per-domain rate table
    is broadcast back — never a driver collect.
    """
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n_total"))
    # 1-row global max — broadcast cross join, bounded by construction.
    mx = counts.agg(F.max("n_total").alias("mx"))
    rate = F.sqrt(F.col("n_total").cast("double") / F.col("mx"))
    rated = counts.crossJoin(F.broadcast(mx)).select(
        domain_col,
        "n_total",
        F.floor(rate * F.lit(4294967296.0)).alias("thr"),
        F.floor(rate * F.lit(1000.0)).cast("int").alias("target_permille"),
    )
    k = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("mix:"), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return (
        df.select(F.col(domain_col), k.alias("_mixk"))
        .join(F.broadcast(rated), domain_col)
        .groupBy(domain_col)
        .agg(
            F.max("n_total").alias("n_total"),
            F.sum(
                F.when(F.col("_mixk") < F.col("thr"), 1).otherwise(0)
            ).alias("n_kept"),
            F.max("target_permille").alias("target_permille"),
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget: int = 2048,
    writers: int = 64,
) -> DataFrame:
    """Assign documents to fixed-token-budget training shards
    (concat-and-chunk sequence packing, the standard LLM pre-training
    batch layout: the token stream is conceptually concatenated and cut
    every ``budget`` tokens, ignoring document boundaries).

    Documents hash into ``writers`` independent packing streams; within
    a stream they are ordered by id, a running token sum is folded over
    that order, and ``pack_id`` = ⌊(running_sum − tokens) / budget⌋ is
    the chunk in which the document STARTS. Two flags tell the loader
    which documents cross a cut: ``straddles`` marks any document whose
    last token falls in a later chunk than its first (it must be split
    across packs), and ``oversize`` marks the subset longer than the
    budget itself (spans ⌈tokens/budget⌉ chunks). Packs are therefore
    exactly ``budget`` tokens when straddlers are split at the cut —
    this is NOT greedy first-fit packing, which cannot be expressed as
    a closed-form window and would leave per-pack slack. Both the
    stream assignment and the in-stream order are deterministic, so the
    layout is reproducible on any cluster size.

    Scale: ONE shuffle (hash on the stream key), then a sort within
    each stream partition — ``writers`` bounds the sort width, so size
    it to ~corpus_tokens / (budget × target_packs_per_task). No
    collect, no state: 100 TB packs the same way.
    """
    stream = hash_bucket(id_col, writers).alias("stream")
    w = (
        Window.partitionBy("stream")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = F.sum(token_col).over(w)
    return (
        df.select(F.col(id_col), F.col(token_col), stream)
        .withColumn("_run", run)
        .select(
            id_col,
            token_col,
            "stream",
            F.floor((F.col("_run") - F.col(token_col)) / budget).alias(
                "pack_id"
            ),
            (
                (F.col(token_col) > F.lit(0))
                & (
                    F.floor((F.col("_run") - 1) / budget)
                    > F.floor((F.col("_run") - F.col(token_col)) / budget)
                )
            ).alias("straddles"),
            (F.col(token_col) > budget).alias("oversize"),
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping fixed-token passage chunks —
    the pretokenization step between raw documents and sequence packing
    (and the unit of retrieval indexing): chunk ``i`` covers tokens
    ``[i·stride, i·stride + chunk_tokens)`` with
    ``stride = chunk_tokens − overlap``, so consecutive chunks share
    ``overlap`` tokens and no token is dropped at a boundary.

    Output: ``(id, chunk_idx, chunk_text, n_tokens)``. Entirely native
    expressions (tokenize → ``sequence`` over the chunk count →
    ``slice``/``concat_ws`` → ``posexplode``) — one scan, zero shuffle,
    zero Python; at 100 TB chunking is embarrassingly parallel and this
    keeps it inside whole-stage codegen.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    # Tokens materialize behind a projection before the per-chunk
    # lambda: codegen does not CSE through higher-order functions, so
    # referencing the raw tokens expression inside ``transform`` would
    # re-run the regexp normalization + split once per CHUNK.
    toks = F.col("_toks")
    tokenized = df.select(F.col(id_col), TX.tokens(text_col).alias("_toks"))
    n = F.size(toks)
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.ceil((n - chunk_tokens) / F.lit(float(stride))).cast("int") + 1
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(
            " ", F.slice(toks, i * stride + 1, chunk_tokens)
        ),
    )
    return (
        tokenized.select(F.col(id_col), chunks.alias("_chunks"))
        .select(
            id_col, F.posexplode(F.col("_chunks")).alias("chunk_idx", "chunk_text")
        )
        .withColumn("n_tokens", F.size(F.split(F.col("chunk_text"), " ")))
    )


def contamination_report(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Per-test-document train-set contamination: the fraction of a test
    document's distinct n-gram shingles that appear ANYWHERE in the
    training corpus (the standard decontamination screen run before
    training).

    Inverted-index shape: the train side collapses to DISTINCT shingles
    (one groupBy — at 100 TB this is the big shuffle, keyed on the
    shingle), the test side left-joins against it and aggregates per
    document. No pairwise doc×doc comparison ever happens, so train
    size only affects the distinct-shingle table, not the join fanout.
    Output: test id, n_shingles, n_hit, overlap (4 dp), contaminated.
    """
    from ue_big_data_project_spark.operators.dedup import shingle_rows

    train_sh = shingle_rows(train, id_col, text_col, shingle_n).select(
        "shingle"
    ).distinct()
    test_sh = shingle_rows(test, id_col, text_col, shingle_n).select(
        F.col(id_col), F.col("shingle")
    ).distinct()
    hits = test_sh.join(
        train_sh.withColumn("_hit", F.lit(1)), "shingle", "left"
    )
    return (
        hits.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hit"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_hit",
            pround(F.col("n_hit") / F.col("n_shingles"), 4).alias("overlap"),
            (F.col("n_hit") / F.col("n_shingles") >= threshold).alias(
                "contaminated"
            ),
        )
    )


def corpus_stats(prepped: DataFrame) -> DataFrame:
    """One-row corpus accounting over a prepped corpus: document and
    token totals — the budgeting numbers a training run starts from."""
    return prepped.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_tokens_bpe").alias("total_tokens_bpe"),
    )


def media_dedup_components(
    media: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 2,
    max_band_freq: int | None = None,
) -> DataFrame:
    """The media-dedup leg of :func:`build_corpus`, standalone:
    ``(id, payload)`` image containers (any ``decode_pixels``-supported
    format) → per-image dHash in the Arrow workers → banded pairs at
    ``0 ≤ Hamming ≤ max_hamming`` (``min_hamming=0`` — exact and near
    dups share a cluster) → distributed connected components. Returns
    ``(id, component=min id)``; keep-one-per-cluster is ``id ==
    component``. ``max_band_freq`` forwards the stop-band cap for
    corpora with pathological constant bands (black frames).

    Scale shape: decode+hash never shuffle (one Arrow pass), the pair
    join is the pigeonhole band join (never all-pairs), CC is the
    engine's flagship distributed closer — identical machinery to the
    text near-dup stage, on the image axis."""
    from ue_big_data_project_spark.operators import multimodal as MM

    src = media.select(F.col(id_col).alias("doc_id"), "payload")
    # One decode pass feeds the node set and both pair-join sides.
    h = MM.image_dhash(src).localCheckpoint(eager=True)
    return media_dedup_components_of_hashes(
        h, max_hamming=max_hamming, max_band_freq=max_band_freq
    ).select(F.col("doc_id").alias(id_col), F.col("component"))


def media_dedup_components_of_hashes(
    h: DataFrame,
    max_hamming: int = 2,
    max_band_freq: int | None = None,
) -> DataFrame:
    """Connected components over a (doc_id, dhash_hi, dhash_lo) table —
    the shared PUBLIC leg of :func:`media_dedup_components`,
    :func:`build_corpus`'s media stage, and the dedup_image_clusters /
    pipeline_media_prune bench entries (round-12 advice: one function,
    so the documented oracle equivalence between the pipeline and the
    standalone entries cannot drift by hand-sync).

    Round-12 optimization (guide §2.3 "shuffle fewer bytes" / §8 "move
    decisions to a lightweight proxy"): identical hashes are collapsed
    to their min-id REPRESENTATIVE before any pairing. A clique of n
    exact duplicates contributes C(n,2) rows to a ``min_hamming=0``
    pair list but connectivity needs only its n−1 star edges to the
    group min, and the near-dup band join only needs to run over
    DISTINCT hashes (a cross-group pair exists iff the two HASHES are
    within ``max_hamming``, so one rep↔rep edge carries the whole
    group×group pair block). Measured at sf0.1: 483,006 pair rows →
    ~5k star + rep-pair edges, and the contracted edge set now fits
    :func:`~ue_big_data_project_spark.operators.graph.connected_components`'s
    driver union-find bound instead of the iterative loop. Component
    labels are IDENTICAL (min reachable doc_id over unchanged
    connectivity; oracle-pinned by dedup_image_clusters /
    pipeline_media_prune and
    tests/test_multimodal.py::test_media_components_clique_collapse_
    equals_full_pairs).

    ``max_band_freq`` now counts band values over DISTINCT hashes, not
    documents — strictly harder to trip (an exact-dup pile of black
    frames is ONE distinct hash here), which is the right reading for
    a components consumer: the quadratic all-dups bucket the cap
    existed to bound never enters this band join at all.
    """
    from ue_big_data_project_spark.operators import multimodal as MM
    from ue_big_data_project_spark.operators.graph import (
        connected_components,
    )

    reps = (
        h.groupBy("dhash_hi", "dhash_lo")
        .agg(F.min("doc_id").alias("doc_id"))
        # Feeds the star join AND both band-join sides below.
        .localCheckpoint(eager=True)
    )
    star = (
        h.join(
            reps.select(
                "dhash_hi", "dhash_lo", F.col("doc_id").alias("_rep")
            ),
            ["dhash_hi", "dhash_lo"],
        )
        .where(F.col("doc_id") != F.col("_rep"))
        .select(F.col("_rep").alias("id_a"), F.col("doc_id").alias("id_b"))
    )
    # min_hamming=1 ≡ the old min_hamming=0 here: reps are distinct
    # hashes, so Hamming 0 cannot occur between them.
    rep_pairs = MM.dhash_neardup_pairs(
        reps,
        max_hamming=max_hamming,
        min_hamming=1,
        max_band_freq=max_band_freq,
    ).select("id_a", "id_b")
    return connected_components(
        h.select("doc_id"),
        star.unionByName(rep_pairs),
        node_col="doc_id",
        src_col="id_a",
        dst_col="id_b",
    )


def build_corpus(
    spark,
    docs: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.75,
    langs: tuple[str, ...] | None = None,
    jaccard_threshold: float = 0.8,
    budget: int = 2048,
    writers: int = 64,
    val_pct: int = 5,
    test_pct: int = 5,
    media: DataFrame | None = None,
    media_max_hamming: int = 2,
    media_max_band_freq: int | None = None,
) -> dict:
    """The whole corpus build, end to end: quarantine malformed records,
    language-filter, quality-score, exact-dedup, near-dup-cluster,
    split, and pack — every stage an operator this engine oracle-checks
    in isolation, composed into one run that writes

    - ``{out_dir}/documents`` — surviving docs + metadata, partitioned
      by split (train/val/test prune at the directory level),
    - ``{out_dir}/packs`` — token-budget pack assignments for the
      train split,
    - ``{out_dir}/quarantine`` — expectation-violating records with the
      failed rule names (the dead-letter audit trail).

    Returns the stage-by-stage accounting dict. Counts ride the
    pipeline's own actions where one exists (``observe``), so the audit
    costs no extra scans of the text.

    Scale: the stages share the shuffles they'd pay alone — fingerprint
    group-by (exact dedup), shingle/band equi-joins (near-dup), one
    stream-key shuffle (packing); nothing new is introduced by the
    composition and nothing touches the driver but bounded scalars.
    """
    import os

    from ue_big_data_project_spark.observability import (
        observed,
        split_by_expectations,
    )
    from ue_big_data_project_spark.operators.dedup import ngram_jaccard_pairs
    from ue_big_data_project_spark.operators.graph import connected_components

    stats: dict = {}

    # 1. Expectation gate: dead-letter instead of poisoning the corpus.
    good, bad = split_by_expectations(
        docs,
        {
            "text_present": F.col(text_col).isNotNull(),
            "text_nonempty": F.length(F.trim(F.col(text_col))) > 0,
            "id_present": F.col(id_col).isNotNull(),
        },
    )
    bad_obs, bad_o = observed(bad, {"n": F.count(F.lit(1))})
    bad_obs.write.mode("overwrite").parquet(os.path.join(out_dir, "quarantine"))
    stats["n_quarantined"] = bad_o.get["n"]

    # 2. Language filter (native n-gram heuristic) — optional.
    if langs:
        good = good.filter(TX.langid(text_col).isin(*langs))

    # 3. Quality + exact dedup + token accounting (one plan).
    prepped = prep_documents(
        good, id_col=id_col, text_col=text_col, min_quality=min_quality
    )
    # Near-dup needs the text again: semi-join the survivors back.
    kept_docs = good.join(prepped.select(id_col), id_col, "left_semi")

    # 4. Near-dup clustering: pairs -> components -> keep the min id.
    pairs = ngram_jaccard_pairs(
        kept_docs, id_col, text_col, threshold=jaccard_threshold
    )
    comps = connected_components(
        kept_docs.select(id_col), pairs,
        node_col=id_col, src_col="id_a", dst_col="id_b",
    )
    canonical = comps.filter(F.col(id_col) == F.col("component")).select(id_col)
    # The written corpus carries the TEXT, not just metadata — a layout
    # a loader can train from directly. Metadata joins back on the id.
    final = kept_docs.join(canonical, id_col, "left_semi").join(
        prepped, id_col
    )

    # 4b. OPTIONAL media stage: the text survivors' payloads
    # fingerprint (image dHash, Arrow decode — any decode_pixels
    # container), cluster under banded Hamming + CC, and keep one doc
    # per image cluster — the text near-dup machinery on the image
    # axis. The fingerprints also persist as an fp band index
    # (write_fp_index) so FUTURE increments screen against this
    # corpus's media with O(increment) probes instead of a re-hash
    # (fp_probe_index / fp_index_append — the incremental contract the
    # text stages already have via their own persisted indexes).
    if media is not None:
        from ue_big_data_project_spark.operators.multimodal import (
            image_dhash,
            write_fp_index,
        )

        msrc = media.select(
            F.col(id_col).alias("doc_id"), "payload"
        ).join(
            final.select(F.col(id_col).alias("doc_id")),
            "doc_id",
            "left_semi",
        )
        mh = image_dhash(msrc).localCheckpoint(eager=True)
        mcomps = media_dedup_components_of_hashes(
            mh,
            max_hamming=media_max_hamming,
            max_band_freq=media_max_band_freq,
        ).localCheckpoint(eager=True)  # feeds keep-join + the count
        mkeep = mcomps.filter(
            F.col("doc_id") == F.col("component")
        ).select(F.col("doc_id").alias(id_col))
        stats["n_media_pruned"] = (
            mcomps.filter(F.col("doc_id") != F.col("component")).count()
        )
        final = final.join(mkeep, id_col, "left_semi")
        fp_path = os.path.join(out_dir, "media_fp_index")
        write_fp_index(
            mh.join(
                mkeep.select(F.col(id_col).alias("doc_id")),
                "doc_id",
                "left_semi",
            ),
            fp_path,
            max_hamming=media_max_hamming,
        )
        stats["media_fp_index"] = fp_path

    # 5. Split + write (split is the partition dir -> free pruning).
    assigned = split_assign(
        final, id_col=id_col, val_pct=val_pct, test_pct=test_pct
    )
    out_obs, out_o = observed(
        assigned,
        {
            "n_docs": F.count(F.lit(1)),
            "total_tokens": F.sum("n_tokens"),
            "n_train": F.count_if(F.col("split") == "train"),
        },
    )
    out_obs.write.mode("overwrite").partitionBy("split").parquet(
        os.path.join(out_dir, "documents")
    )
    got = out_o.get
    stats["n_docs"] = got["n_docs"]
    stats["total_tokens"] = got["total_tokens"]
    stats["n_train"] = got["n_train"]

    # 6. Pack the train split into token-budget shards — read back from
    # the table just written (directory-pruned to split=train) instead
    # of re-executing the whole dedup/cluster lineage a second time.
    written = spark.read.parquet(os.path.join(out_dir, "documents"))
    packs = pack_sequences(
        written.filter(F.col("split") == "train"),
        id_col=id_col,
        token_col="n_tokens",
        budget=budget,
        writers=writers,
    )
    packs_path = os.path.join(out_dir, "packs")
    packs.write.mode("overwrite").parquet(packs_path)
    # DISTINCT aggregates aren't allowed in observed metrics; the packs
    # table is id-and-counter metadata (no text), so re-reading it for
    # the exact pack count costs nothing that matters.
    stats["n_packs"] = (
        spark.read.parquet(packs_path)
        .select("stream", "pack_id")
        .distinct()
        .count()
    )
    return stats


def scrub_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_words: int = 3,
    max_doc_freq: int = 1,
) -> DataFrame:
    """Cross-document boilerplate removal (the C4/RefinedWeb "drop
    lines repeated across documents" stage): split each document into
    fixed-width token lines, count each line's DOCUMENT frequency
    across the corpus, drop lines appearing in more than
    ``max_doc_freq`` distinct documents (navigation chrome, license
    footers, templated headers), and report per-document what survived.

    Output: ``(id, n_lines, n_kept, clean_len)`` where ``clean_len`` is
    the character length of the kept lines re-joined in original order
    — the reassembled clean text is computed (order preserved via the
    line position) and summarized rather than returned, keeping the
    result row narrow.

    Scale: three shuffles — line document-frequency (on the line text,
    map-side combined), the frequency join back (same key), and the
    per-document reassembly (on the id). Line texts are the only wide
    shuffle key; at 100 TB hash them first if lines are long (the
    frequency join only needs equality). No Python anywhere.
    """
    # Materialize the token array behind a projection boundary BEFORE
    # the per-line lambda: referencing the raw tokens expression inside
    # ``transform`` re-runs the regexp normalization + split once per
    # LINE (codegen does not CSE through the HOF) — measured 4× slower
    # on ~18-line documents.
    toks = F.col("_toks")
    tokenized = df.select(
        F.col(id_col), TX.tokens(text_col).alias("_toks")
    ).where(F.size(toks) > 0)
    n_lines = F.ceil(F.size(toks) / F.lit(float(line_words))).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.concat_ws(
            " ", F.slice(toks, i * line_words + 1, line_words)
        ),
    )
    # The exploded line table feeds BOTH the frequency count and the
    # keep-join (a diamond): cache it so the tokenize + line-build work
    # runs once, not once per consumer (same reasoning as the shingle
    # cache in dedup.ngram_jaccard_pairs). Storage is the line table
    # itself — the same order as one shuffle of it — and LRU-evicted.
    exploded = (
        tokenized.select(F.col(id_col), lines.alias("_lines"))
        .select(id_col, F.posexplode("_lines").alias("pos", "line"))
        .cache()
    )
    line_df = exploded.groupBy("line").agg(
        F.count_distinct(F.col(id_col)).alias("_df")
    )
    kept_flag = exploded.join(line_df, "line").select(
        id_col,
        "pos",
        "line",
        (F.col("_df") <= max_doc_freq).alias("_keep"),
    )
    return (
        kept_flag.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(F.col("_keep"), 1).otherwise(0))
            .cast("int")
            .alias("n_kept"),
            F.length(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("_keep"),
                                    F.struct(F.col("pos"), F.col("line")),
                                )
                            )
                        ),
                        lambda s: s["line"],
                    ),
                )
            ).alias("clean_len"),
        )
        .withColumnRenamed(id_col, "doc_id")
    )


# Prime modulus for the order fingerprint: 2^31 − 1. Every term is
# reduced mod P before multiplying, so products stay < P² ≈ 4.6e18
# (inside int64); the final sum goes through DECIMAL(38,0) so even a
# 1e11-document shard cannot overflow the accumulator in either engine.
FP_PRIME = 2_147_483_647


def training_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    size_col: str = "n_chars",
    shards: int = 8,
) -> DataFrame:
    """Deterministic global shuffle → per-shard training-export manifest.

    The last mile of a training-data pipeline: the corpus must reach
    the trainer in a reproducible pseudo-random order, cut into shards,
    with a manifest the loader can verify. Both decisions hash the id
    (``md5``), so they are independent of partitioning, cluster size,
    and engine — rerunning on 10 or 10 000 executors produces the SAME
    shards in the SAME order:

    - ``shard`` = :func:`hash_bucket`\\(id, shards) — the first 12 md5
      hex digits mod ``shards``.
    - within-shard order = (md5(id), id) ascending — the "global
      shuffle" readers consume sequentially.
    - ``order_fp`` pins that order END-TO-END without collecting a
      shard anywhere: position-weighted hash
      ``Σ ((pos mod P)·(h mod P) mod P) mod P`` with ``pos`` =
      row_number in shard order, ``h`` = the 48-bit md5 prefix, P =
      ``FP_PRIME``. Any swap, drop, or duplicate changes it; it is
      computed with one window + one agg on the shard key (the same
      single shuffle), so the manifest costs O(corpus) scan, O(shards)
      output at any scale.

    Output: ``(shard, n_docs, total_chars, order_fp)``.
    """
    key = F.md5(F.col(id_col).cast("string"))
    h = F.conv(F.substring(key, 1, 12), 16, 10).cast("long")
    base = df.select(
        F.col(id_col),
        F.col(size_col).alias("_size"),
        key.alias("_key"),
        h.alias("_h"),
        F.pmod(h, F.lit(shards)).alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("_key", id_col)
    pos = F.row_number().over(w).cast("long")
    term = (
        F.pmod(pos, F.lit(FP_PRIME)) * F.pmod(F.col("_h"), F.lit(FP_PRIME))
    ) % FP_PRIME
    return (
        base.withColumn("_term", term)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_size").cast("long").alias("total_chars"),
            (F.sum(F.col("_term").cast("decimal(38,0)")) % FP_PRIME)
            .cast("long")
            .alias("order_fp"),
        )
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    shards: int = 8,
) -> None:
    """Materialize the :func:`training_shards` layout: hive-partitioned
    by ``shard``, every FILE internally sorted by the shuffle order
    (md5(id), id). A shard directory may hold several files (tasks are
    not forced 1:1 onto shards — that would serialize the write);
    readers merge files by the ``_key`` column, which is persisted
    precisely so the merge is a file-local sort-merge, not a re-hash.
    The manifest's ``order_fp`` verifies the result end-to-end."""
    key = F.md5(F.col(id_col).cast("string"))
    (
        df.withColumn("_key", key)
        .withColumn(
            "shard",
            F.pmod(
                F.conv(F.substring(F.col("_key"), 1, 12), 16, 10).cast(
                    "long"
                ),
                F.lit(shards),
            ),
        )
        .repartition(shards, "shard")
        .sortWithinPartitions("shard", "_key", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
# 2023): pick raw-corpus documents that look like a small target domain
# by importance weights over HASHED n-gram bag-of-words features. The
# public method behind "train on Pile-but-Wikipedia-like" mixes; here it
# is a pure DataFrame pipeline (no model, no UDF) whose every number is
# cross-engine deterministic (md5 feature hashing, decimal log-ratio
# sums), so the selection itself is oracle-checkable.
# ---------------------------------------------------------------------------

# Feature-hash space. 10⁴ buckets is the paper's working size; any
# bucketing keeps the estimator consistent (hash collisions only smooth
# the two distributions the same way). Kept small here so the broadcast
# log-ratio table is trivially bounded: the table is ≤ DSIR_BUCKETS rows
# REGARDLESS of corpus size — that invariant is what makes the scoring
# join broadcast-safe at 100 TB.
DSIR_BUCKETS = 1024


def _dsir_features(
    df: DataFrame, id_col: str, text_col: str, extra: list[str]
) -> DataFrame:
    """Exploded hashed unigram+bigram feature rows ``(id, *extra, _b)``.

    One row per feature OCCURRENCE (bag-of-words with multiplicity, the
    paper's estimator). Bucket = first-8-md5-hex of the feature string
    mod :data:`DSIR_BUCKETS` — the same engine-portable hash discipline
    as ``functions.text._hash32``.
    """
    words = F.split(TX.normalize_text(F.col(text_col)), " ")
    base = df.select(
        F.col(id_col), *[F.col(c) for c in extra], words.alias("_w")
    )
    bigrams = F.transform(
        F.slice(
            F.col("_w"), 1, F.greatest(F.size("_w") - 1, F.lit(0))
        ),
        lambda x, i: F.concat(
            x, F.lit(" "), F.element_at(F.col("_w"), i + F.lit(2))
        ),
    )
    feats = base.select(
        id_col,
        *extra,
        F.explode(F.concat(F.col("_w"), bigrams)).alias("_f"),
    )
    b = F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.lit("f:"), F.col("_f"))), 1, 8),
            16,
            10,
        ).cast("long"),
        F.lit(DSIR_BUCKETS),
    )
    return feats.select(id_col, *extra, b.alias("_b"))


def _dsir_counts(
    docs: DataFrame, is_target: Column, id_col: str, text_col: str
) -> DataFrame:
    """The ≤ :data:`DSIR_BUCKETS`-row per-bucket count table
    ``(_b, c_t, c_r)`` — ONE corpus pass serves both distributions via
    a conditional aggregate. The single definition the inline
    estimator, the persisted model, and the staleness audit all share
    (divergence here would silently split their numbers)."""
    feats = _dsir_features(
        docs.withColumn("_t", is_target.cast("int")),
        id_col,
        text_col,
        ["_t"],
    )
    return feats.groupBy("_b").agg(
        F.sum("_t").alias("c_t"), F.count(F.lit(1)).alias("c_r")
    )


def _dsir_ratio(counts: DataFrame, alpha: float) -> DataFrame:
    """Smoothed log-ratio table ``(_b, _lr, _lr0)`` from a count table:
    ``_lr`` per fitted bucket, ``_lr0`` the constant for buckets the
    fit never produced (c_t = c_r = 0) so scorers need no second read.
    Rounded to 9 dp — the determinism point every consumer shares."""
    totals = counts.agg(
        F.sum("c_t").alias("n_t"), F.sum("c_r").alias("n_r")
    )
    a = F.lit(float(alpha))
    ab = F.lit(float(alpha) * DSIR_BUCKETS)
    lr = pround(
        F.log((F.col("c_t") + a) / (F.col("n_t") + ab))
        - F.log((F.col("c_r") + a) / (F.col("n_r") + ab)),
        9,
    )
    lr0 = pround(
        F.log(a / (F.col("n_t") + ab)) - F.log(a / (F.col("n_r") + ab)),
        9,
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "_b", lr.alias("_lr"), lr0.alias("_lr0")
    )


def _dsir_score(
    docs: DataFrame,
    ratio: DataFrame,
    lr0: float,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Per-doc decimal sum of (broadcast-joined) bucket log ratios;
    buckets absent from ``ratio`` take ``lr0``."""
    feats = _dsir_features(docs, id_col, text_col, [])
    return (
        feats.join(F.broadcast(ratio.select("_b", "_lr")), "_b", "left")
        .select(id_col, F.coalesce("_lr", F.lit(lr0)).alias("_lr"))
        .groupBy(id_col)
        .agg(
            pround(
                F.sum(F.col("_lr").cast("decimal(22,9)")).cast("double"),
                6,
            ).alias("logw")
        )
    )


def dsir_logweights(
    docs: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document DSIR log importance weight ``(id, logw)``:
    ``logw(d) = Σ_{f ∈ d} [ln p_target(bucket(f)) − ln p_raw(bucket(f))]``
    over hashed unigram+bigram occurrences, with add-``alpha`` smoothing
    on both categorical distributions. ``is_target`` marks the
    target-domain rows INSIDE ``docs`` (the paper fits p_target on a
    small clean set and p_raw on the whole crawl — one corpus pass
    serves both via a conditional aggregate).

    Scale shape: one feature-bucket shuffle with map-side partial
    aggregation (the count table is ≤ :data:`DSIR_BUCKETS` rows no
    matter the corpus), the log-ratio table broadcasts, and the per-doc
    sum is the only other shuffle. Determinism: each bucket's log ratio
    rounds to 9 dp, per-doc sums accumulate as DECIMAL(22,9) (order-
    free), and the result rounds to 6 dp — the BM25/KL discipline.
    """
    counts = _dsir_counts(docs, is_target, id_col, text_col)
    # lr0 is irrelevant here: every scored feature's bucket is in the
    # count table by construction (same corpus fit both sides).
    return _dsir_score(
        docs, _dsir_ratio(counts, alpha), 0.0, id_col, text_col
    )


def dsir_sample(
    docs: DataFrame,
    is_target: Column,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR selection: top-``k`` documents by Gumbel-perturbed log
    importance weight — exactly sampling WITHOUT replacement from the
    softmax of the importance weights (the Gumbel-top-k trick, the
    paper's resampling step made deterministic): ``gkey = logw +
    Gumbel(md5-uniform of the id)``, global top-k.

    The draw is auditable (a pure function of the document id, same
    discipline as :func:`weighted_sample`) and the global top-k plans
    as ``TakeOrderedAndProject`` — per-partition heaps, one k-row
    merge, never a full sort.
    """
    lw = dsir_logweights(docs, is_target, id_col, text_col, alpha)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("dsir:"), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(0.5)) / F.lit(4294967296.0)
    g = pround(-F.log(-F.log(u)), 9)
    keyed = lw.withColumn("gkey", pround(F.col("logw") + g, 6))
    return keyed.orderBy(
        F.col("gkey").desc(), F.col(id_col).asc()
    ).limit(k)


def leakage_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    val_pct: int = 10,
    test_pct: int = 10,
) -> DataFrame:
    """Near-dup-aware train/val/test split: assign by CLUSTER, not by
    document — ``(id, component, split)`` where ``component`` is the
    connected component of the near-dup pair graph and ``split`` hashes
    the COMPONENT id. Two near-duplicates therefore can never land in
    different splits, the leakage :func:`split_assign` (id-hash) cannot
    rule out: with per-id hashing, a train document's near-twin lands
    in val/test at the background duplicate rate, silently inflating
    eval numbers (the failure GPT-3's dedup post-mortem and The Pile's
    decontamination both call out).

    The split stays stable under corpus growth exactly when the cluster
    structure does: new members of an existing cluster inherit its
    (unchanged) component id; merging two clusters re-draws the merged
    cluster's split — unavoidable under ANY cluster-constant scheme,
    bounded to the merged clusters only.

    Scale: the pair-graph CC is the engine's flagship distributed path
    (``operators.graph.connected_components``); the split itself is a
    pure map-side hash of the component id.
    """
    from ue_big_data_project_spark.operators.graph import (
        connected_components,
    )

    comp = connected_components(
        docs.select(id_col),
        pairs,
        node_col=id_col,
        src_col=src_col,
        dst_col=dst_col,
    )
    b = hash_bucket(F.col("component"), 100)
    return comp.withColumn(
        "split",
        F.when(b < val_pct, F.lit("val"))
        .when(b < val_pct + test_pct, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def write_dsir_model(
    docs: DataFrame,
    is_target: Column,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> str:
    """Persist the DSIR importance model — the ≤ :data:`DSIR_BUCKETS`
    per-bucket count table ``(b, c_t, c_r)`` with the constants
    (alpha, bucket count, id column) recorded as column metadata ON the
    table (one artifact — no counts/params crash window; the
    cms_counters discipline) — so later crawl increments score in
    O(increment)
    (:func:`dsir_score_increment`) without ever re-scanning the corpus
    the model was fit on. The model is TINY by construction (the bucket
    table never exceeds the hash space regardless of corpus size): the
    persisted artifact is kilobytes at 100 TB, and every consumer
    broadcasts it.

    The frozen-state pattern of ``write_jaccard_index`` / the IVF
    quantizer: the distributions freeze at fit time, drift is a
    measurable re-fit decision (:func:`dsir_model_staleness`), and —
    unlike those two — freezing costs no correctness OR recall: scores
    are only ever defined relative to a reference distribution pair.
    """
    counts = _dsir_counts(docs, is_target, id_col, text_col)
    root = path.rstrip("/")
    # Params ride as COLUMN METADATA on the count table itself (the
    # cms_counters discipline) — ONE artifact, so no crash window can
    # leave counts and constants mutually inconsistent the way a
    # counts-dir + params-sidecar pair could (a re-fit with a changed
    # alpha that dies between the two writes would otherwise silently
    # mis-score forever).
    meta = {
        "dsir_alpha": float(alpha),
        "dsir_n_buckets": DSIR_BUCKETS,
        "dsir_id_col": id_col,
    }
    counts.select(
        F.col("_b").alias("_b", metadata=meta), "c_t", "c_r"
    ).coalesce(1).write.mode("overwrite").parquet(root)
    return root


def _dsir_read_model(spark, root: str):
    """(counts DataFrame, alpha, id_col) from a persisted model, with
    the recorded-params guard (the cms_lookup discipline): scoring
    hashes features with the RUNNING code's :data:`DSIR_BUCKETS`, so a
    table that is not a model, carries no recorded params, or was
    recorded under a different bucket count raises driver-side instead
    of silently assigning features to the wrong ratios."""
    counts = spark.read.parquet(root)
    if "_b" not in counts.columns:
        raise ValueError(
            f"{root} is not a write_dsir_model artifact (no _b column)"
        )
    md = counts.schema["_b"].metadata
    if not md or "dsir_alpha" not in md:
        raise ValueError(
            f"{root} is not a write_dsir_model artifact (no recorded "
            "dsir params on the _b column)"
        )
    recorded = int(md["dsir_n_buckets"])
    if recorded != DSIR_BUCKETS:
        raise ValueError(
            f"model at {root} recorded n_buckets={recorded} but this "
            f"build hashes features into DSIR_BUCKETS={DSIR_BUCKETS}; "
            "re-fit the model (scores would be meaningless)"
        )
    return counts, float(md["dsir_alpha"]), str(md["dsir_id_col"])


def dsir_scorer(spark, path: str):
    """One-time scoring handle ``(ratio, lr0, id_col)`` for a frozen
    persisted model: reads + validates the artifact ONCE, materializes
    the ≤ :data:`DSIR_BUCKETS`-row ratio table (localCheckpoint, so
    repeat consumers — every micro-batch of a stream — never re-read
    the parquet), and resolves the unseen-bucket constant. Raises on an
    EMPTY model (zero count rows): every score would be the meaningless
    all-unseen constant."""
    counts, alpha, id_col = _dsir_read_model(spark, path.rstrip("/"))
    ratio = _dsir_ratio(counts, alpha).localCheckpoint(eager=True)
    row = ratio.select("_lr0").first()
    if row is None:
        raise ValueError(
            f"model at {path} is empty (zero count rows) — fit it on a "
            "non-empty corpus"
        )
    return ratio.select("_b", "_lr"), float(row["_lr0"]), id_col


def dsir_score_increment(
    spark,
    path: str,
    new_docs: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Score a crawl increment ``(id, logw)`` against the FROZEN
    persisted model — O(increment): tokenize the increment only, left
    join the broadcast ratio table (buckets unseen at fit time take the
    smoothed zero-count ratio), per-doc decimal sum. The corpus the
    model was fit on is never touched. Looping callers (the streaming
    sink) hold a :func:`dsir_scorer` handle instead, so the artifact
    reads once."""
    ratio, lr0, id_col = dsir_scorer(spark, path)
    return _dsir_score(new_docs, ratio, lr0, id_col, text_col)


def dsir_model_staleness(
    spark,
    path: str,
    docs: DataFrame,
    text_col: str = "text",
) -> dict:
    """Measured re-fit decision for a frozen DSIR model (the
    ``ivf_index_staleness`` / ``jaccard_index_staleness`` symmetry):
    total-variation distance between the model's frozen RAW bucket
    distribution and the current corpus's — ``tv = ½ Σ_b |p_frozen(b) −
    p_now(b)| ∈ [0, 1]``. Near 0: the reference distribution still
    matches reality and re-fitting buys nothing. Large: importance
    scores are ratios against a corpus that no longer exists — re-fit
    (one corpus pass; the model is kilobytes). One bounded pass over
    the current corpus; both bucket tables are ≤ :data:`DSIR_BUCKETS`
    rows and the arithmetic happens driver-side on those rows."""
    counts, _, id_col = _dsir_read_model(spark, path.rstrip("/"))
    frozen = {r["_b"]: r["c_r"] for r in counts.collect()}
    now = {
        r["_b"]: r["n"]
        for r in _dsir_features(docs, id_col, text_col, [])
        .groupBy("_b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_f = sum(frozen.values()) or 1
    n_c = sum(now.values()) or 1
    tv = 0.5 * sum(
        abs(frozen.get(b, 0) / n_f - now.get(b, 0) / n_c)
        for b in set(frozen) | set(now)
    )
    return {
        "tv": tv,
        "n_frozen_feats": n_f,
        "n_current_feats": n_c,
        "n_frozen_buckets": len(frozen),
        "n_current_buckets": len(now),
    }


# Back-compat alias (pre-round-13 private name).
_media_components_of_hashes = media_dedup_components_of_hashes
