"""Distributed multinomial Naive Bayes text classification.

Beyond-reference capability for the training-data-pipeline surface
(SURVEY §2 "beyond-reference" block): the standard cheap trainable
classifier a corpus team runs over a 100 TB crawl — source/domain
attribution, quality-tier scoring against labeled seed sets, topic
routing — the role fastText-style linear classifiers play in public
LLM-data pipelines (e.g. CCNet/GPT-3-style quality filtering), here as
pure DataFrame algebra so training AND scoring distribute without any
Python in the hot path.

Model: multinomial NB with add-α smoothing.

    score(d, l) = ln p(l) + Σ_t tf(d,t) · ln p(t | l)
    p(t | l)    = (c_lt + α) / (n_l + α·V)

Scale contract (100 TB):

- **Training is two shuffles over the tokenized corpus** — per
  ``(label, term)`` counts, then a vocabulary-scale rollup for the
  per-label token totals; label priors are a doc-count aggregate. The
  model is a DataFrame (O(V·L_observed) rows), never a driver-side
  object — persist it with plain parquet and score future batches
  incrementally.
- **Scoring never expands to V×L.** The naive formulation joins every
  document against every (term, label) pair including UNSEEN ones
  (the α-floor terms). But the unseen-term floor factors out:

      ln p(t|l) = ln(α/(n_l+α·V)) + ln((c_lt+α)/α)
                  └── default_l ──┘  └── delta, 0 when c_lt=0 ──┘

  so  score(d,l) = prior_l + dl(d)·default_l + Σ_seen tf·delta(l,t),
  where dl(d) is the document's token count. The Σ runs over an INNER
  join of the doc's postings with the model — rows exist only where
  the label actually saw the term — and the per-label constants ride a
  bounded broadcast (L rows). Fan-out is |postings ⋈ model| + L rows
  per doc, never V·L.
- Tokenization reuses :func:`retrieval.build_postings` (tf-aggregated,
  dl rides along), so scoring cost is |distinct (doc, term)| not
  |tokens|, and the token stream is shared CSE-style with any other
  consumer of the postings.

Determinism (oracle hash-matching, the BM25 discipline): every
per-term and per-label log is rounded at 6 dp (``pround`` — identical
IEEE ops in Spark and DuckDB), combined through exact DECIMAL
arithmetic (α-floor constants multiplied by integer token counts,
partials summed as DECIMAL(18,6)), and the final score is the decimal
total cast back to double and rounded. Argmax ties break on label
ascending, pinned by an explicit (score desc, label asc) comparator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ue_big_data_project_spark.functions import pround
from ue_big_data_project_spark.operators.retrieval import (
    _token_array,
    build_postings,
)


def nb_train(
    docs: DataFrame,
    label_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Train multinomial NB on labeled documents.

    Returns ``(model, labels)``:

    - ``model(label, term, delta)``: per observed (label, term), the
      6-dp-rounded log-count lift ``ln((c_lt + α) / α)`` over the
      label's α-floor — the only per-term quantity scoring needs (see
      module docstring; zero for unseen terms by construction, which
      is why the model can omit them).
    - ``labels(label, prior, unseen)``: per label, the 6-dp-rounded
      log prior ``ln(docs_l / docs_total)`` and α-floor log-prob
      ``unseen = ln(α / (n_l + α·V))``.

    Two corpus-wide shuffles (the (label, term) count and its
    vocabulary rollup); priors aggregate doc counts. V is the corpus
    vocabulary observed across ALL labels, so every label's
    denominator shares one support — the standard multinomial-NB
    convention, and what keeps cross-label scores comparable.
    """
    toks = docs.select(
        F.col(label_col).alias("label"),
        _token_array(text_col).alias("toks"),
    ).select("label", F.explode("toks").alias("term"))
    lab_counts = toks.groupBy("label", "term").agg(
        F.count(F.lit(1)).alias("c_lt")
    )
    lab_tot = lab_counts.groupBy("label").agg(F.sum("c_lt").alias("n_l"))
    vocab = lab_counts.agg(
        F.count_distinct("term").alias("v")
    )
    model = lab_counts.select(
        "label",
        "term",
        pround(
            F.log((F.col("c_lt") + F.lit(alpha)) / F.lit(alpha)), 6
        ).alias("delta"),
    )
    doc_counts = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("docs_l")
    )
    total = docs.agg(F.count(F.lit(1)).alias("docs_total"))
    labels = (
        doc_counts.crossJoin(F.broadcast(total))
        .join(lab_tot, "label", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "label",
            pround(
                F.log(
                    F.col("docs_l").cast("double") / F.col("docs_total")
                ),
                6,
            ).alias("prior"),
            # A label whose docs are all empty has no tokens (n_l
            # null): its floor uses n_l = 0, matching the formula.
            pround(
                F.log(
                    F.lit(alpha)
                    / (
                        F.coalesce(F.col("n_l"), F.lit(0)).cast("double")
                        + F.lit(alpha) * F.col("v")
                    )
                ),
                6,
            ).alias("unseen"),
        )
    )
    return model, labels


def nb_classify(
    docs: DataFrame,
    model: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents against a trained NB model; return the argmax.

    ``(doc_id, pred, score)`` — the winning label per document and its
    6-dp log-posterior (unnormalized). Ties break label-ascending.

    Plan shape: postings INNER JOIN model on term (only label-observed
    terms produce rows) → per-(doc, label) decimal partial sums → the
    per-doc frame (every doc, even zero-token ones) cross-joins the
    BOUNDED label table (L rows, broadcast) and left-joins the
    partials, so a label sharing no terms with a doc still competes at
    its floor score, and an empty document is scored purely on priors.
    One window pass takes the argmax.
    """
    postings, _doclen = build_postings(docs, id_col, text_col)
    partial = (
        postings.join(model, "term")
        .groupBy("doc_id", "label")
        .agg(
            F.sum(
                F.col("delta").cast("decimal(18,6)") * F.col("tf")
            ).alias("s_seen")
        )
    )
    # Token counts come from the postings (dl rides every row — a
    # doc-count-scale rollup), NOT from re-tokenizing the text: the
    # completion frame's docs scan then prunes to the id column alone,
    # so classify pays exactly ONE tokenize+regex pass over the corpus.
    # Zero-token docs have no postings and coalesce to dl = 0.
    doc_len = postings.groupBy("doc_id").agg(F.max("dl").alias("dl"))
    per_doc = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(doc_len, "doc_id", "left")
        .select("doc_id", F.coalesce("dl", F.lit(0)).alias("dl"))
    )
    scored = (
        per_doc.crossJoin(F.broadcast(labels))
        .join(partial, ["doc_id", "label"], "left")
        .select(
            "doc_id",
            "label",
            pround(
                (
                    F.col("prior").cast("decimal(18,6)")
                    + F.col("unseen").cast("decimal(18,6)") * F.col("dl")
                    + F.coalesce(
                        F.col("s_seen"),
                        F.lit(0).cast("decimal(18,6)"),
                    )
                ).cast("double"),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("label").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("doc_id", F.col("label").alias("pred"), "score")
    )


def write_nb_model(
    docs: DataFrame,
    path: str,
    label_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> str:
    """Persist a trained NB model as ONE artifact, so later crawl
    increments classify in O(increment) without re-scanning the corpus
    the model was fit on (the ``write_dsir_model`` discipline).

    Layout: a single parquet table holding BOTH model tables —
    per-(label, term) rows carry ``delta`` with ``prior``/``unseen``
    null; one row per label (``term`` null) carries the label
    constants. One artifact means no crash window can leave term
    weights and label constants mutually inconsistent the way a
    model-dir + labels-sidecar pair could. ``alpha`` and the trained
    column names record as column metadata on ``label`` (the
    cms_counters discipline), so a table that is not an NB model fails
    loudly at read time instead of silently mis-scoring.

    The frozen-state pattern of the IVF quantizer: distributions
    freeze at fit time; drift is a measurable re-fit decision
    (:func:`nb_model_staleness`)."""
    model, labels = nb_train(docs, label_col, id_col, text_col, alpha)
    meta = {
        "nb_alpha": float(alpha),
        "nb_label_col": label_col,
        "nb_text_col": text_col,
    }
    root = path.rstrip("/")
    rows = model.select(
        F.col("label").alias("label", metadata=meta),
        "term",
        "delta",
        F.lit(None).cast("double").alias("prior"),
        F.lit(None).cast("double").alias("unseen"),
    ).unionByName(
        labels.select(
            F.col("label").alias("label", metadata=meta),
            F.lit(None).cast("string").alias("term"),
            F.lit(None).cast("double").alias("delta"),
            "prior",
            "unseen",
        )
    )
    rows.write.mode("overwrite").parquet(root)
    return root


def nb_model_scorer(
    spark, path: str
) -> tuple[DataFrame, DataFrame]:
    """Read + validate a persisted NB model ONCE; return ``(model,
    labels)`` ready for :func:`nb_classify`. The bounded label table
    (L rows) materializes eagerly so looping consumers (every
    micro-batch of a stream) never re-read the artifact for the
    constants; the V×L term table stays a lazy scan — at 100 TB
    vocabulary scale it belongs in the join, not on the driver.
    Raises on a table without the recorded params or with no label
    rows (an empty model would score everything on zeros)."""
    rows = spark.read.parquet(path.rstrip("/"))
    if "label" not in rows.columns or "delta" not in rows.columns:
        raise ValueError(
            f"{path} is not a write_nb_model artifact (missing columns)"
        )
    md = rows.schema["label"].metadata
    if not md or "nb_alpha" not in md:
        raise ValueError(
            f"{path} is not a write_nb_model artifact (no recorded nb "
            "params on the label column)"
        )
    labels = (
        rows.filter(F.col("term").isNull())
        .select("label", "prior", "unseen")
        .localCheckpoint(eager=True)
    )
    if labels.first() is None:
        raise ValueError(
            f"model at {path} has no label rows — fit it on a "
            "non-empty labeled corpus"
        )
    model = rows.filter(F.col("term").isNotNull()).select(
        "label", "term", "delta"
    )
    return model, labels


def nb_classify_increment(
    spark,
    path: str,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Classify a crawl increment against the FROZEN persisted model —
    O(increment): tokenize the increment only, join the persisted term
    table, broadcast the label constants. The corpus the model was fit
    on is never touched. Increment terms unseen at fit time contribute
    zero lift by construction (the α-floor already rides the per-label
    constant), so out-of-vocabulary text degrades gracefully toward
    the priors; monitor OOV mass via :func:`nb_model_staleness`."""
    model, labels = nb_model_scorer(spark, path)
    return nb_classify(new_docs, model, labels, id_col, text_col)


def nb_model_staleness(
    spark, path: str, docs: DataFrame, text_col: str = "text"
) -> dict:
    """Measured re-fit decision for a frozen NB model (the
    ``dsir_model_staleness`` symmetry), two drift observables in one
    increment-scale pass each:

    - ``oov_mass``: fraction of the current corpus's TOKENS whose term
      the model has never seen — unseen terms score as pure α-floor,
      so growing OOV mass means scores degenerate toward priors.
    - ``n_tokens`` / ``n_oov``: the raw counts behind it.

    Near-zero OOV: the frozen vocabulary still covers the stream; set
    a re-fit threshold on the mass, not on time."""
    model, _labels = nb_model_scorer(spark, path)
    vocab = model.select("term").distinct()
    toks = docs.select(
        F.explode(_token_array(text_col)).alias("term")
    )
    row = (
        toks.join(vocab.withColumn("_seen", F.lit(1)), "term", "left")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count_if(F.col("_seen").isNull()).alias("n_oov"),
        )
        .first()
    )
    n = int(row["n_tokens"])
    oov = int(row["n_oov"])
    return {
        "n_tokens": n,
        "n_oov": oov,
        "oov_mass": (oov / n) if n else 0.0,
    }


def nb_self_classify(
    docs: DataFrame,
    label_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """Train on the labeled corpus and score the SAME corpus — the
    source-attribution audit shape (how separable are the crawl
    sources?): ``(doc_id, pred, score, is_correct)``. The train/score
    split is the caller's concern for real held-out evaluation;
    composing the two operators keeps the token stream shared."""
    model, labels = nb_train(docs, label_col, id_col, text_col, alpha)
    out = nb_classify(docs, model, labels, id_col, text_col)
    truth = docs.select(
        F.col(id_col).alias("doc_id"), F.col(label_col).alias("_truth")
    )
    return out.join(truth, "doc_id").select(
        "doc_id",
        "pred",
        "score",
        (F.col("pred") == F.col("_truth")).alias("is_correct"),
    )
