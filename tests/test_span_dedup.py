"""Span-level (substring) dedup — operators.dedup.span_* semantics.

Hand-built corpus with known duplicated passages; every expectation is
derived by hand from the Lee-et-al definition (n-token windows shared
across ≥ min_docs docs, merged into maximal spans, stripped). The
cross-engine value hash runs in tests/test_oracle.py::dedup_span_ngrams;
these pin the operator-level contracts the query composes.
"""

from __future__ import annotations

import pytest

from ue_big_data_project_spark.operators.dedup import (
    span_dedup_docs,
    span_duplicate_spans,
    span_gram_rows,
)

DOCS = [
    # A and B share the 6-token run "alpha beta gamma delta epsilon zeta".
    (0, "alpha beta gamma delta epsilon zeta unique1 unique2"),
    (1, "prefix1 prefix2 alpha beta gamma delta epsilon zeta tail1"),
    # No shared 5-gram with anyone.
    (2, "totally different words here now forever"),
    # Shorter than n: emits no windows at all.
    (3, "tiny doc"),
    # Identical pair: fully duplicated, strip leaves ''.
    (4, "one two three four five six"),
    (5, "one two three four five six"),
    # Two separate duplicated spans with a unique middle.
    (
        6,
        "alpha beta gamma delta epsilon f1 f2 f3 f4 f5 f6 "
        "one two three four five six",
    ),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_gram_rows_positions_and_short_doc_guard(spark, corpus):
    rows = span_gram_rows(corpus, "doc_id", "text", n=5).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 8 tokens → windows at pos 0..3.
    assert sorted(r.pos for r in by_doc[0]) == [0, 1, 2, 3]
    assert by_doc[0][0].n_tokens == 8
    # A doc below n emits nothing (and no descending-sequence phantom).
    assert 3 not in by_doc
    g0 = {r.pos: r.gram for r in by_doc[0]}
    assert g0[0] == "alpha beta gamma delta epsilon"
    assert g0[3] == "delta epsilon zeta unique1 unique2"


def test_spans_merge_overlap_into_maximal_runs(spark, corpus):
    spans = span_duplicate_spans(corpus, "doc_id", "text", n=5).collect()
    got = {(r.doc_id, r.span_start, r.span_end) for r in spans}
    # A: windows 0,1 duplicated → one span [0, 6). B: windows 2,3 → [2, 8).
    assert (0, 0, 6) in got
    assert (1, 2, 8) in got
    # G: two disjoint spans — [0, 5) (alpha run) and [11, 17) (one..six).
    assert (6, 0, 5) in got and (6, 11, 17) in got
    # The unique doc and the short doc never appear.
    assert not any(r.doc_id in (2, 3) for r in spans)


def test_strip_report_counts_and_clean_text(spark, corpus):
    out = {r.doc_id: r for r in span_dedup_docs(corpus, "doc_id", "text").collect()}
    assert set(out) == {0, 1, 4, 5, 6}

    a = out[0]
    assert (a.n_dup_spans, a.dup_tokens, a.n_tokens) == (1, 6, 8)
    assert a.clean_text == "unique1 unique2"
    b = out[1]
    assert (b.dup_tokens, b.kept_tokens) == (6, 3)
    assert b.clean_text == "prefix1 prefix2 tail1"

    # Fully-duplicated docs: frac 1.0, empty remainder.
    for i in (4, 5):
        assert out[i].dup_frac == 1.0
        assert out[i].kept_tokens == 0
        assert out[i].clean_text == ""

    g = out[6]
    assert g.n_dup_spans == 2
    assert g.dup_tokens == 11  # 5 (alpha run) + 6 (one..six)
    assert g.clean_text == "f1 f2 f3 f4 f5 f6"

    # Conservation: every emitted row splits the doc exactly.
    for r in out.values():
        assert r.dup_tokens + r.kept_tokens == r.n_tokens


def test_min_docs_threshold_raises_bar(spark, corpus):
    # The alpha-run grams appear in 3 docs (0, 1, 6) only as the
    # 5-gram at A pos 0 / B pos 2 / G pos 0; "one two three four five"
    # family appears in 3 docs (4, 5, 6). With min_docs=3 the pair-only
    # windows (e.g. "beta gamma delta epsilon zeta", docs 0,1) drop out.
    spans = span_duplicate_spans(
        spark.createDataFrame(DOCS, ["doc_id", "text"]),
        "doc_id",
        "text",
        n=5,
        min_docs=3,
    ).collect()
    got = {(r.doc_id, r.span_start, r.span_end) for r in spans}
    assert (0, 0, 5) in got  # only the 3-doc window survives, span shrinks
    assert (4, 0, 6) in got  # one..six windows are 3-doc, both survive


def test_real_corpus_spans_cover_exact_duplicates(spark, sf_dir):
    """On the testdata corpus, every exact-duplicate group member must
    read as fully duplicated (dup_frac = 1.0)."""
    from ue_big_data_project_spark.operators.dedup import exact_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    groups = exact_dedup(docs, "doc_id", "text").filter("n_docs >= 2")
    dup_fps = {r.fingerprint for r in groups.collect()}
    if not dup_fps:
        pytest.skip("fixture has no exact duplicates")
    report = {r.doc_id: r for r in span_dedup_docs(docs, "doc_id", "text").collect()}
    from ue_big_data_project_spark.functions.text import fingerprint
    import pyspark.sql.functions as F

    members = docs.select("doc_id", fingerprint("text").alias("fp")).filter(
        F.col("fp").isin(list(dup_fps))
    )
    for r in members.collect():
        row = report.get(r.doc_id)
        assert row is not None and row.dup_frac == 1.0
