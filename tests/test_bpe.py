"""BPE subword tokenization: merge-table provenance, the three-way
encode equivalence (symbol-list sequential == oracle's paren-replace
chain == classical lowest-rank-priority loop), and the zero-shuffle
counting op."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ue_big_data_project_spark.operators.bpe import (
    bpe_encode_word,
    bpe_token_counts,
    bpe_train_merges,
)
from ue_big_data_project_spark.queries.textops import BPE_MERGES


def _encode_by_replace(word: str, merges) -> int:
    """Pure-Python replay of the ORACLE's semantics: wrap each char as
    (c), then one str.replace per merge in rank order; token count =
    number of '(' left. str.replace is left-to-right non-overlapping,
    exactly DuckDB's replace."""
    s = "".join(f"({c})" for c in word)
    for a, b in merges:
        s = s.replace(f"({a})({b})", f"({a}{b})")
    return s.count("(")


def _encode_by_priority(word: str, merges) -> list[str]:
    """The classical encoder: repeatedly merge the lowest-RANK pair
    present anywhere (all its occurrences, left-to-right), until no
    ranked pair remains."""
    rank = {pair: i for i, pair in enumerate(merges)}
    syms = list(word)
    while len(syms) >= 2:
        present = {
            (syms[i], syms[i + 1]) for i in range(len(syms) - 1)
        } & rank.keys()
        if not present:
            break
        a, b = min(present, key=lambda p: rank[p])
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_merge_table_provenance(spark):
    """The frozen BPE_MERGES constant IS bpe_train_merges' output on
    the sf0.001 documents fixture — retraining must reproduce it
    byte-for-byte (deterministic sample, deterministic tie-break)."""
    from ue_big_data_project_spark.session import load_tables

    d = load_tables(spark, "/root/testdata/sf0.001", ("documents",))[
        "documents"
    ]
    assert tuple(bpe_train_merges(d, n_merges=24)) == BPE_MERGES


@given(
    words=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=10),
        min_size=1,
        max_size=12,
    ),
    probe=st.text(alphabet="abcd", min_size=0, max_size=14),
    n_merges=st.integers(min_value=1, max_value=12),
)
@settings(max_examples=60, deadline=None)
def test_encode_equivalences_on_trained_tables(words, probe, n_merges):
    """For any table the trainer emits (well-formed by construction: a
    derived pair always ranks after the merges that build its
    symbols), the sequential-by-rule encoder, the oracle's
    paren-replace chain, and the classical priority loop agree — on
    the training words AND on unseen probes."""
    from collections import Counter

    counts = Counter(words)
    # Train pure-Python (mirrors bpe_train_merges' driver loop).
    vocab = {tuple(w): c for w, c in counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        merges.append(best)
        a, b = best
        nv = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + c
        vocab = nv

    for w in set(words) | {probe}:
        seq = bpe_encode_word(w, merges)
        assert "".join(seq) == w  # lossless re-spelling
        assert len(seq) == _encode_by_replace(w, merges)
        assert seq == _encode_by_priority(w, merges)


def test_encode_against_frozen_table_examples():
    assert bpe_encode_word("window", list(BPE_MERGES)) == ["window"]
    assert bpe_encode_word("sort", list(BPE_MERGES)) == ["sort"]
    assert bpe_encode_word("stream", list(BPE_MERGES)) == [
        "st",
        "r",
        "e",
        "a",
        "m",
    ]
    # Unseen word: merges still apply wherever their pairs occur.
    assert bpe_encode_word("winter", list(BPE_MERGES)) == [
        "w",
        "in",
        "t",
        "er",
    ]
    assert bpe_encode_word("a", list(BPE_MERGES)) == ["a"]


def test_bpe_token_counts_distributed_matches_pure_python(spark):
    rows = [
        (0, "the window  sorts"),
        (1, "Stream STREAM stream"),
        (2, "a"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"], r["n_chars"])
        for r in bpe_token_counts(df, list(BPE_MERGES)).collect()
    }
    want = {}
    for i, t in rows:
        ws = t.lower().split()
        want[i] = (
            len(ws),
            sum(len(bpe_encode_word(w, list(BPE_MERGES))) for w in ws),
            sum(len(w) for w in ws),
        )
    assert got == want
