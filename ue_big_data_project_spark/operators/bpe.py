"""Byte-pair-encoding (BPE) subword tokenization — deterministic
encode against a SUPPLIED merge table, plus a bounded-sample trainer.

Training-data budgets are counted in SUBWORD tokens, not whitespace
words: packing a 4k-token context window with word counts under- or
over-fills it by whatever the corpus's subword fan-out is, so the
pipeline's accounting ops (packing, quotas, shard manifests) need a
real tokenizer. This module supplies the ENCODE side as a first-class
distributed op and keeps merge-table TRAINING a bounded driver
utility (the Sennrich et al. 2016 greedy pair-count loop over a
deterministic corpus sample — at 100 TB you train the vocabulary once
on a bounded sample and freeze it, exactly like the IVF quantizer or
the DSIR model; re-training per increment would silently re-tokenize
history).

Encode semantics (deterministic, engine-replayable): merges apply in
ascending rank order; each rule replaces its symbol pair left-to-right,
non-overlapping, to exhaustion, before the next rule runs. For any
well-formed merge table (a derived pair always ranks after the merges
that build its symbols — what the trainer emits by construction) this
is equivalent to the classical lowest-rank-pair-first priority loop,
and — the property the oracle leans on — to a chain of plain string
``replace`` calls over a ``(sym)(sym)`` wrapped spelling, so DuckDB
can replay token counts with nested ``replace`` and no recursion.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


BPE_END_MARKER = "</w>"


def bpe_byte_symbols(ch: str) -> list[str]:
    """UTF-8 byte-fallback spelling of one character: ``<0xAB>`` per
    byte — the GPT-2/SentencePiece escape hatch that guarantees EVERY
    character is representable, so unseen unicode never drops tokens
    or maps to a lossy UNK."""
    return [f"<0x{b:02X}>" for b in ch.encode("utf-8")]


def bpe_encode_word(
    word: str,
    merges: list[tuple[str, str]],
    end_marker: str | None = None,
    byte_fallback: bool = False,
    alphabet: set[str] | None = None,
) -> list[str]:
    """Encode one word: character symbols, then each merge rule in
    rank order, left-to-right, non-overlapping, to exhaustion.

    ``end_marker`` appends the sentinel symbol (Sennrich et al. 2016's
    ``</w>``) before merging, so word-final subwords are distinct
    symbols from word-internal ones ("sort" the word vs "sort" the
    prefix of "sorting") — pass the SAME marker the table was trained
    with. ``byte_fallback`` (with the training ``alphabet``) expands
    any character outside the alphabet into its UTF-8 byte symbols
    (:func:`bpe_byte_symbols`) BEFORE merging — every emitted token is
    then either built from training-alphabet symbols or a byte symbol,
    never an out-of-vocabulary surprise, and no input is ever dropped.
    Both options keep the nested-replace oracle replay property: the
    initial spelling changes, the merge mechanics do not."""
    if byte_fallback and alphabet is not None:
        syms = []
        for ch in word:
            if ch in alphabet:
                syms.append(ch)
            else:
                syms.extend(bpe_byte_symbols(ch))
    else:
        syms = list(word)
    if end_marker is not None:
        syms.append(end_marker)
    for a, b in merges:
        if len(syms) < 2:
            break
        out: list[str] = []
        i = 0
        ab = a + b
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(ab)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


BPE_COUNTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_words", T.LongType()),
        T.StructField("n_bpe_tokens", T.LongType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    end_marker: str | None = None,
    byte_fallback: bool = False,
    alphabet: set[str] | None = None,
) -> DataFrame:
    """Per-document subword token accounting: whitespace-normalized
    words (``functions.text.tokens``' convention: lower → collapse →
    split), each encoded with :func:`bpe_encode_word` against the
    broadcast merge table, summed per document.

    Scale shape: ONE ``mapInPandas`` pass, zero shuffles — the merge
    table rides into the workers as a closure constant (kilobytes for
    any real vocabulary), and per-Arrow-batch memoization means each
    DISTINCT word in a batch is encoded once (natural-language batches
    repeat words at Zipf rates, so the amortized cost per row is far
    below one encode per word occurrence). No distinct-vocabulary
    shuffle, no join back — the classic "aggregate the vocab first"
    layout only wins when the encoder is expensive enough to out-cost
    a corpus-wide shuffle, which a merge-table BPE is not."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}

        def n_sub(word: str) -> int:
            n = memo.get(word)
            if n is None:
                n = len(
                    bpe_encode_word(
                        word,
                        merges,
                        end_marker=end_marker,
                        byte_fallback=byte_fallback,
                        alphabet=alphabet,
                    )
                )
                memo[word] = n
            return n

        for pdf in batches:
            n_words, n_tokens, n_chars = [], [], []
            for text in pdf[text_col]:
                words = ("" if text is None else text).lower().split()
                n_words.append(len(words))
                n_tokens.append(sum(n_sub(w) for w in words))
                n_chars.append(sum(len(w) for w in words))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_words": pd.Series(n_words, dtype="int64"),
                    "n_bpe_tokens": pd.Series(n_tokens, dtype="int64"),
                    "n_chars": pd.Series(n_chars, dtype="int64"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        gen, BPE_COUNTS_SCHEMA
    )


def bpe_train_merges(
    df: DataFrame,
    n_merges: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
    sample_limit: int = 100_000,
    end_marker: str | None = None,
) -> list[tuple[str, str]]:
    """Train a merge table on a BOUNDED deterministic corpus sample —
    the driver-side utility that produces the frozen artifact
    :func:`bpe_token_counts` consumes. A corpus within ``sample_limit``
    trains on every document; a larger one keeps a deterministic
    ~``sample_limit``-document hash spread (``xxhash64(id) % ceil(n /
    limit) == 0`` — stable at any cluster size or partitioning, and
    never a corpus-wide sort the way a prefix-by-id bound would plan;
    a hash spread also samples the whole crawl instead of its earliest
    ids). Training is the classical greedy loop: count adjacent symbol
    pairs weighted by word frequency, merge the most frequent (ties
    broken lexicographically so the table is unique), repeat. The
    distinct-word map collected to the driver is vocabulary-sized
    (Heaps-law bounded), never corpus-sized."""
    n_docs = df.count()
    sample = df
    if n_docs > sample_limit:
        stride = -(-n_docs // sample_limit)  # ceil
        sample = df.where(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(stride)) == 0
        )
    words = (
        sample
        .select(F.explode(F.split(F.lower(F.trim(F.regexp_replace(
            text_col, r"\s+", " "))), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {}
    for r in words:
        key = tuple(r["w"]) + (
            (end_marker,) if end_marker is not None else ()
        )
        vocab[key] = vocab.get(key, 0) + int(r["c"])
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        merges.append(best)
        a, b = best
        ab = a + b
        nv: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            nv[key] = nv.get(key, 0) + c
        vocab = nv
    return merges
