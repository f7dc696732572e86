"""Text-analysis column kit — all native expressions (no Python UDFs).

LLM-data-pipeline text operators (language-ID, quality scoring, token
counting, fingerprinting, shingling). Everything is built from
``pyspark.sql.functions`` so it stays in whole-stage codegen and, where a
DuckDB oracle exists, is bit-reproducible cross-engine (md5 + instr-based
hex decoding, exact integer ops).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ue_big_data_project_spark.functions import pround

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Counting is done with word-boundary regexes so any SQL engine
# with regexp support can reproduce it.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "los", "de", "que"],
}


def normalize_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapsed whitespace."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(c), "\\s+", " "))


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.

    md5 is standard across engines (Spark, DuckDB, Trino, Flink), so
    exact-dedup results are oracle-checkable — unlike xxhash/crc32.
    """
    return F.md5(normalize_text(text))


def tokens(text: Column | str) -> Column:
    """Whitespace tokens of the normalized text."""
    return F.split(normalize_text(text), " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def distinct_token_count(text: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def avg_token_length(text: Column | str, scale: int = 4) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    return pround(total.cast("double") / F.size(toks), scale)


def type_token_ratio(text: Column | str, scale: int = 4) -> Column:
    """Lexical diversity: distinct tokens / tokens (a quality signal)."""
    toks = tokens(text)
    return pround(
        F.size(F.array_distinct(toks)).cast("double") / F.size(toks), scale
    )


def punct_ratio(text: Column | str, scale: int = 4) -> Column:
    """Punctuation chars / total chars (boilerplate & garbage signal)."""
    c = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(c) - F.length(F.regexp_replace(c, "[\\.,;:!\\?]", ""))
    return pround(n_punct.cast("double") / F.greatest(F.length(c), F.lit(1)), scale)


def stopword_hits(text: Column | str, lang: str) -> Column:
    """Number of stopword occurrences for one language (word-bounded)."""
    norm = normalize_text(text)
    pat = "\\b(" + "|".join(LANG_STOPWORDS[lang]) + ")\\b"
    return F.coalesce(F.regexp_count(norm, F.lit(pat)), F.lit(0))


def langid(text: Column | str) -> Column:
    """Heuristic language-ID: argmax of per-language stopword hit counts;
    ``und`` (undetermined) when no list scores > 0. Ties break by language
    code order — deterministic and oracle-reproducible."""
    hits = [(lang, stopword_hits(text, lang)) for lang in sorted(LANG_STOPWORDS)]
    best = F.greatest(*[h for _, h in hits])
    out = F.lit("und")
    # Reverse order + when-chains ⇒ earliest language wins ties.
    for lang, h in reversed(hits):
        out = F.when((h == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def quality_score(text: Column | str, scale: int = 4) -> Column:
    """Composite [0,1] quality heuristic: length band + lexical diversity
    + low punctuation. Weights are arbitrary but fixed; the point is the
    *shape* (pure-expression scoring over 100 TB of docs, no UDF)."""
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)
    len_band = F.when((n >= 100) & (n <= 2000), F.lit(1.0)).otherwise(
        F.when(n < 100, n / 100.0).otherwise(F.lit(2000.0) / n)
    )
    diversity = type_token_ratio(text, scale=10)
    low_punct = 1 - F.least(punct_ratio(text, scale=10) * 5, F.lit(1.0))
    return pround((0.4 * len_band + 0.4 * diversity + 0.2 * low_punct), scale)


# BPE-ish subword pre-tokenization regex (GPT-2-style, simplified to the
# RE2-compatible subset so DuckDB/Trino can reproduce it: no lookahead,
# no unicode property classes). Alternatives are ordered longest-first so
# leftmost-first engines (Java regex, RE2) agree on every match.
BPE_SPLIT_PATTERN = "'(?:re|ve|ll|s|t|m|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"


def bpe_token_count(text: Column | str) -> Column:
    """Subword-level token count via the BPE-ish pre-tokenizer regex.

    Counts matches of :data:`BPE_SPLIT_PATTERN` over the normalized text
    — the standard first pass of BPE tokenizers (contractions split off,
    letter runs / digit runs / punctuation runs are separate tokens).
    A cheap, UDF-free proxy for "LLM tokens" good enough for corpus
    budgeting at 100 TB; swap in a real vocab via pandas UDF if exact
    counts are needed.
    """
    return F.coalesce(
        F.regexp_count(normalize_text(text), F.lit(BPE_SPLIT_PATTERN)),
        F.lit(0),
    )


ROLL_MOD = (1 << 61) - 1
_HEX8_POWS = [16**(7 - k) for k in range(8)]


def _hash32(tok: Column) -> Column:
    """Token → 32-bit int: first 8 hex digits of md5, base-16 decoded.

    md5 + base conversion are engine-portable (unlike xxhash64), so
    fingerprints are oracle-checkable bit-for-bit.
    """
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")


def rolling_fingerprint(text: Column | str) -> Column:
    """Order-sensitive document fingerprint (Karp–Rabin-style).

    ``Σᵢ (i+1)·h(tokᵢ) mod (2⁶¹−1)`` with ``h`` = 32-bit md5 prefix:
    positional weights make it order-sensitive (unlike a bag-of-words
    hash), and every term stays < 2⁴⁶ so the BIGINT sum is exact in any
    engine — no overflow, no float drift. Computed entirely with
    higher-order array functions (one pass, no shuffle, no UDF).
    """
    toks = tokens(text)
    terms = F.transform(
        toks, lambda t, i: (i + F.lit(1)).cast("long") * _hash32(t)
    )
    total = F.aggregate(
        terms, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return F.pmod(total, F.lit(ROLL_MOD))


# RE2-compatible (no lookbehind/lookahead) patterns so any engine agrees.
EMAIL_PATTERN = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
URL_PATTERN = "https?://[^\\s]+"


def scrub_pii(text: Column | str) -> Column:
    """Redact emails and URLs with typed placeholder tokens.

    The minimal scrub pass every pre-training corpus gets; placeholders
    (not deletion) preserve token positions for dedup/fingerprint
    stability. Pure regexp_replace — codegen, no UDF.
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(
        F.regexp_replace(c, EMAIL_PATTERN, "<EMAIL>"),
        URL_PATTERN,
        "<URL>",
    )


def pii_counts(text: Column | str) -> tuple[Column, Column]:
    """(email_count, url_count) per document."""
    c = F.col(text) if isinstance(text, str) else text
    return (
        F.coalesce(F.regexp_count(c, F.lit(EMAIL_PATTERN)), F.lit(0)),
        F.coalesce(F.regexp_count(c, F.lit(URL_PATTERN)), F.lit(0)),
    )


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct n-word shingles of the normalized text (order-free set).

    Built with higher-order array functions (``transform`` over a
    ``sequence``), so shingling runs vectorized in the JVM — the scale
    path for MinHash over billions of documents.
    """
    toks = tokens(text)
    # n shifted views of the token array, zipped: shingle i is
    # (toks[i], toks[i+1], …, toks[i+n-1]). The transform lambda below
    # touches ONLY its argument — referencing ``toks`` inside the lambda
    # (the previous form sliced it per index) re-runs the regexp
    # normalization + split once per SHINGLE, because codegen cannot
    # CSE through higher-order-function lambdas; the n slice() calls
    # here all share one CSE'd tokens subtree instead.
    width = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(toks, j + 1, width) for j in range(n)])
    shingled = F.array_distinct(
        F.transform(
            zipped,
            lambda z: F.concat_ws(" ", *[z[str(j)] for j in range(n)]),
        )
    )
    # Guard: docs shorter than n words get an empty shingle set.
    return F.when(F.size(toks) >= n, shingled).otherwise(
        F.array().cast("array<string>")
    )


def gram_hashes(text: Column | str, k: int = 4) -> Column:
    """POSITIONAL k-gram hash sequence: ``array<long>`` where element i
    is the 32-bit hash of tokens ``i..i+k-1`` (1-based, order kept, NOT
    distinct — winnowing needs the positional sequence, unlike the
    order-free sets :func:`word_shingles` feeds to MinHash).

    Same CSE-safe shifted-slice construction as :func:`word_shingles`;
    docs with fewer than k tokens hash to an empty sequence (the slice
    width clamps to 0).
    """
    toks = tokens(text)
    width = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(toks, j + 1, width) for j in range(k)])
    grams = F.transform(
        zipped,
        lambda z: F.concat_ws(" ", *[z[str(j)] for j in range(k)]),
    )
    return F.transform(grams, _hash32)


def winnow_select(hs: Column, w: int = 5) -> Column:
    """Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003) over a positional hash sequence.

    For every window of ``w`` consecutive k-gram hashes, select the
    minimum hash — rightmost position on ties — and return the DISTINCT
    selected ``array<struct<h:long, p:int>>`` (hash, 1-based gram
    position). Guarantee: two documents sharing a token substring of at
    least ``w + k - 1`` tokens share at least one selected hash, while
    only ~``2/(w+1)`` of grams are kept — the standard robust local
    fingerprint for substring-level near-dup detection (a denser, local
    complement to the whole-document :func:`rolling_fingerprint`).

    Pure higher-order array functions — per-document, zero shuffles,
    embarrassingly parallel at 100 TB. Windows are materialized as ``w``
    shifted slices zipped together (CSE-safe, see :func:`word_shingles`),
    so the rightmost-min scan is a fixed w-way ``least`` + CASE chain per
    window, never an O(n·w) re-hash. Sequences shorter than ``w`` (but
    non-empty) winnow to their single global rightmost-min; empty
    sequences to ``[]``.
    """
    n = F.size(hs)
    # Full windows: starts 1..n-w+1 (the n >= w branch).
    swidth = n - (w - 1)
    zipw = F.arrays_zip(*[F.slice(hs, j + 1, swidth) for j in range(w)])

    def pick(z: Column, i: Column) -> Column:
        cells = [z[str(j)] for j in range(w)]
        mh = F.least(*cells)
        case = F.when(cells[w - 1] == mh, F.lit(w - 1))
        for j in range(w - 2, -1, -1):
            case = case.when(cells[j] == mh, F.lit(j))
        return F.struct(
            mh.alias("h"), (i + 1 + case).cast("int").alias("p")
        )

    full = F.transform(zipw, pick)
    # Short docs (1 <= n < w): one global window, rightmost min. The
    # ascending aggregate keeps the LAST element attaining the running
    # min (x.h <= acc.h), i.e. the rightmost tie.
    hp = F.zip_with(
        hs,
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        lambda h, p: F.struct(h.alias("h"), p.cast("int").alias("p")),
    )
    init = F.struct(
        F.lit(1 << 33).cast("long").alias("h"),
        F.lit(0).cast("int").alias("p"),
    )
    best = F.aggregate(
        hp, init, lambda acc, x: F.when(x["h"] <= acc["h"], x).otherwise(acc)
    )
    empty = F.array().cast("array<struct<h:bigint,p:int>>")
    return F.array_distinct(
        F.when(n >= w, full).when(n >= 1, F.array(best)).otherwise(empty)
    )


def winnow_digest(fps: Column) -> Column:
    """Order-invariant digest of selected fingerprints:
    ``Σ h·p mod (2⁶¹−1)`` with a RUNNING mod in the aggregate lambda, so
    the BIGINT accumulator stays exact for ANY document size (each step
    is < 2⁶¹ + 2⁶³⁻¹·ε; the oracle's HUGEINT sum-then-mod agrees because
    ((a mod m) + b) mod m == (a + b) mod m)."""
    return F.aggregate(
        fps,
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(
            acc + x["h"] * x["p"].cast("long"), F.lit(ROLL_MOD)
        ),
    )
