"""Bloom-filter runtime-pruned joins.

The classic 100 TB join technique: when the probe side is huge and the
build side's key set is too large to broadcast as rows but compact as a
bitmap, build a Bloom filter over the build keys and filter the probe
side BEFORE its shuffle. Spark's own InjectRuntimeFilter does this
automatically only for a narrow set of shapes; this operator is the
explicit, composable form.

Spark-first design — no Python in the hot path:

- The filter is BUILT distributed: each build key explodes to ``k``
  (word, bit) pairs (k seeded draws of native ``xxhash64``), a
  ``bit_or`` aggregation folds them into at most
  ``m_bits/64`` words, and only that bounded word table (128 KiB at the
  default 1M bits) is collected — never the keys themselves.
- The filter is PROBED as pure JVM expressions: the dense word array
  rides the plan as ONE array literal, each of the ``k`` probes is an
  ``element_at`` + ``bitwiseAND``, and the whole test stays inside
  whole-stage codegen next to the scan, so pruning happens before any
  shuffle bytes move.
- Bloom false positives only ever ADMIT extra probe rows; the real join
  that follows removes them, so ``bloom_prune_join`` is exactly
  equivalent to the plain join (the oracle for the registry query).

Sizing: with ``k = 7`` hashes, false-positive rate ≈ 0.01 at
``m_bits ≈ 10 ×`` the build-side key count. The default 2²⁰ bits covers
~100k build keys at ~1% FP for a 128 KiB plan literal; scale ``m_bits``
with the build side, not the probe side.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# element_at is 1-based; bit masks for positions 0..63 as a literal
# lookup table (shiftleft needs a literal shift amount, so shifting by a
# column goes through this array instead).
_BIT_MASKS = [1 << j for j in range(63)] + [-(1 << 63)]


@dataclass(frozen=True)
class BloomSpec:
    """A built Bloom filter: dense word array + hashing parameters."""

    words: list[int]  # len == m_bits // 64
    m_bits: int  # power of two
    k: int  # number of probe hashes
    n_items: int | None  # build-side distinct-key count (opt-in, for FP math)
    canonical: bool = True  # keys hashed via canonical string form


def _array_literal(values: list[int]) -> Column:
    """One bigint array literal in ONE py4j round trip (``F.lit`` on a
    Python list makes a py4j call per element)."""
    return F.expr(
        "CAST(array(" + ",".join(map(str, values)) + ") AS array<bigint>)"
    )


def _positions(
    col: Column, m_bits: int, k: int, canonical: bool = True
) -> list[Column]:
    """The k bit positions for a key — identical expressions on the
    build and probe sides. Each probe hashes (key, i) with native
    ``xxhash64`` — k independent draws with no long arithmetic (the
    usual h1 + i*h2 double-hashing overflows, which ANSI mode rejects).
    ``bitwiseAND`` with the power-of-two mask keeps the low bits, which
    are uniform and non-negative even for negative hashes.

    ``canonical=True`` (the safe default) hashes the key's CANONICAL
    STRING form: xxhash64 is type-sensitive (``xxhash64(7::INT) !=
    xxhash64(7::BIGINT)``), so hashing raw columns silently drops every
    match when the build and probe sides carry different key widths — a
    plain equi join would have cast them to a common type. String form
    makes all integer widths (and equal strings) agree; types whose
    canonical strings differ for equal values (``7`` vs ``7.0``) must
    be pre-cast by the caller. ``canonical=False`` skips the cast for
    callers that have PROVEN both sides share one type (the cast is
    ~20% of probe cost on a long key) — :func:`bloom_prune_join` checks
    the two schemas and picks automatically."""
    key = col.cast("string") if canonical else col
    return [
        F.xxhash64(key, F.lit(i)).bitwiseAND(F.lit(m_bits - 1))
        for i in range(k)
    ]


def build_key_bloom(
    df: DataFrame,
    on: str,
    m_bits: int = 1 << 20,
    k: int = 7,
    count_items: bool = False,
    canonical: bool = True,
) -> BloomSpec:
    """Build a Bloom filter over ``df[on]`` distributedly.

    One narrow pass over the build side: key → k positions → (word,
    mask) → ``bit_or`` per word. The shuffle is at most ``m_bits/64``
    groups (map-side combined); the collect is the word table, bounded
    by ``m_bits`` — 128 KiB at the 2²⁰-bit default — independent of the
    build side's row count. ``count_items=True`` adds an exact
    distinct-count job over the build keys (for FP-rate math); off by
    default because it is a second full pass.
    """
    if m_bits & (m_bits - 1) or m_bits < 64:
        raise ValueError(f"m_bits must be a power of two >= 64, got {m_bits}")
    keys = df.select(F.col(on).alias("_k")).where(F.col(on).isNotNull())
    pos = F.explode(
        F.array(*_positions(F.col("_k"), m_bits, k, canonical))
    ).alias("_p")
    words = (
        keys.select(pos)
        .select(
            F.shiftright("_p", 6).alias("_w"),
            F.element_at(
                _array_literal(_BIT_MASKS),
                F.col("_p").bitwiseAND(F.lit(63)).cast("int") + 1,
            ).alias("_m"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_m").alias("_bits"))
        .collect()
    )
    dense = [0] * (m_bits // 64)
    for row in words:
        dense[row["_w"]] = row["_bits"]
    n_items = keys.distinct().count() if count_items else None
    return BloomSpec(
        words=dense, m_bits=m_bits, k=k, n_items=n_items, canonical=canonical
    )


def bloom_might_contain(col: Column, bloom: BloomSpec) -> Column:
    """Native membership test: ``forall`` over the k probe positions,
    each an ``element_at`` + ``bitwiseAND`` against the word-array
    literal. True for every inserted key; true with probability
    ~``(1 - e^(-kn/m))^k`` for absent keys.

    The word array appears in the expression tree exactly ONCE (the
    ``forall`` lambda captures the literal): embedding it per-probe
    multiplies the serialized task binary by k, which at the default
    2²⁰ bits is the difference between ~130 KiB and ~1 MiB of plan
    shipped to every task. The literal is built by PARSING one SQL
    ``array(...)`` expression rather than ``F.lit(list)`` — lit on a
    Python list issues one py4j call per element (seconds at 2¹⁹ bits);
    the parsed form is one call, and constant folding collapses it to a
    single array literal before any task ships."""
    words = _array_literal(bloom.words)
    masks = _array_literal(_BIT_MASKS)
    positions = F.array(
        *_positions(col, bloom.m_bits, bloom.k, bloom.canonical)
    )

    def _hit(p: Column) -> Column:
        word = F.element_at(words, F.shiftright(p, 6).cast("int") + 1)
        mask = F.element_at(masks, p.bitwiseAND(F.lit(63)).cast("int") + 1)
        return word.bitwiseAND(mask) != 0

    return F.forall(positions, _hit)


def bloom_prune_join(
    big: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "inner",
    m_bits: int = 1 << 20,
    k: int = 7,
) -> DataFrame:
    """Equi join with the probe side Bloom-pruned before its shuffle.

    Exactly equivalent to ``big.join(dim, on, how)`` for ``inner`` and
    ``left_semi`` (false positives are admitted past the filter but
    removed by the join; no true match is ever dropped). At 100 TB the
    win is shuffle bytes: probe rows whose keys cannot match never leave
    the scan stage.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"bloom_prune_join supports inner/left_semi, got {how!r}: "
            "outer joins must keep non-matching probe rows"
        )
    # Hash natively when both sides already share one key type (the
    # common case — skips a per-row string cast); fall back to the
    # type-insensitive canonical form on any mismatch. The lookup is
    # case-insensitive like Spark's own resolution (schema[...] is
    # exact-match and would raise on a case-variant name the analyzer
    # accepts); an unresolvable name falls back to canonical and lets
    # the join itself raise the proper error.
    def _key_type(df: DataFrame):
        for fld in df.schema.fields:
            if fld.name.lower() == on.lower():
                return fld.dataType
        return None

    big_t, dim_t = _key_type(big), _key_type(dim)
    canonical = big_t is None or dim_t is None or big_t != dim_t
    bloom = build_key_bloom(dim, on, m_bits=m_bits, k=k, canonical=canonical)
    pruned = big.where(bloom_might_contain(F.col(on), bloom))
    return pruned.join(dim, on, how)


def bloom_union(a: BloomSpec, b: BloomSpec) -> BloomSpec:
    """OR-merge two filters built with identical parameters — the
    property that makes a Bloom filter incrementally maintainable (each
    batch builds its own small filter; the union covers the union of
    the key sets, exactly as if built in one pass)."""
    if (a.m_bits, a.k, a.canonical) != (b.m_bits, b.k, b.canonical):
        raise ValueError(
            "bloom_union requires identical (m_bits, k, canonical): "
            f"{(a.m_bits, a.k, a.canonical)} != {(b.m_bits, b.k, b.canonical)}"
        )
    return BloomSpec(
        words=[x | y for x, y in zip(a.words, b.words)],
        m_bits=a.m_bits,
        k=a.k,
        n_items=None,  # distinct count is not union-mergeable
        canonical=a.canonical,
    )


def save_bloom(spec: BloomSpec, path: str) -> None:
    """Persist a filter as one JSON file via write-temp + atomic rename
    (same marker discipline as the streaming ledger: a reader never sees
    a half-written filter). ~200 KiB at the default 2²⁰ bits."""
    import json
    import os

    from ue_big_data_project_spark import fs

    payload = json.dumps(
        {
            "words": spec.words,
            "m_bits": spec.m_bits,
            "k": spec.k,
            "canonical": spec.canonical,
        }
    )
    fs.makedirs(os.path.dirname(path) or ".")
    fs.write_text_atomic(path, payload)


def load_bloom(path: str) -> BloomSpec | None:
    """Load a persisted filter; None when the file does not exist."""
    import json

    from ue_big_data_project_spark import fs

    if not fs.exists(path):
        return None
    d = json.loads(fs.read_text(path))
    return BloomSpec(
        words=[int(w) for w in d["words"]],
        m_bits=int(d["m_bits"]),
        k=int(d["k"]),
        n_items=None,
        canonical=bool(d["canonical"]),
    )
