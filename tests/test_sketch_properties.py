"""Property-based checks (hypothesis): every sketch structure must
equal a pure-Python reference implementation on randomized inputs —
the strongest form of the engine-portability claim, since the Python
replicas share NO code with the Spark expressions. Small example
counts — each example runs Spark jobs."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ue_big_data_project_spark.operators import sketch as SK

SET = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _hll_py(values: list[str], p: int) -> dict[int, int]:
    """bucket -> min_term = 2^(R - rho)."""
    m, w = 1 << p, SK.H_BITS - p
    reg: dict[int, int] = {}
    for v in values:
        h = _h48(v)
        bucket, r = h % m, h // m
        rho = (w - r.bit_length() + 1) if r else (w + 1)
        term = 1 << (w + 1 - rho)
        reg[bucket] = min(reg.get(bucket, 1 << (w + 1)), term)
    return reg


strings = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126),
        min_size=1,
        max_size=8,
    ),
    min_size=1,
    max_size=60,
)


@SET
@given(vals=strings, p=st.sampled_from([4, 6]))
def test_hll_registers_match_python_reference(spark, vals, p):
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {
        (r["bucket"], r["min_term"])
        for r in SK.hll_registers(df, [], F.col("v"), p=p).collect()
    }
    want = {(b, t) for b, t in _hll_py(vals, p).items()}
    assert got == want


@SET
@given(vals=strings, k=st.sampled_from([4, 16]))
def test_kmv_sketch_and_estimate_match_python_reference(spark, vals, k):
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    sk = SK.kmv_sketch(df, [], F.col("v"), k=k)
    got = [r["kmin"] for r in sk.collect()][0]
    hashes = sorted({_h48(v) for v in vals})
    assert got == hashes[:k]
    est = SK.kmv_estimate(sk, [], k=k).collect()[0]["est_distinct"]
    if len(hashes) >= k:
        assert est == (k - 1) * SK.H_SPACE // hashes[k - 1]
    else:
        assert est == len(hashes)


@SET
@given(vals=strings, depth=st.sampled_from([2, 3]), width=st.sampled_from([8, 64]))
def test_cms_counters_match_python_reference(spark, vals, depth, width):
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {
        (r["row_idx"], r["bucket"]): r["cnt"]
        for r in SK.cms_counters(
            df, F.col("v"), depth=depth, width=width
        ).collect()
    }
    want: Counter = Counter()
    for v in vals:
        hx = hashlib.md5(v.encode()).hexdigest()
        a, b = int(hx[:8], 16), int(hx[8:16], 16)
        for i in range(depth):
            want[(i, ((a + i * b) % SK.CMS_PRIME) % width)] += 1
    assert got == dict(want)


def _bin_py(v: int, s: int) -> int:
    m = 1 << s
    if v < m:
        return v
    shift = v.bit_length() - 1 - s
    return shift * m + (v >> shift)


longs = st.lists(
    st.one_of(
        st.integers(min_value=0, max_value=300),
        st.integers(min_value=0, max_value=(1 << 42) - 1),
    ),
    min_size=1,
    max_size=80,
)


@SET
@given(vals=longs)
def test_qhist_counters_and_quantiles_match_python_reference(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        (r["bin"], r["cnt"])
        for r in SK.qhist_counters(df, [], F.col("v")).collect()
    }
    want = Counter(_bin_py(v, SK.QH_SUB_BITS) for v in vals)
    assert got == {(b, c) for b, c in want.items()}
    # CDF-walk quantile: lower bound of first bin reaching ceil(qN).
    est = SK.qhist_quantiles(
        SK.qhist_counters(df, [], F.col("v")), [], [("p50", 1, 2)]
    ).collect()[0]["p50"]
    n = len(vals)
    r = (n + 1) // 2
    cum = 0
    for b in sorted(want):
        cum += want[b]
        if cum >= r:
            assert est == SK.qhist_lower_py(b)
            break
    # Exact order statistic through the pruned two-pass path.
    exact = SK.qhist_exact_quantiles(
        df, [], F.col("v"), [("p50", 1, 2)]
    ).collect()[0]["exact_p50"]
    assert exact == sorted(vals)[r - 1]


@SET
@given(
    a_vals=strings,
    b_vals=strings,
    k=st.sampled_from([8, 32]),
)
def test_kmv_set_estimates_match_python_reference(spark, a_vals, b_vals, k):
    a = spark.createDataFrame([(v,) for v in a_vals], "v string")
    b = spark.createDataFrame([(v,) for v in b_vals], "v string")
    got = SK.kmv_set_estimates(
        SK.kmv_sketch(a, [], F.col("v"), k=k),
        SK.kmv_sketch(b, [], F.col("v"), k=k),
        [],
        k=k,
    ).collect()[0]
    sa = sorted({_h48(v) for v in a_vals})[:k]
    sb = sorted({_h48(v) for v in b_vals})[:k]
    union = sorted(set(sa) | set(sb))
    ku = union[:k]
    if len(union) >= k:
        est_u = (k - 1) * SK.H_SPACE // ku[k - 1]
        matches = len(set(ku) & set(sa) & set(sb))
        est_i = matches * est_u // k
    else:
        est_u = len(union)
        est_i = len(set(sa) & set(sb))
    assert got["est_union"] == est_u
    assert got["est_overlap"] == est_i


@SET
@given(
    vals=st.lists(
        st.sampled_from([f"w{i}" for i in range(12)]),
        min_size=4,
        max_size=120,
    ),
    den=st.sampled_from([3, 8, 20]),
)
def test_cms_heavy_hitters_match_python_reference(spark, vals, den):
    """Exact heavy hitters through the CMS pre-filter must equal the
    Python counter-based answer for any value mix and threshold — the
    pre-filter is invisible by construction (one-sided error)."""
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = sorted(
        map(
            tuple,
            SK.cms_heavy_hitters(
                df, F.col("v"), 1, den, depth=3, width=16
            ).collect(),
        )
    )
    thr = (len(vals) + den - 1) // den
    c = Counter(vals)
    want = sorted((v, n) for v, n in c.items() if n >= thr)
    assert got == want


@SET
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=100_000),
            st.integers(min_value=1, max_value=50),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_qhist_weighted_quantiles_match_python_reference(spark, pairs):
    """Weighted counters walk MASS: the estimate must equal the lower
    bound of the first bin whose cumulative weight reaches ceil(q·W),
    per a Python weighted-CDF reference."""
    df = spark.createDataFrame(pairs, "v long, w long")
    cnt = SK.qhist_counters(df, [], F.col("v"), weight=F.col("w"))
    est = SK.qhist_quantiles(
        cnt, [], [("p50", 1, 2), ("p90", 9, 10)]
    ).collect()[0]
    mass: Counter = Counter()
    for v, w in pairs:
        mass[_bin_py(v, SK.QH_SUB_BITS)] += w
    total = sum(w for _, w in pairs)
    for name, num, den in (("p50", 1, 2), ("p90", 9, 10)):
        r = (num * total + den - 1) // den
        cum = 0
        for b in sorted(mass):
            cum += mass[b]
            if cum >= r:
                assert est[name] == SK.qhist_lower_py(b), (name, b)
                break
