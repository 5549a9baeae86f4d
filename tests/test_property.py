"""Hypothesis property tests for the pure-numpy kernels (no Spark)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from entity_deduplication_spark.functions.hashing import (
    _hash_params,
    _minhash_batch,
    _simhash_batch,
)
from entity_deduplication_spark.functions.suffix import (
    build_suffix_array,
    kasai_lcp,
    longest_common_run,
    winnow_fingerprints,
)

_A, _B = _hash_params(128, 42)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 2**61), min_size=1, max_size=200, unique=True))
def test_minhash_permutation_invariant(shingles):
    rng = np.random.default_rng(0)
    perm = list(rng.permutation(shingles))
    sigs = _minhash_batch(pd.Series([shingles, perm]), _A, _B)
    assert np.array_equal(np.asarray(sigs[0]), np.asarray(sigs[1]))


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.integers(0, 2**61), min_size=10, max_size=150, unique=True),
    st.lists(st.integers(0, 2**61), min_size=10, max_size=150, unique=True),
)
def test_minhash_estimate_bounded_error(s1, s2):
    true_j = len(set(s1) & set(s2)) / len(set(s1) | set(s2))
    sigs = _minhash_batch(pd.Series([s1, s2]), _A, _B)
    est = float(np.mean(np.asarray(sigs[0]) == np.asarray(sigs[1])))
    # k=128 -> std <= 0.5/sqrt(128) ~ 0.044; allow 5 sigma
    assert abs(est - true_j) <= 0.25


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 2**61), min_size=1, max_size=100, unique=True))
def test_simhash_self_identical(shingles):
    sigs = _simhash_batch(pd.Series([shingles, list(shingles)]))
    assert int(sigs[0]) == int(sigs[1])


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet="abcdef ", min_size=0, max_size=120))
def test_suffix_array_is_sorted_permutation(s):
    codes = np.frombuffer(s.encode(), dtype=np.uint8).astype(np.int64)
    sa = build_suffix_array(codes)
    assert sorted(sa.tolist()) == list(range(len(s)))
    suffixes = [s[i:] for i in sa]
    assert suffixes == sorted(suffixes)
    lcp = kasai_lcp(codes, sa)
    for i in range(1, len(s)):
        a, b = s[sa[i - 1]:], s[sa[i]:]
        common = 0
        while common < min(len(a), len(b)) and a[common] == b[common]:
            common += 1
        assert lcp[i] == common


@settings(max_examples=30, deadline=None)
@given(
    st.text(alphabet="xyz ", min_size=0, max_size=30),
    st.text(alphabet="abc ", min_size=25, max_size=50),
    st.text(alphabet="uvw ", min_size=0, max_size=30),
)
def test_winnowing_completeness_property(prefix, shared, suffix):
    """Any shared run >= k + w - 1 (= 20) guarantees a shared fingerprint."""
    k, w = 13, 8
    t1, t2 = prefix + shared, shared + suffix
    f1 = set(winnow_fingerprints(t1, k, w).tolist())
    f2 = set(winnow_fingerprints(t2, k, w).tolist())
    assert f1 & f2


@settings(max_examples=30, deadline=None)
@given(
    st.text(alphabet="ab ", min_size=0, max_size=40),
    st.text(alphabet="ab ", min_size=0, max_size=40),
)
def test_lcs_symmetric_and_bounded(a, b):
    r = longest_common_run(a, b)
    assert r == longest_common_run(b, a)
    assert 0 <= r <= min(len(a), len(b))
