"""Suffix-array / winnowing kernels vs brute force + hand-computed values."""

import random

import numpy as np

from entity_deduplication_spark.functions.suffix import (
    build_suffix_array,
    common_run_pairs,
    kasai_lcp,
    longest_common_run,
    winnow_fingerprints,
)


def test_suffix_array_banana():
    codes = np.frombuffer(b"banana", dtype=np.uint8).astype(np.int64)
    sa = build_suffix_array(codes)
    assert sa.tolist() == sorted(range(6), key=lambda i: "banana"[i:])
    assert kasai_lcp(codes, sa).tolist() == [0, 1, 3, 0, 0, 2]


def _brute_lcs(a: str, b: str) -> int:
    best = 0
    for i in range(len(a)):
        for j in range(len(b)):
            k = 0
            while i + k < len(a) and j + k < len(b) and a[i + k] == b[j + k]:
                k += 1
            best = max(best, k)
    return best


def test_longest_common_run_brute_force():
    random.seed(1)
    for _ in range(50):
        a = "".join(random.choice("abcab ") for _ in range(random.randint(0, 40)))
        b = "".join(random.choice("abcab ") for _ in range(random.randint(0, 40)))
        assert longest_common_run(a, b) == _brute_lcs(a, b)


def test_common_run_pairs_group():
    ids = ["a", "b", "c"]
    texts = [
        "the quick brown fox jumps",
        "a quick brown fox jumped",
        "nothing in common here!!",
    ]
    pairs = common_run_pairs(ids, texts, min_len=10)
    assert {(p[0], p[1]) for p in pairs} == {("a", "b")}
    assert pairs[0][2] == _brute_lcs(texts[0], texts[1])


def test_winnowing_completeness_guarantee():
    """Every shared run >= k + w - 1 must share a fingerprint."""
    k, w = 13, 8  # guarantee length 20
    random.seed(5)
    for _ in range(30):
        shared = "".join(random.choice("abcdef ") for _ in range(random.randint(20, 35)))
        t1 = "".join(random.choice("uvwxyz ") for _ in range(15)) + shared
        t2 = shared + "".join(random.choice("qrst ") for _ in range(15))
        f1 = set(winnow_fingerprints(t1, k, w).tolist())
        f2 = set(winnow_fingerprints(t2, k, w).tolist())
        assert f1 & f2, (t1, t2)


def test_winnowing_empty_and_short():
    assert winnow_fingerprints("", 13, 8).size == 0
    assert winnow_fingerprints("short", 13, 8).size == 0
