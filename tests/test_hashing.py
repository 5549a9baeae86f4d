"""MinHash/SimHash property tests (SURVEY.md §5 unit plan)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from entity_deduplication_spark.functions.hashing import (
    _hash_params,
    _minhash_batch,
    _simhash_batch,
    band_keys,
    minhash_udf,
    simhash_udf,
)


def _jaccard(a: set, b: set) -> float:
    return len(a & b) / len(a | b) if a | b else 0.0


def test_minhash_jaccard_estimate_property():
    """MinHash signature agreement estimates true Jaccard within eps."""
    rng = np.random.default_rng(0)
    a, b = _hash_params(256, 42)
    for overlap in [0.2, 0.5, 0.8, 1.0]:
        n = 400
        shared = rng.integers(0, 2**62, int(n * overlap)).tolist()
        s1 = set(shared) | set(rng.integers(0, 2**62, n - len(shared)).tolist())
        s2 = set(shared) | set(rng.integers(0, 2**62, n - len(shared)).tolist())
        true_j = _jaccard(s1, s2)
        sigs = _minhash_batch(pd.Series([list(s1), list(s2)]), a, b)
        est = float(np.mean(np.asarray(sigs[0]) == np.asarray(sigs[1])))
        assert abs(est - true_j) < 0.12, (overlap, true_j, est)


def test_minhash_identical_sets_identical_sigs():
    a, b = _hash_params(128, 42)
    s = list(np.random.default_rng(1).integers(0, 2**62, 50))
    sigs = _minhash_batch(pd.Series([s, list(reversed(s))]), a, b)
    assert np.array_equal(np.asarray(sigs[0]), np.asarray(sigs[1]))


def test_minhash_empty_set():
    a, b = _hash_params(16, 42)
    sigs = _minhash_batch(pd.Series([[], [1, 2]]), a, b)
    assert all(v == -1 for v in sigs[0])


def test_simhash_hamming_monotonicity():
    """More shared shingles -> smaller Hamming distance (on average)."""
    rng = np.random.default_rng(3)
    base = rng.integers(0, 2**62, 200).tolist()
    dists = []
    for n_repl in [0, 50, 150, 200]:
        other = base[: 200 - n_repl] + rng.integers(0, 2**62, n_repl).tolist()
        sigs = _simhash_batch(pd.Series([base, other]))
        d = bin(int(sigs[0]) ^ int(sigs[1]) & 0xFFFFFFFFFFFFFFFF).count("1")
        dists.append(d)
    assert dists[0] == 0
    assert dists[0] <= dists[1] <= dists[3]


def test_spark_udfs_match_local_kernels(spark):
    data = [([1, 2, 3, 4, 5],), ([9, 8, 7],), ([],)]
    df = spark.createDataFrame(data, "shingles: array<long>")
    got = df.select(
        minhash_udf(32, 42)(F.col("shingles")).alias("mh"),
        simhash_udf(F.col("shingles")).alias("sh"),
    ).collect()
    a, b = _hash_params(32, 42)
    local_mh = _minhash_batch(pd.Series([d[0] for d in data]), a, b)
    local_sh = _simhash_batch(pd.Series([d[0] for d in data]))
    for i in range(3):
        assert list(got[i]["mh"]) == list(local_mh[i])
        assert got[i]["sh"] == int(local_sh[i])


def test_band_keys_shape_and_collision(spark):
    df = spark.createDataFrame(
        [([1] * 128,), ([1] * 128,), (list(range(128)),)], "mh: array<long>"
    )
    rows = df.select(band_keys(F.col("mh"), 16, 8).alias("b")).collect()
    assert len(rows[0]["b"]) == 16
    assert rows[0]["b"] == rows[1]["b"]          # identical sigs -> all bands match
    assert set(rows[0]["b"]).isdisjoint(rows[2]["b"])


@pytest.mark.parametrize("bands,rows", [(16, 8), (32, 4)])
def test_band_keys_partial_match(spark, bands, rows):
    """Signatures agreeing on one full band slice collide on that band only."""
    sig1 = list(range(128))
    sig2 = list(range(rows)) + [x + 1000 for x in range(rows, 128)]
    df = spark.createDataFrame([(sig1,), (sig2,)], "mh: array<long>")
    got = df.select(band_keys(F.col("mh"), bands, rows).alias("b")).collect()
    matches = [i for i in range(bands) if got[0]["b"][i] == got[1]["b"][i]]
    assert matches == [0]
