"""Arrow-vectorized MinHash / SimHash signature kernels.

The reference has no sketching at all — its "signatures" are exact string
keys (deterministic_feature.py:341-433); MinHash/SimHash generalize its
token/trigram blocking (B8/B9 in SURVEY.md) to web scale. Kernels are
``pandas_udf`` over Arrow record batches: the whole batch is one numpy
matrix op (``np.minimum.reduceat`` over the concatenated shingle stream),
zero per-row Python in the inner loop.

All hash parameters derive from a fixed seed (DedupConfig.minhash_seed) —
fully deterministic across runs/partitions/cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MERSENNE = np.uint64((1 << 61) - 1)  # 2^61-1 prime for (a*x+b) mod p


def _hash_params(k: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=k, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=k, dtype=np.uint64)
    return a, b


def _minhash_batch(shingle_lists: pd.Series, a: np.ndarray, b: np.ndarray) -> pd.Series:
    """MinHash a batch of shingle arrays with one vectorized pass.

    Concatenates every row's shingles into one flat uint64 stream, computes
    the k×total hash matrix in blocks, then segment-mins with
    ``np.minimum.reduceat`` — no per-row python.
    """
    k = len(a)
    lens = shingle_lists.map(len).to_numpy(dtype=np.int64)
    out = np.empty((len(lens), k), dtype=np.int64)
    nonempty = lens > 0
    if nonempty.any():
        flat = np.concatenate(
            [np.asarray(s, dtype=np.int64) for s in shingle_lists[nonempty]]
        ).astype(np.uint64)
        # (a * x + b) mod 2^61-1, in uint64 with lazy modular folding
        hm = (flat[None, :] * a[:, None] + b[:, None])
        hm = (hm & _MERSENNE) + (hm >> np.uint64(61))
        hm = np.where(hm >= _MERSENNE, hm - _MERSENNE, hm)
        offsets = np.concatenate(([0], np.cumsum(lens[nonempty])[:-1]))
        mins = np.minimum.reduceat(hm, offsets, axis=1)  # k × n_nonempty
        out[nonempty] = mins.T.astype(np.int64)
    out[~nonempty] = -1
    return pd.Series(list(out))


def minhash_udf(k: int, seed: int) -> Column:
    """Factory: pandas_udf array<bigint> shingles -> array<bigint> signature."""
    a, b = _hash_params(k, seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _minhash(shingles: pd.Series) -> pd.Series:
        return _minhash_batch(shingles, a, b)

    return _minhash


def _simhash_batch(shingle_lists: pd.Series) -> pd.Series:
    """64-bit SimHash of each shingle array (bit-majority of member hashes)."""
    lens = shingle_lists.map(len).to_numpy(dtype=np.int64)
    out = np.zeros(len(lens), dtype=np.int64)
    nonempty = lens > 0
    if nonempty.any():
        flat = np.concatenate(
            [np.asarray(s, dtype=np.int64) for s in shingle_lists[nonempty]]
        ).astype(np.uint64)
        bits = ((flat[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        contrib = 2 * bits - 1  # ±1 per bit
        offsets = np.concatenate(([0], np.cumsum(lens[nonempty])[:-1]))
        sums = np.add.reduceat(contrib, offsets, axis=0)  # n_nonempty × 64
        sig_bits = (sums > 0).astype(np.uint64)
        sigs = (sig_bits << np.arange(64, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)
        out[nonempty] = sigs.astype(np.int64)
    return pd.Series(out)


@F.pandas_udf(T.LongType())
def simhash_udf(shingles: pd.Series) -> pd.Series:
    return _simhash_batch(shingles)


def text_signature_udf(k: int, seed: int):
    """Fused kernel: shingles -> struct(minhash array<bigint>, simhash
    bigint). One Arrow round trip instead of two — shingle arrays are the
    widest column in the signature stage, so serializing them to Python
    once matters."""
    a, b = _hash_params(k, seed)

    @F.pandas_udf("minhash array<bigint>, simhash bigint")
    def _sig(shingles: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "minhash": _minhash_batch(shingles, a, b),
                "simhash": _simhash_batch(shingles),
            }
        )

    return _sig


def band_keys(minhash_col: Column, bands: int, rows: int) -> Column:
    """Slice a MinHash signature into b bands of r rows; hash each band.

    Returns array<bigint> of length b — pure Catalyst (``slice`` +
    ``xxhash64(concat_ws)``), feeding ``posexplode`` in the blocking stage.
    This is the LSH generalization of the reference's block-key dicts
    (deterministic_feature.py:341-349).
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda i: F.xxhash64(
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(minhash_col, i * rows + 1, rows),
                    lambda v: v.cast("string"),
                ),
            ),
            i,  # band index mixed in so identical row-slices in different bands differ
        ),
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit SimHash signatures (JVM-side)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_prefix(simhash_col: Column, prefix_bits: int) -> Column:
    """Top ``prefix_bits`` of the signature — a Hamming-LSH block key.

    Shifting arithmetic on the raw long; near-duplicates within the
    Hamming radius that differ only in low bits share the block. (For
    full radius coverage the blocking stage unions several bit-rotations.)
    """
    return F.shiftrightunsigned(simhash_col, 64 - prefix_bits)
