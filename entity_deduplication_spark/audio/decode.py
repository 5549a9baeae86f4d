"""Vectorized audio decode + feature-shingle kernels (Arrow pandas_udf).

bytes (WAV container) -> float32 PCM -> framed acoustic features ->
quantized symbols -> hashed k-shingles. One Arrow batch at a time; the
per-clip work is numpy (rfft, reduceat) — no row-at-a-time Python UDFs.

These are the audio analogues of the reference's normalize_* preprocessing
(preprocessing.py:150-199): deterministic derived columns that downstream
blocking keys are built from.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from entity_deduplication_spark.audio.wav import decode_wav

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


@F.pandas_udf(T.ArrayType(T.FloatType()))
def decode_pcm_udf(raw: pd.Series) -> pd.Series:
    """WAV bytes -> float32 PCM array (the per-row fidelity surface)."""
    return raw.map(lambda b: decode_wav(b)[0] if b is not None else None)


def _frame_features(
    pcm: np.ndarray, sr: int, frame_ms: int, hop_ms: int
) -> np.ndarray:
    """Per-frame feature matrix: [log-energy, zcr, 4 spectral band ratios]."""
    flen = max(int(sr * frame_ms / 1000), 2)
    hop = max(int(sr * hop_ms / 1000), 1)
    if len(pcm) < flen:
        pcm = np.pad(pcm, (0, flen - len(pcm)))
    n_frames = 1 + (len(pcm) - flen) // hop
    idx = np.arange(flen)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = pcm[idx]  # n_frames × flen
    energy = np.log10(np.mean(frames**2, axis=1) + 1e-10)
    zcr = np.mean(np.abs(np.diff(np.signbit(frames), axis=1)), axis=1)
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    nb = spec.shape[1]
    bands = np.stack(
        [spec[:, i * nb // 4 : (i + 1) * nb // 4].sum(axis=1) for i in range(4)],
        axis=1,
    )
    bands = bands / (bands.sum(axis=1, keepdims=True) + 1e-10)
    return np.column_stack([energy, zcr, bands])


def _quantize(feats: np.ndarray, levels: int) -> np.ndarray:
    """Quantize features to symbols, gain-invariantly.

    Energy is z-normalized per clip (kills ±3 dB re-encode gain); other
    features are scale-free already. Each frame's symbol packs all
    quantized features into one int64.
    """
    f = feats.copy()
    mu, sd = f[:, 0].mean(), f[:, 0].std() + 1e-9
    f[:, 0] = (f[:, 0] - mu) / sd / 4 + 0.5  # ~[0,1]
    f[:, 1] = f[:, 1] * 2  # zcr in [0,~0.5] -> [0,1]
    q = np.clip((f * levels).astype(np.int64), 0, levels - 1)
    sym = np.zeros(len(q), dtype=np.int64)
    for j in range(q.shape[1]):
        sym = sym * levels + q[:, j]
    return sym


def _shingle_hash(sym: np.ndarray, k: int) -> np.ndarray:
    """Hashed k-shingles of a symbol sequence (vectorized FNV-1a-style)."""
    if len(sym) < k:
        sym = np.pad(sym, (0, k - len(sym)), constant_values=-1)
    n = len(sym) - k + 1
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    s = sym.astype(np.uint64)
    for j in range(k):
        h = (h ^ s[j : j + n]) * _FNV_PRIME
    return np.unique(h.astype(np.int64))


def audio_shingles_udf(frame_ms: int, hop_ms: int, k: int, levels: int):
    """Factory: pandas_udf (bytes) -> array<bigint> audio feature shingles."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _audio_shingles(raw: pd.Series) -> pd.Series:
        out = []
        for b in raw:
            if b is None:
                out.append([])
                continue
            pcm, sr = decode_wav(b)
            feats = _frame_features(pcm, sr, frame_ms, hop_ms)
            sym = _quantize(feats, levels)
            out.append(_shingle_hash(sym, k).tolist())
        return pd.Series(out)

    return _audio_shingles


def audio_signature_udf(
    frame_ms: int,
    hop_ms: int,
    k: int,
    levels: int,
    minhash_k: int,
    minhash_seed: int,
):
    """Fused kernel: bytes -> struct(audio_shingles, audio_minhash).

    Decode + frame features + quantize + shingle + MinHash in one Arrow
    round trip, so raw ``bytes`` and the shingle arrays cross the
    JVM<->Python boundary exactly once."""
    from entity_deduplication_spark.functions.hashing import (
        _hash_params,
        _minhash_batch,
    )

    a, b = _hash_params(minhash_k, minhash_seed)

    @F.pandas_udf("audio_shingles array<bigint>, audio_minhash array<bigint>")
    def _audio_sig(raw: pd.Series) -> pd.DataFrame:
        shingles = []
        for blob in raw:
            if blob is None:
                shingles.append([])
                continue
            pcm, sr = decode_wav(blob)
            feats = _frame_features(pcm, sr, frame_ms, hop_ms)
            sym = _quantize(feats, levels)
            shingles.append(_shingle_hash(sym, k).tolist())
        ser = pd.Series(shingles)
        return pd.DataFrame(
            {"audio_shingles": ser, "audio_minhash": _minhash_batch(ser, a, b)}
        )

    return _audio_sig


def decode_map_in_pandas_schema() -> str:
    return "clip_id string, pcm array<float>, sr_hz int"


def decode_map_in_pandas(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas variant of decode for pipelines that need PCM + sr."""
    for pdf in batches:
        decoded = [decode_wav(b) for b in pdf["bytes"]]
        yield pd.DataFrame(
            {
                "clip_id": pdf["clip_id"].to_numpy(),
                "pcm": [d[0] for d in decoded],
                "sr_hz": [d[1] for d in decoded],
            }
        )
