"""Pure pandas/numpy re-implementation of the reference dedup semantics
(FIXTURES.md F6) at identical shingle/signature config.

Mirrors the reference lifecycle — blocking -> pairwise scoring -> CC
(reference base.py:119-147, utils.py:43-116) — with *exact* similarity
computation (no LSH approximation): a pair is a duplicate iff

* identical bytes, or identical normalized transcript (exact tier), or
* word-k-shingle Jaccard >= jaccard_threshold, or
* audio-feature-shingle Jaccard >= audio_jaccard_threshold, or
* exact common substring run >= min_run_chars,

then transitive closure via union-find. The engine's LSH pipeline must
recover >= 0.99 of these pairs (BASELINE.json metric). The >50-component
Louvain split of utils.py:73-98 is not replicated: fixtures keep every
component <= 50 by construction (SURVEY.md §2.5 C2 decision).

Audio decode here uses the stdlib ``wave`` module (independent of the
engine's RIFF parser); the frame-feature kernel is shared numpy — the
oracle gates the Spark *plumbing* (blocking, joins, CC), not the kernel.
"""

from __future__ import annotations

import io
import re
import struct
import wave
from itertools import combinations

import numpy as np
import pandas as pd

from entity_deduplication_spark.audio.decode import (
    _frame_features,
    _quantize,
    _shingle_hash,
)
from entity_deduplication_spark.config import DedupConfig
from entity_deduplication_spark.functions.suffix import longest_common_run


def normalize(t: str) -> str:
    t = re.sub(r"[^\w\s]", " ", t.lower())
    return re.sub(r"\s+", " ", t).strip()


def word_shingle_set(t: str, k: int) -> frozenset:
    toks = normalize(t).split()
    if not toks:
        return frozenset()  # empty text = EMPTY set (engine singleton semantics)
    if len(toks) < k:
        return frozenset([normalize(t)])
    return frozenset(tuple(toks[i : i + k]) for i in range(len(toks) - k + 1))


def _decode_oracle(raw: bytes) -> tuple[np.ndarray, int]:
    try:
        with wave.open(io.BytesIO(raw)) as w:
            sr = w.getframerate()
            data = w.readframes(w.getnframes())
        return np.frombuffer(data, dtype="<i2").astype(np.float32) / 32767.0, sr
    except Exception:  # float32 wav — minimal parse
        pos, sr, data = 12, None, None
        while pos + 8 <= len(raw):
            cid = raw[pos : pos + 4]
            (clen,) = struct.unpack_from("<I", raw, pos + 4)
            if cid == b"fmt ":
                _, _, sr = struct.unpack_from("<HHI", raw, pos + 8)
            elif cid == b"data":
                data = raw[pos + 8 : pos + 8 + clen]
            pos += 8 + clen + (clen & 1)
        return np.frombuffer(data, dtype="<f4").copy(), sr


def audio_shingle_set(raw: bytes, cfg: DedupConfig) -> frozenset:
    pcm, sr = _decode_oracle(raw)
    feats = _frame_features(pcm, sr, cfg.frame_ms, cfg.hop_ms)
    sym = _quantize(feats, cfg.audio_quant_levels)
    return frozenset(_shingle_hash(sym, cfg.audio_shingle_k).tolist())


def _jaccard_pairs(sets: dict, threshold: float) -> set[tuple]:
    """Pairs with exact Jaccard >= threshold via inverted index."""
    inv: dict = {}
    for cid, s in sets.items():
        for sh in s:
            inv.setdefault(sh, []).append(cid)
    inter: dict[tuple, int] = {}
    for members in inv.values():
        if len(members) < 2:
            continue
        for a, b in combinations(sorted(members), 2):
            inter[(a, b)] = inter.get((a, b), 0) + 1
    out = set()
    for (a, b), i in inter.items():
        u = len(sets[a]) + len(sets[b]) - i
        if u and i / u >= threshold:
            out.add((a, b))
    return out


def oracle_dup_pairs(clips: pd.DataFrame, cfg: DedupConfig) -> set[tuple]:
    ids = clips["clip_id"].tolist()

    # tier 1: exact bytes / exact normalized transcript. Empty/NULL keys
    # are skipped (mirrors the engine's empty-transcript singleton
    # semantics — "both unknown" is not duplicate evidence).
    exact: set[tuple] = set()
    for key_fn in (
        lambda r: bytes(r["bytes"]) if r["bytes"] is not None else b"",
        lambda r: normalize(r["transcript"] or ""),
    ):
        groups: dict = {}
        for _, r in clips.iterrows():
            key = key_fn(r)
            if not key:
                continue
            groups.setdefault(key, []).append(r["clip_id"])
        for members in groups.values():
            exact.update(combinations(sorted(members), 2))

    # tier 2: transcript shingle Jaccard
    tsets = {
        r["clip_id"]: word_shingle_set(r["transcript"] or "", cfg.shingle_k)
        for _, r in clips.iterrows()
    }
    text_pairs = _jaccard_pairs(tsets, cfg.jaccard_threshold)

    # tier 3: audio feature shingle Jaccard
    asets = {
        r["clip_id"]: audio_shingle_set(bytes(r["bytes"]), cfg)
        for _, r in clips.iterrows()
    }
    audio_pairs = _jaccard_pairs(asets, cfg.audio_jaccard_threshold)

    # tier 4: exact substring runs (only check pairs sharing a rare token
    # n-gram to keep the oracle O(n * candidates); complete for our corpus)
    norm = {cid: normalize(t or "") for cid, t in zip(ids, clips["transcript"])}
    sub_pairs = set()
    checked = set()
    inv: dict = {}
    for cid, t in norm.items():
        for i in range(0, max(len(t) - cfg.min_run_chars + 1, 0)):
            inv.setdefault(t[i : i + cfg.min_run_chars], []).append(cid)
    for members in inv.values():
        uniq = sorted(set(members))
        if len(uniq) < 2:
            continue
        for a, b in combinations(uniq, 2):
            if (a, b) in checked:
                continue
            checked.add((a, b))
            if longest_common_run(norm[a], norm[b]) >= cfg.min_run_chars:
                sub_pairs.add((a, b))
    return exact | text_pairs | audio_pairs | sub_pairs


def oracle_clusters(ids: list[str], pairs: set[tuple]) -> dict[str, str]:
    """Union-find transitive closure; cluster id = min member
    (reference utils.py:43-116 semantics, deterministic)."""
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in ids}


def pairs_from_clusters(assign: dict[str, str]) -> set[tuple]:
    by_c: dict = {}
    for i, c in assign.items():
        by_c.setdefault(c, []).append(i)
    out = set()
    for members in by_c.values():
        out.update(combinations(sorted(members), 2))
    return out


def rand_index(a: dict[str, str], b: dict[str, str], sample: int = 10000) -> float:
    """Sampled Rand index, constructed as reference utils.py:309-330."""
    rng = np.random.default_rng(42)
    common = sorted(set(a) & set(b))
    pairs = [
        (common[i], common[j])
        for i, j in zip(
            rng.integers(0, len(common), sample),
            rng.integers(0, len(common), sample),
        )
        if i != j
    ]
    agree = sum(
        1 for x, y in pairs if (a[x] == a[y]) == (b[x] == b[y])
    )
    return agree / len(pairs)
