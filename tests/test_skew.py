"""Skew fixture (FIXTURES.md F4): one hot shingle/phrase in 30% of rows
creates a hot LSH band; salted blocking must stay lossless and bounded."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from entity_deduplication_spark.audio.wav import encode_wav
from entity_deduplication_spark.config import DedupConfig
from entity_deduplication_spark.operators.blocking import lsh_band_pairs
from entity_deduplication_spark.operators.pairs import block_self_join_pairs
from entity_deduplication_spark.plans.pipeline import DedupPipeline, build_signatures


def _skewed_clips(n=400, seed=7) -> pd.DataFrame:
    """~30% of rows carry the *same* transcript (identical shingle set ->
    identical MinHash -> every band is a hot block), rest unique."""
    rng = np.random.default_rng(seed)
    hot = "the exact same transcript repeated across very many clips " \
          "making every single lsh band a hot key"
    rows = []
    for i in range(n):
        text = (
            hot if i < n * 0.3
            else " ".join(f"tok{rng.integers(0, 5000)}" for _ in range(12))
        )
        pcm = rng.uniform(-0.5, 0.5, 1600).astype(np.float32)
        rows.append(
            dict(clip_id=f"c{i:05d}", bytes=encode_wav(pcm, 8000), sr_hz=8000,
                 dur_ms=200, codec="pcm_s16le", transcript=text)
        )
    return pd.DataFrame(rows)


def test_salting_on_vs_off_identical_pairs(spark):
    """Lossless salting: hot-path (low hot_threshold) pair set == plain."""
    pdf = _skewed_clips()
    cfg = DedupConfig()
    sig = build_signatures(spark.createDataFrame(pdf), cfg)
    banded = sig.select(
        "clip_id", F.posexplode("bands").alias("band_idx", "band_key")
    ).cache()
    plain = block_self_join_pairs(
        banded, ["band_idx", "band_key"], block_size_limit=10**6,
        hot_threshold=10**9, salt_buckets=1,
    )
    salted = block_self_join_pairs(
        banded, ["band_idx", "band_key"], block_size_limit=10**6,
        hot_threshold=16, salt_buckets=8,
    )
    p1 = {(r["id1"], r["id2"]) for r in plain.collect()}
    p2 = {(r["id1"], r["id2"]) for r in salted.collect()}
    assert p1 == p2 and len(p1) > 0


def test_block_size_limit_bounds_pair_count(spark):
    pdf = _skewed_clips()
    cfg = DedupConfig(block_size_limit=50)
    sig = build_signatures(spark.createDataFrame(pdf), cfg)
    pairs = lsh_band_pairs(sig, cfg)
    # every band holds the same 120 identical-transcript rows; the cap keeps
    # the first 50 per band -> C(50,2) distinct hot pairs after cross-band
    # dedup (uncapped would be C(120,2) = 7140), plus a few random collisions
    assert pairs.count() <= (50 * 49) // 2 + 100


def test_pipeline_completes_on_skewed_input(spark):
    pdf = _skewed_clips()
    res = DedupPipeline(spark).run(spark.createDataFrame(pdf))
    assert res.clusters.count() == len(pdf)
