"""Pipeline edge cases: empty input, single row, all-identical corpus."""

import pandas as pd
import pytest
from pyspark.sql import types as T

from entity_deduplication_spark.audio.wav import encode_wav
from entity_deduplication_spark.plans.pipeline import DedupPipeline

CLIPS_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("sr_hz", T.IntegerType(), True),
        T.StructField("dur_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("transcript", T.StringType(), True),
    ]
)


def _clip(i: int, text: str, seed: int = 0):
    import numpy as np

    rng = np.random.default_rng(seed)
    pcm = rng.uniform(-0.5, 0.5, 1600).astype("float32")
    return (f"c{i:03d}", encode_wav(pcm, 8000), 8000, 200, "pcm_s16le", text)


def test_empty_input(spark):
    empty = spark.createDataFrame([], CLIPS_SCHEMA)
    res = DedupPipeline(spark).run(empty)
    assert res.clusters.count() == 0
    assert res.canonical.count() == 0


def test_single_row(spark):
    df = spark.createDataFrame([_clip(0, "only one clip here")], CLIPS_SCHEMA)
    res = DedupPipeline(spark).run(df)
    rows = res.clusters.collect()
    assert len(rows) == 1 and rows[0]["cluster_id"] == "c000"


def test_all_identical_rows(spark):
    """100 byte-identical clips -> one cluster via O(n) chain edges."""
    rows = [_clip(i, "identical transcript for everyone", seed=7) for i in range(100)]
    rows = [(f"c{i:03d}",) + rows[0][1:] for i in range(100)]
    df = spark.createDataFrame(rows, CLIPS_SCHEMA)
    res = DedupPipeline(spark).run(df)
    clusters = {r["cluster_id"] for r in res.clusters.collect()}
    assert clusters == {"c000"}
    canon = res.canonical.collect()
    assert len(canon) == 1 and canon[0]["cluster_size"] == 100


def test_null_and_empty_transcripts(spark):
    """Empty/null transcripts with *different* audio must stay singletons —
    the shared-hash('')-sentinel merge bug regression test."""
    rows = [
        _clip(0, "", seed=10),
        _clip(1, "", seed=11),
        (f"c002", encode_wav(__import__("numpy").zeros(800, "float32"), 8000),
         8000, 100, "pcm_s16le", None),
    ]
    df = spark.createDataFrame(rows, CLIPS_SCHEMA)
    res = DedupPipeline(spark).run(df)
    got = {r["clip_id"]: r["cluster_id"] for r in res.clusters.collect()}
    assert got == {"c000": "c000", "c001": "c001", "c002": "c002"}
