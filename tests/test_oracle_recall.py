"""Recall gate vs the pandas reference-semantics oracle (FIXTURES.md F6,
BASELINE.json metric: dup-pair recall >= 0.99 at identical config)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from entity_deduplication_spark.config import DedupConfig
from entity_deduplication_spark.datagen import generate_clips
from entity_deduplication_spark.plans.pipeline import DedupPipeline
from tests.oracle_pandas import (
    oracle_clusters,
    oracle_dup_pairs,
    pairs_from_clusters,
    rand_index,
)

N = 1500


@pytest.fixture(scope="module")
def oracle_result():
    clips, _ = generate_clips(N, seed=123)
    cfg = DedupConfig()
    pairs = oracle_dup_pairs(clips, cfg)
    assign = oracle_clusters(clips["clip_id"].tolist(), pairs)
    return clips, cfg, pairs_from_clusters(assign), assign


def test_dup_pair_recall_vs_oracle(spark, oracle_result):
    clips_pd, cfg, oracle_pairs, oracle_assign = oracle_result
    clips = spark.createDataFrame(clips_pd)
    res = DedupPipeline(spark, cfg).run(clips)
    ours = res.clusters.toPandas()
    our_assign = dict(zip(ours["clip_id"], ours["cluster_id"]))
    our_pairs = pairs_from_clusters(our_assign)

    inter = len(oracle_pairs & our_pairs)
    recall = inter / len(oracle_pairs)
    precision = inter / len(our_pairs) if our_pairs else 1.0
    assert recall >= 0.99, f"recall {recall:.4f} ({inter}/{len(oracle_pairs)})"
    # LSH may add a few transitive merges; precision stays high
    assert precision >= 0.95, f"precision {precision:.4f}"

    ri = rand_index(our_assign, oracle_assign)
    assert ri >= 0.99, f"rand index {ri:.4f}"


def test_oracle_components_bounded(oracle_result):
    """Fixture invariant behind skipping the reference's >50-component
    Louvain split (utils.py:73-98): no oracle component exceeds 50."""
    _, _, _, assign = oracle_result
    sizes = pd.Series(list(assign.values())).value_counts()
    assert sizes.max() <= 50
