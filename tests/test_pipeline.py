"""End-to-end pipeline: planted-truth recall, determinism, resume (F1/F3)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from entity_deduplication_spark.config import DedupConfig
from entity_deduplication_spark.plans.pipeline import DedupPipeline


def _pair_set(df, cluster_col):
    a = df.select(F.col("clip_id").alias("id1"), F.col(cluster_col).alias("c"))
    b = df.select(F.col("clip_id").alias("id2"), F.col(cluster_col).alias("c"))
    return a.join(b, "c").filter("id1 < id2").select("id1", "id2")


@pytest.fixture(scope="module")
def result_1k(spark, clips_1k):
    clips, _ = clips_1k
    return DedupPipeline(spark).run(clips)


def test_pipeline_planted_truth_recall(spark, clips_1k, result_1k):
    clips, truth = clips_1k
    clusters = result_1k.clusters
    assert clusters.count() == clips.count()

    truth_pairs = _pair_set(truth, "true_cluster_id").cache()
    our_pairs = _pair_set(clusters, "cluster_id").cache()
    nt = truth_pairs.count()
    inter = truth_pairs.join(our_pairs, ["id1", "id2"]).count()
    no = our_pairs.count()
    recall = inter / nt
    precision = inter / no if no else 1.0
    assert recall >= 0.99, f"recall {recall:.4f}"
    assert precision >= 0.95, f"precision {precision:.4f}"


def test_canonical_and_metrics(spark, clips_1k, result_1k):
    clips, _ = clips_1k
    canon = result_1k.canonical.cache()
    n_clusters = result_1k.clusters.select("cluster_id").distinct().count()
    assert canon.count() == n_clusters
    row = canon.filter(F.col("cluster_size") > 1).first()
    assert row["cluster_id"] in row["record_ids"]
    assert row["record_ids"] == sorted(row["record_ids"])
    m = result_1k.metrics.first()
    assert m["total_records"] == clips.count()
    assert m["unique_entities"] == n_clusters


def test_pipeline_deterministic(spark, clips_1k):
    clips, _ = clips_1k
    clips = clips.limit(400)
    r1 = DedupPipeline(spark).run(clips).clusters
    r2 = DedupPipeline(spark).run(clips).clusters
    assert r1.exceptAll(r2).isEmpty() and r2.exceptAll(r1).isEmpty()


def test_pipeline_resume_from_checkpoint(spark, clips_1k, tmp_ckpt):
    """Kill-after-signatures semantics: a re-run with checkpoints present
    reuses them and yields byte-identical clusters (north_rule)."""
    clips, _ = clips_1k
    clips = clips.limit(400)
    pipe = DedupPipeline(spark, checkpoint_dir=tmp_ckpt)
    first = pipe.run(clips).clusters.toPandas().sort_values("clip_id")

    # simulate failure after candidate_pairs: drop downstream stages only
    for stage in ("edges", "clusters"):
        shutil.rmtree(os.path.join(tmp_ckpt, stage), ignore_errors=True)
    assert os.path.exists(os.path.join(tmp_ckpt, "signatures", "_SUCCESS"))

    resumed = DedupPipeline(spark, checkpoint_dir=tmp_ckpt).run(clips)
    second = resumed.clusters.toPandas().sort_values("clip_id")
    assert first.reset_index(drop=True).equals(second.reset_index(drop=True))

    # lineage rows were written per stage
    lineage = spark.read.parquet(os.path.join(tmp_ckpt, "_lineage"))
    stages = {r["stage"] for r in lineage.select("stage").distinct().collect()}
    assert {"signatures", "candidate_pairs", "edges", "clusters"} <= stages


def test_config_threshold_sweep_monotone(spark, clips_1k):
    """Stricter thresholds -> no more pairs than looser thresholds."""
    clips, _ = clips_1k
    small = clips.limit(300)
    loose = DedupPipeline(
        spark, DedupConfig(match_threshold=0.6, jaccard_threshold=0.6)
    ).run(small)
    strict = DedupPipeline(
        spark, DedupConfig(match_threshold=0.9, jaccard_threshold=0.95)
    ).run(small)
    assert _pair_set(strict.clusters, "cluster_id").count() <= _pair_set(
        loose.clusters, "cluster_id"
    ).count()
