"""Per-stage wall-clock profile of the flagship pipeline at one
parallelism level — diagnoses WHICH stage stops scaling between
local[N] and local[4N].

Usage: python tools/profile_stages.py <cores> <n_clips>

Prints one JSON line with per-stage seconds. Stages are forced with the
same materialization the pipeline itself uses (persist + count), so the
numbers decompose the real run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_clips = int(sys.argv[2]) if len(sys.argv) > 2 else 48000

    from pyspark import StorageLevel

    from entity_deduplication_spark.config import DedupConfig
    from entity_deduplication_spark.datagen import ensure_clips_parquet
    from entity_deduplication_spark.operators.connected_components import (
        connected_components,
    )
    from entity_deduplication_spark.operators.verify import verified_edges
    from entity_deduplication_spark.plans.pipeline import (
        build_signatures,
        candidate_pairs,
        exact_edges,
    )
    from entity_deduplication_spark.session import get_spark

    spark = get_spark(app_name=f"profile-{cores}", cores=cores)
    cfg = DedupConfig()
    clips_path, _ = ensure_clips_parquet(n_clips)

    t: dict[str, float] = {}

    def stage(name, df):
        t0 = time.time()
        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        out.count()
        t[name] = round(time.time() - t0, 1)
        return out

    t0 = time.time()
    clips = spark.read.parquet(clips_path)
    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    if clips.rdd.getNumPartitions() < n_parts:
        clips = clips.repartition(n_parts, "clip_id")
    sig = stage("signatures", build_signatures(clips, cfg))
    cand = stage("candidates", candidate_pairs(sig, cfg))
    # verify + exact union (the pipeline's edges stage)
    import pyspark.sql.functions as F

    t1 = time.time()
    edges = (
        verified_edges(cand.select("id1", "id2"), sig, cfg)
        .unionByName(exact_edges(sig, cfg))
        .groupBy("id1", "id2")
        .agg(F.max("score").alias("score"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_edges = edges.count()
    t["verify_edges"] = round(time.time() - t1, 1)

    t2 = time.time()
    clusters = connected_components(
        edges, nodes=sig.select("clip_id"), max_iterations=cfg.cc_max_iterations
    )
    clusters.write.mode("overwrite").format("noop").save()
    t["connected_components"] = round(time.time() - t2, 1)

    total = round(time.time() - t0, 1)
    print(json.dumps({
        "cores": cores,
        "n_clips": n_clips,
        "stages": t,
        "n_edges": n_edges,
        "total": total,
        "load1": os.getloadavg()[0],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
