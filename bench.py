"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline = the flagship audio dedup pipeline (clips/sec) + representative
operator queries from __spark_entry__ (dedup, ANN, text analysis, windowed
events, relational aggregates) at the chosen SF.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from entity_deduplication_spark.datagen import ensure_clips_parquet  # noqa: E402
from entity_deduplication_spark.plans.pipeline import DedupPipeline  # noqa: E402
from entity_deduplication_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "dedup_ngram_jaccard_pairs",
    "dedup_minhash_lsh_clusters",
    "dedup_simhash_pairs",
    "ann_cosine_topk",
    "ann_lsh_topk",
    # embedding_near_dup_pairs (cos>=0.35) auto-routes to the chunk-grid
    # exact path now — LSH selectivity is structurally poor at low
    # thresholds, so auto picks the bounded O(n^2) BLAS grid instead of a
    # degenerate 20M-candidate LSH plan; the hi (cos>=0.9) variant takes
    # the tuned-RHP LSH path. Both are headline queries again.
    "embedding_near_dup_pairs",
    "embedding_near_dup_pairs_hi",
    "fuzzy_part_name_pairs",
    "clustering_agreement",
    "text_stats",
    "doc_quality",
    "events_hourly",
    "sessionize",
    "q1_pricing_summary",
    "top_orders_per_customer",
    "region_rollup",
]


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def bench_flagship(spark: SparkSession, sf: float) -> tuple[float, int]:
    n_clips = max(2000, int(80_000 * sf))
    clips_path, _ = ensure_clips_parquet(n_clips)
    clips = spark.read.parquet(clips_path)
    t0 = time.time()
    res = DedupPipeline(spark).run(clips)
    res.clusters.write.mode("overwrite").format("noop").save()
    return time.time() - t0, n_clips


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark(app_name="dedup-bench")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warm

    timings: dict[str, float] = {}
    qs = entry_mod.queries()
    for name in BENCH_QUERIES:
        t0 = time.time()
        _noop(qs[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    flagship_sec, n_clips = bench_flagship(spark, sf)
    timings["dedup_pipeline"] = round(flagship_sec, 3)
    clips_per_sec = round(n_clips / flagship_sec, 1)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "end_to_end_bench_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extra": {
                    "dedup_clips": n_clips,
                    "dedup_clips_per_sec": clips_per_sec,
                    "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
