"""Per-blocking-family pair-mass audit at a given corpus size.

Candidate volume at 800k clips measured 14x the 200k volume (n^1.9) —
this tool attributes that growth: for each band family it reports bucket
count, the full-pair mass sum(C(min(bn, cap), 2)) the self-join will
emit, and the chain mass for over-cap buckets. Run at two sizes to see
which family's pair mass grows super-linearly.

Usage: python tools/band_family_audit.py [n_clips] [cores]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

FAMILY = {0: "text_minhash", 1: "audio_minhash", 2: "simhash", 3: "fingerprint"}


def main() -> None:
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from entity_deduplication_spark.config import DedupConfig
    from entity_deduplication_spark.plans.pipeline import (
        build_signatures,
        unified_band_table,
    )
    from entity_deduplication_spark.session import get_spark
    from entity_deduplication_spark.sources.io import aqe_local_checkpoint
    from tools.scale_run import ensure_chunks

    chunk_paths = ensure_chunks("/root/repo/.data/scale_800k_v2", n_clips)
    spark = get_spark(
        app_name=f"band-audit-{n_clips}",
        cores=cores,
        shuffle_partitions=cores * 8,
    )
    cfg = DedupConfig()
    clips = spark.read.parquet(*chunk_paths)
    sig = aqe_local_checkpoint(build_signatures(clips, cfg))
    unified = unified_band_table(sig, cfg)
    cap = cfg.band_bucket_cap

    sizes = unified.groupBy("src", "band_idx", "band_key").agg(
        F.count(F.lit(1)).alias("bn")
    )
    # mirror candidate_pairs' per-family policy: fingerprint (src 3) uses
    # fp_df_cap with skip; everything else chains above band_bucket_cap
    cap_col = F.when(F.col("src") == 3, F.lit(cfg.fp_df_cap)).otherwise(
        F.lit(cap)
    )
    full = F.when(
        F.col("bn") <= cap_col, (F.col("bn") * (F.col("bn") - 1) / 2)
    ).otherwise(F.lit(0.0))
    chain = F.when(
        (F.col("bn") > cap_col) & (F.col("src") != 3), F.col("bn") - 1
    ).otherwise(F.lit(0.0))
    agg = (
        sizes.filter(F.col("bn") >= 2)
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("buckets"),
            F.sum("bn").alias("members"),
            F.max("bn").alias("max_bn"),
            F.expr("percentile_approx(bn, 0.99)").alias("p99_bn"),
            F.sum(full).cast("long").alias("full_pair_mass"),
            F.sum(chain).cast("long").alias("chain_mass"),
        )
        .orderBy("src")
        .collect()
    )
    out = {
        "n_clips": n_clips,
        "cap": cap,
        "families": {
            FAMILY[r["src"]]: {
                "buckets_ge2": r["buckets"],
                "members": r["members"],
                "max_bn": r["max_bn"],
                "p99_bn": r["p99_bn"],
                "full_pair_mass": r["full_pair_mass"],
                "chain_mass": r["chain_mass"],
            }
            for r in agg
        },
    }
    print("AUDIT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
