"""Diagnose disk (shuffle write + spill) of the candidate stage at a
given scale: run signatures -> candidate_pairs checkpoint only, then dump
per-stage shuffle/spill bytes from the UI REST API.

Usage: python tools/diag_cand_disk.py [n_clips] [cores]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, "/root/repo")


def main() -> None:
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from tools.scale_run import ensure_chunks

    chunk_paths = ensure_chunks("/root/repo/.data/scale_800k_v2", n_clips)

    from entity_deduplication_spark.config import DedupConfig
    from entity_deduplication_spark.plans.pipeline import (
        build_signatures,
        candidate_pairs,
    )
    from entity_deduplication_spark.session import get_spark
    from entity_deduplication_spark.sources.io import aqe_local_checkpoint

    spark = get_spark(
        app_name=f"diag-cand-{n_clips}",
        cores=cores,
        shuffle_partitions=cores * 8,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "0",
            "spark.cleaner.periodicGC.interval": "1min",
        },
    )
    sc = spark.sparkContext
    cfg = DedupConfig()
    clips = spark.read.parquet(*chunk_paths)

    import subprocess
    import time

    def du() -> str:
        free = subprocess.run(
            ["df", "-BG", "--output=avail", "/"], capture_output=True, text=True
        ).stdout.strip().splitlines()[-1]
        return f"free={free.strip()} t={time.strftime('%H:%M:%S')}"

    print("START", du(), flush=True)
    sig = aqe_local_checkpoint(build_signatures(clips, cfg))
    print("SIG_DONE rows=", sig.count(), du(), flush=True)
    cand = aqe_local_checkpoint(candidate_pairs(sig, cfg))
    print("CAND_DONE rows=", cand.count(), du(), flush=True)

    from entity_deduplication_spark.operators.verify import verified_edges

    edges = verified_edges(cand.select("id1", "id2"), sig, cfg)
    n_edges = edges.count()
    print("VERIFY_DONE rows=", n_edges, du(), flush=True)

    from entity_deduplication_spark.operators.connected_components import (
        connected_components,
    )

    comp = connected_components(edges.select("id1", "id2"))
    print("CC_DONE rows=", comp.count(), du(), flush=True)

    url = (
        f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
        "/stages?status=complete"
    )
    with urllib.request.urlopen(url, timeout=30) as r:
        stages = json.load(r)
    rows = []
    for s in stages:
        rows.append(
            {
                "id": s["stageId"],
                "name": s["name"].split("\n")[0][:60],
                "tasks": s.get("numCompleteTasks"),
                "in_rec": s.get("inputRecords"),
                "sh_read_gb": round(s.get("shuffleReadBytes", 0) / 2**30, 2),
                "sh_write_gb": round(s.get("shuffleWriteBytes", 0) / 2**30, 2),
                "spill_disk_gb": round(s.get("diskBytesSpilled", 0) / 2**30, 2),
                "spill_mem_gb": round(s.get("memoryBytesSpilled", 0) / 2**30, 2),
                "out_rec": s.get("outputRecords"),
            }
        )
    rows.sort(key=lambda x: -(x["sh_write_gb"] + x["spill_disk_gb"]))
    for row in rows[:15]:
        print(json.dumps(row))
    tot_w = sum(x["sh_write_gb"] for x in rows)
    tot_s = sum(x["spill_disk_gb"] for x in rows)
    print(f"TOTAL shuffle_write={tot_w:.1f}G disk_spill={tot_s:.1f}G")
    spark.stop()


if __name__ == "__main__":
    main()
