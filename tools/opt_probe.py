"""Round-6 optimization probe: isolate one (or more) bench queries.

For each named query: noop-sink samples (same methodology as bench.py),
`.explain("formatted")` dump to plans/r06/<q>_<tag>.txt, and a per-stage
wall/executorRunTime breakdown from the UI REST API so the slow stage is
identifiable without the UI. bench.py itself is FROZEN for measurement;
this is the §1.4 side harness.

Usage: python tools/opt_probe.py [--samples N] [--tag before] q1 [q2 ...]
       (query name `dedup_pipeline` runs the flagship)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod  # noqa: E402
from entity_deduplication_spark.session import get_spark  # noqa: E402


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _api(sc, path: str):
    url = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/{path}"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.load(r)


def _stages_after(sc, min_stage_id: int) -> list[dict]:
    out = []
    for s in _api(sc, "stages?status=complete"):
        if s["stageId"] >= min_stage_id:
            out.append(
                {
                    "stage": s["stageId"],
                    "name": s["name"].split("\n")[0][:90],
                    "tasks": s["numCompleteTasks"],
                    "runtime_s": round(s.get("executorRunTime", 0) / 1e3, 2),
                    "wall_s": round(
                        (
                            _ms(s.get("completionTime"))
                            - _ms(s.get("firstTaskLaunchedTime"))
                        )
                        / 1e3,
                        2,
                    )
                    if s.get("completionTime") and s.get("firstTaskLaunchedTime")
                    else None,
                }
            )
    return sorted(out, key=lambda x: x["stage"])


def _ms(iso: str) -> float:
    # "2026-08-21T01:02:03.456GMT"
    import datetime as dt

    return dt.datetime.strptime(iso[:-3], "%Y-%m-%dT%H:%M:%S.%f").timestamp() * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--samples", type=int, default=2)
    ap.add_argument("--tag", default=None, help="plan dump suffix (no dump if unset)")
    ap.add_argument("--stages", action="store_true", help="print per-stage table")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark(
        app_name="opt-probe",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "0",
            "spark.ui.retainedStages": "100000",
        },
    )
    sc = spark.sparkContext
    spark.read.parquet(f"{args.sf_dir}/lineitem.parquet").count()  # warm

    qs = entry_mod.queries()
    plandir = os.path.join(REPO, "plans", "r06")
    os.makedirs(plandir, exist_ok=True)

    for name in args.queries:
        if name == "dedup_pipeline":
            from entity_deduplication_spark.datagen import ensure_clips_parquet
            from entity_deduplication_spark.plans.pipeline import DedupPipeline

            n_clips = max(2000, int(0.1 * 80_000))
            clips_path, _ = ensure_clips_parquet(n_clips)

            def build(spark=spark):
                clips = spark.read.parquet(clips_path)
                return DedupPipeline(spark).run(clips).clusters
        else:
            def build(spark=spark, name=name):
                return qs[name](spark, args.sf_dir)

        if args.tag:
            with open(os.path.join(plandir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(build()._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ))
        walls = []
        for i in range(args.samples):
            spark.catalog.clearCache()
            try:
                before = max(
                    (s["stageId"] for s in _api(sc, "stages")), default=-1
                ) + 1
            except Exception:
                before = 0
            sc.setJobDescription(f"{name}#{i}")
            t0 = time.time()
            _noop(build())
            wall = time.time() - t0
            sc.setJobDescription(None)
            walls.append(round(wall, 3))
            if args.stages:
                try:
                    st = _stages_after(sc, before)
                    tot_rt = sum(s["runtime_s"] for s in st)
                    print(f"  -- sample {i}: wall={wall:.2f}s stages={len(st)} sum_runtime={tot_rt:.1f}s")
                    for s in st:
                        if (s["runtime_s"] or 0) >= 0.15 or (s["wall_s"] or 0) >= 0.15:
                            print(
                                f"     stage {s['stage']:4d} tasks={s['tasks']:4d} "
                                f"run={s['runtime_s']:7.2f}s wall={s['wall_s']}s  {s['name']}"
                            )
                except Exception as exc:  # pragma: no cover
                    print(f"  (stage fetch failed: {exc})")
        print(f"{name}: walls={walls}")

    spark.stop()


if __name__ == "__main__":
    main()
