"""Per-query driver-floor profile: run each named bench query once at
the target SF and report wall seconds, #jobs, #stages, #tasks, summed
executor task time, and the wall share NOT covered by task time (the
driver/scheduling floor). A query whose wall is mostly outside task
time is bounded by job-count floors (plan analysis, action round
trips), not by data work — the optimization lever there is fewer
actions/jobs, not faster stages (guide §1.1/§7).

Usage: SPARK_GRAFT_CPUS=32 python scripts/profile_queries.py [sf_dir] [names...]
"""
import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _get(ui: str, app: str, what: str):
    url = f"{ui}/api/v1/applications/{app}/{what}"
    with urllib.request.urlopen(url) as fh:
        return json.load(fh)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from bench import HEADLINE, materialize
    from dask_spark.queries import REGISTRY
    from dask_spark.session import get_spark

    names = sys.argv[2:] or HEADLINE
    spark = get_spark("profile_queries", **{"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    # warm once (JIT/codegen) so the measured pass is steady-state
    for name in names:
        try:
            materialize(REGISTRY[name][0](spark, sf_dir))
        except Exception as exc:
            print(f"# warm {name} FAILED: {exc}", file=sys.stderr)
    spark.catalog.clearCache()

    rows = []
    for name in names:
        fn, _ = REGISTRY[name]
        jobs_before = {j["jobId"] for j in _get(ui, app, "jobs")}
        stages_before = {s["stageId"] for s in _get(ui, app, "stages")}
        t0 = time.time()
        try:
            materialize(fn(spark, sf_dir))
        except Exception as exc:
            print(f"# {name} FAILED: {exc}", file=sys.stderr)
            continue
        wall = time.time() - t0
        spark.catalog.clearCache()
        jobs = [j for j in _get(ui, app, "jobs")
                if j["jobId"] not in jobs_before]
        stages = [s for s in _get(ui, app, "stages?status=complete")
                  if s["stageId"] not in stages_before]
        n_tasks = sum(s.get("numCompleteTasks", 0) for s in stages)
        task_sec = sum(s.get("executorRunTime", 0) for s in stages) / 1e3
        shuffle_mb = sum(s.get("shuffleWriteBytes", 0) for s in stages) / 2**20
        rows.append({
            "name": name, "wall": round(wall, 2), "jobs": len(jobs),
            "stages": len(stages), "tasks": n_tasks,
            "task_sec": round(task_sec, 2),
            "task_par": round(task_sec / wall, 1),
            "shuffle_mb": round(shuffle_mb, 2),
        })
        print(json.dumps(rows[-1]), flush=True)

    rows.sort(key=lambda r: -r["wall"])
    print("\n# slowest first (task_par = summed task sec / wall; "
          "low value + high jobs = driver-floor bound)")
    for r in rows:
        print(f"{r['wall']:7.2f}s  jobs={r['jobs']:3d} stages={r['stages']:3d} "
              f"tasks={r['tasks']:5d} task_sec={r['task_sec']:8.2f} "
              f"par={r['task_par']:5.1f} shuf={r['shuffle_mb']:8.2f}MB  {r['name']}")


if __name__ == "__main__":
    main()
