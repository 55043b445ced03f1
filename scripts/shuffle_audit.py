"""Shuffle-health audit: run every bench headline query once at the
target SF and report, per query, the Spark-measured exchange bill —
shuffle write bytes/records, spill (memory+disk), and scan input — via
the status REST API (stage deltas around each query). The 100 TB
guardrail numbers behind SURVEY §4/§6: a query whose shuffle write
scales with its INPUT (not its keys/output) ships the corpus somewhere
and would not survive the scale-up; any nonzero spill means a partition
outgrew the executor.

Usage: SPARK_GRAFT_CPUS=32 python scripts/shuffle_audit.py [sf_dir] [names...]
"""
import json
import os
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _stages(ui: str, app: str) -> dict[int, dict]:
    url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url) as fh:
        return {s["stageId"]: s for s in json.load(fh)}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from bench import HEADLINE, materialize
    from dask_spark.queries import REGISTRY
    from dask_spark.session import get_spark

    names = sys.argv[2:] or HEADLINE
    spark = get_spark("shuffle_audit", **{"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    rows = []
    for name in names:
        fn, _ = REGISTRY[name]
        before = _stages(ui, app)
        try:
            materialize(fn(spark, sf_dir))
        except Exception as exc:
            print(f"# {name} FAILED: {exc}", file=sys.stderr)
            continue
        spark.catalog.clearCache()
        after = _stages(ui, app)
        new = [s for sid, s in after.items() if sid not in before]
        agg = {
            k: sum(s.get(k, 0) for s in new)
            for k in (
                "shuffleWriteBytes", "shuffleWriteRecords",
                "memoryBytesSpilled", "diskBytesSpilled", "inputBytes",
            )
        }
        agg["stages"] = len(new)
        rows.append((name, agg))
        print(
            f"{name}: shuffle_write={agg['shuffleWriteBytes']/1e6:.2f}MB "
            f"({agg['shuffleWriteRecords']} rows) "
            f"spill={agg['memoryBytesSpilled'] + agg['diskBytesSpilled']} "
            f"input={agg['inputBytes']/1e6:.1f}MB stages={agg['stages']}"
        )
    total_spill = sum(
        a["memoryBytesSpilled"] + a["diskBytesSpilled"] for _, a in rows
    )
    worst = max(rows, key=lambda r: r[1]["shuffleWriteBytes"], default=None)
    print(json.dumps({
        "n": len(rows),
        "total_spill_bytes": total_spill,
        "max_shuffle_write_mb": round(
            worst[1]["shuffleWriteBytes"] / 1e6, 2
        ) if worst else 0,
        "max_shuffle_query": worst[0] if worst else None,
    }))


if __name__ == "__main__":
    main()
