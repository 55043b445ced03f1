"""Min-merge bench runs per side and compare: on a noisy shared host
(2-12% CPU steal bursts logged this round), single full-bench runs
swing +-30%; per-query MIN across >=2 runs per side recovers the
steady-state signal (the same damping bench.py's min-of-2 applies
within a run, applied across runs).

Usage: python scripts/bench_minmerge.py BEFORE1 [BEFORE2 ...] -- AFTER1 [AFTER2 ...]
"""
from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line.startswith("{"):
                continue
            obj = json.loads(line)
            if isinstance(obj.get("queries"), dict):
                return {k: v for k, v in obj["queries"].items()
                        if v is not None}
    raise SystemExit(f"no queries line in {path}")


def minmerge(paths: list[str]) -> dict[str, float]:
    out: dict[str, float] = {}
    for p in paths:
        for k, v in load(p).items():
            out[k] = min(out.get(k, float("inf")), v)
    return out


def main() -> None:
    split = sys.argv.index("--")
    before = minmerge(sys.argv[1:split])
    after = minmerge(sys.argv[split + 1:])
    rows = [(after[k] - before[k], before[k], after[k], k)
            for k in before if k in after]
    rows.sort()
    tb = sum(before.values())
    ta = sum(after[k] for k in before if k in after)
    print(f"min-merged total: before {tb:.1f}s -> after {ta:.1f}s "
          f"({ta / tb:.3f}x) over {len(rows)} queries")
    print("\n-- improvements > 0.15s")
    for d, b, a, k in rows:
        if d < -0.15:
            print(f"{d:+6.2f}  {b:6.2f} -> {a:6.2f}  {k}")
    print("\n-- regressions > 0.15s")
    for d, b, a, k in rows:
        if d > 0.15:
            print(f"{d:+6.2f}  {b:6.2f} -> {a:6.2f}  {k}")


if __name__ == "__main__":
    main()
