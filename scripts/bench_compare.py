"""Cross-round bench regression guard: compare two bench outputs
(BENCH_r{N}.json artifacts, or raw `python bench.py` stdout — both
carry a `queries` dict in the detailed line) and flag per-query
regressions using the judge's rule: slower by MORE than 25% AND more
than 0.2s absolute. Queries present in only one side are listed as
added/removed, not flagged.

Usage: python scripts/bench_compare.py OLD NEW
Exit 1 if any regression is flagged (so a round-close run can gate).
"""

from __future__ import annotations

import json
import sys


def load_queries(path: str) -> dict[str, float]:
    """Accept either a driver BENCH artifact ({"parsed": {...}} or the
    parsed dict itself) or raw bench stdout (detailed line first)."""
    with open(path) as fh:
        text = fh.read()
    best: dict | None = None
    try:  # whole-file JSON (the driver's BENCH_r{N}.json artifact)
        obj = json.loads(text)
        if isinstance(obj, dict):
            if isinstance(obj.get("parsed"), dict):
                obj = obj["parsed"]
            if isinstance(obj.get("queries"), dict):
                best = obj
    except json.JSONDecodeError:
        pass
    for line in text.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(obj.get("parsed"), dict):
            obj = obj["parsed"]
        if isinstance(obj.get("queries"), dict):
            best = obj
    if best is None:
        raise SystemExit(f"{path}: no JSON line with a queries dict "
                         "(driver tail capture may have truncated it)")
    return {k: v for k, v in best["queries"].items() if v is not None}


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    old, new = load_queries(sys.argv[1]), load_queries(sys.argv[2])
    shared = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    regressions, improved = [], []
    for q in shared:
        a, b = old[q], new[q]
        if b > a * 1.25 and b - a > 0.2:
            regressions.append((q, a, b))
        elif a > b * 1.25 and a - b > 0.2:
            improved.append((q, a, b))
    tot_old = sum(old[q] for q in shared)
    tot_new = sum(new[q] for q in shared)
    for q, a, b in sorted(regressions, key=lambda t: t[1] - t[2]):
        print(f"REGRESSION {q}: {a:.2f}s -> {b:.2f}s "
              f"({b / a:.2f}x)")
    for q, a, b in sorted(improved, key=lambda t: t[2] - t[1]):
        print(f"improved   {q}: {a:.2f}s -> {b:.2f}s ({b / a:.2f}x)")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    ratio = tot_new / tot_old if tot_old else float("nan")
    print(json.dumps({
        "shared": len(shared),
        "total_old_sec": round(tot_old, 2),
        "total_new_sec": round(tot_new, 2),
        "shared_ratio": round(ratio, 3),
        "n_regressions": len(regressions),
        "n_improved": len(improved),
    }))
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
