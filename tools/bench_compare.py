"""Diff two bench result files (BENCH_r*.json, or a raw one-line JSON from
bench.py) query-by-query under the SAME methodology, flagging regressions
beyond a noise threshold. The driver's BENCH_r*.json wraps the bench line
under "parsed"; raw bench.py output is the line itself — both accepted.

Usage:
    python tools/bench_compare.py OLD.json NEW.json [--threshold 1.3]

A query is flagged when new/old exceeds the threshold AND the absolute
delta exceeds 0.3s (sub-second jitter on a shared host is not a
regression). Exit 1 if any flagged.
"""

from __future__ import annotations

import json
import sys

ABS_FLOOR_SEC = 0.3


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:
        d = d["parsed"]
    if "queries" not in d:
        raise SystemExit(f"{path}: no 'queries' map found")
    return d


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 1.3
    if "--threshold" in sys.argv:
        thr = float(sys.argv[sys.argv.index("--threshold") + 1])
    old, new = load(args[0]), load(args[1])
    oq, nq = old["queries"], new["queries"]
    flagged, improved = [], []
    print(f"{'query':28s} {'old':>8s} {'new':>8s} {'ratio':>7s}")
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None or b is None:
            print(f"{name:28s} {a if a is not None else '-':>8} "
                  f"{b if b is not None else '-':>8}   (only one side)")
            continue
        r = b / a if a else float("inf")
        mark = ""
        if r > thr and (b - a) > ABS_FLOOR_SEC:
            mark = "  <-- REGRESSION"
            flagged.append((name, a, b, r))
        elif r < 1 / thr and (a - b) > ABS_FLOOR_SEC:
            mark = "  (improved)"
            improved.append(name)
        print(f"{name:28s} {a:8.3f} {b:8.3f} {r:7.2f}{mark}")
    print(f"\ntotal: old {old.get('value')}s new {new.get('value')}s; "
          f"{len(flagged)} regressions, {len(improved)} improvements")
    if "pipeline_docs_per_sec" in old and "pipeline_docs_per_sec" in new:
        print(f"pipeline docs/s: {old['pipeline_docs_per_sec']} -> "
              f"{new['pipeline_docs_per_sec']}")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
