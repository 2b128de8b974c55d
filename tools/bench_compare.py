"""Diff two bench result files (BENCH_r*.json, or a raw one-line JSON from
bench.py) query-by-query under the SAME methodology, flagging regressions
beyond a noise threshold. The driver's BENCH_r*.json wraps the bench line
under "parsed"; raw bench.py output is the line itself — both accepted.

Usage:
    python tools/bench_compare.py OLD.json NEW.json [--threshold 1.3]
                                  [--allow-cross-window]

A query is flagged when new/old exceeds the threshold AND the absolute
delta exceeds 0.3s (sub-second jitter on a shared host is not a
regression). Exit 1 if any flagged.

Window routing (round-4 verdict item #7): bench lines carry their own CPU
probe (``cpu_probe_before/after``, see tools/cpu_window.py) since round 5;
known pre-probe artifacts are routed via KNOWN_WINDOWS (adjudicated in
BENCH/BASELINE.md). If either side is degraded/unknown, or the windows
differ, the tool still prints the table but REFUSES the automated
regression verdict (exit 2) unless --allow-cross-window is given — a ratio
across windows measures the host, not the build.

Host-speed parity (round 5): the window labels are FRACTION-based
(n-way rate vs the same run's single-thread rate), so a uniformly
throttled host — every core slowed the same amount — still classifies
"quiet" (observed this round: a 19.9M iters/s entry probe vs the host's
normal ~30M minted a 109.7s suite on the same build that times 84.2s at
full speed). Two quiet labels therefore aren't enough: when both
artifacts carry absolute ``single_iters_per_sec`` probes, the verdict is
also refused if the two host speeds differ by more than
HOST_SPEED_PARITY — that ratio measures the throttle, not the build.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.cpu_window import classify  # noqa: E402

ABS_FLOOR_SEC = 0.3
# Max allowed ratio between the two artifacts' absolute single-thread
# probe rates before the comparison is declared cross-speed. Calibrated
# on this round's observed throttle (30M → 19.9M ≈ 1.51×, which inflated
# the suite 84.2s → 109.7s); normal quiet-window wobble measured ≤ ~1.1×.
HOST_SPEED_PARITY = 1.25

# Pre-round-5 artifacts carry no cpu_probe fields; these labels are the
# BENCH/BASELINE.md adjudications (forensic per-query ratio + warm re-time
# + 32-way probe evidence recorded there), keyed by basename.
KNOWN_WINDOWS = {
    "bench_r3_closeout_local.json": "quiet",
    "bench_r3_final_local.json": "quiet",
    "bench_r4_closeout_degraded1.json": "degraded",
    "bench_r4_closeout_degraded2.json": "degraded",
    "bench_r4_conffix_local.json": "quiet",
}


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:
        d = d["parsed"]
    if "queries" not in d:
        raise SystemExit(f"{path}: no 'queries' map found")
    return d


def window_of(path: str, d: dict) -> str:
    """'quiet' | 'degraded' | 'unknown' for one artifact: the stored
    probe fields if present (worse of the two bracketing probes), else
    the adjudicated legacy label, else unknown."""
    if "window" in d:
        return d["window"]
    probes = [d.get("cpu_probe_before"), d.get("cpu_probe_after")]
    labels = [classify(p) for p in probes if p]
    if labels:
        if "degraded" in labels:
            return "degraded"
        if "unknown" in labels:
            return "unknown"
        return "quiet"
    return KNOWN_WINDOWS.get(os.path.basename(path), "unknown")


def host_speed_of(d: dict) -> float | None:
    """Mean absolute single-thread rate of the artifact's bracketing
    probes (iters/s), or None for pre-probe artifacts."""
    rates = [p["single_iters_per_sec"]
             for p in (d.get("cpu_probe_before"), d.get("cpu_probe_after"))
             if p and p.get("single_iters_per_sec")]
    return sum(rates) / len(rates) if rates else None


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 1.3
    if "--threshold" in sys.argv:
        thr = float(sys.argv[sys.argv.index("--threshold") + 1])
    allow_cross = "--allow-cross-window" in sys.argv
    old, new = load(args[0]), load(args[1])
    w_old, w_new = window_of(args[0], old), window_of(args[1], new)
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
    print(f"windows: old={w_old} new={w_new}")
    if not allow_cross and not (w_old == w_new == "quiet"):
        print("CROSS-WINDOW: at least one side is degraded/unknown (or "
              "labels differ) — the ratio above measures the host, not "
              "the build. No automated verdict; re-run in a quiet window "
              "(python tools/cpu_window.py gates one) or pass "
              "--allow-cross-window to accept the comparison as-is.")
        sys.exit(2)
    s_old, s_new = host_speed_of(old), host_speed_of(new)
    if s_old and s_new:
        speed_ratio = max(s_old, s_new) / min(s_old, s_new)
        print(f"host speed: old {s_old / 1e6:.1f}M new {s_new / 1e6:.1f}M "
              f"iters/s (ratio {speed_ratio:.2f})")
        if not allow_cross and speed_ratio > HOST_SPEED_PARITY:
            print("HOST-SPEED MISMATCH: both windows read quiet, but the "
                  "absolute single-thread rates differ beyond "
                  f"{HOST_SPEED_PARITY}× — a uniformly throttled host "
                  "classifies quiet under the fraction-based probe, so "
                  "this ratio measures the throttle, not the build. No "
                  "automated verdict; re-run when the slower side's host "
                  "recovers or pass --allow-cross-window.")
            sys.exit(2)
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
