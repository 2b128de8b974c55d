"""Window routing for bench comparisons (VERDICT r4 item #7): bench
artifacts carry their own CPU-probe window evidence, and
tools/bench_compare.py refuses an automated regression verdict when the
two sides' host windows do not both read quiet — a cross-window ratio
measures the host, not the build (the r4 degraded-window episode)."""

import json
import subprocess
import sys

sys.path.insert(0, "/root/repo")
from tools.bench_compare import window_of  # noqa: E402
from tools.cpu_window import HOST_SPEED_FLOOR, at_speed, classify  # noqa: E402

QUIET_PROBE = {"workers": 32, "single_iters_per_sec": 20_000_000,
               "nway_mean_frac": 0.95, "nway_min_frac": 0.9, "spread": 1.1}
# the round-4 degraded window's actual shape: 74% of single-thread,
# 2.7× worker spread
DEGRADED_PROBE = {"workers": 32, "single_iters_per_sec": 20_000_000,
                  "nway_mean_frac": 0.74, "nway_min_frac": 0.4,
                  "spread": 2.7}


def test_classify_quiet_degraded_unknown():
    assert classify(QUIET_PROBE) == "quiet"
    assert classify(DEGRADED_PROBE) == "degraded"
    # either axis alone trips it: good mean but wild spread (one stolen
    # core) and flat-but-slow (uniform co-tenant) are both degraded
    assert classify({**QUIET_PROBE, "spread": 2.2}) == "degraded"
    assert classify({**QUIET_PROBE, "nway_mean_frac": 0.7}) == "degraded"
    assert classify(None) == "unknown"
    assert classify({}) == "unknown"


def test_at_speed_floor_gates_minting_not_labels():
    # at_speed is the MINT gate (bench entry wait + watcher): a uniformly
    # throttled host passes the fraction gate but must not start a timed
    # record run. classify() labels are unchanged — historical artifacts
    # keep their windows.
    parity = {**QUIET_PROBE, "single_iters_per_sec": 29_900_000}
    throttled = {**QUIET_PROBE, "single_iters_per_sec": 19_900_000}
    assert at_speed(parity)
    assert not at_speed(throttled)
    assert classify(throttled) == "quiet"  # label unchanged by the floor
    assert not at_speed(None) and not at_speed({})
    # floor sits between the observed populations: parity windows probed
    # 27.0–30.2M, throttles 18.8–19.9M
    assert 19_900_000 < HOST_SPEED_FLOOR <= 27_000_000


def _bench_line(total, probes=None, window=None):
    d = {"metric": "headline_suite_sec", "value": total, "unit": "sec",
         "queries": {"q1": total}, "sf": 0.1}
    if probes:
        d["cpu_probe_before"], d["cpu_probe_after"] = probes
    if window:
        d["window"] = window
    return d


def test_window_of_prefers_stored_label_then_probes_then_registry(tmp_path):
    p = tmp_path / "x.json"
    assert window_of(str(p), _bench_line(1, window="degraded")) == "degraded"
    assert window_of(
        str(p), _bench_line(1, probes=(QUIET_PROBE, QUIET_PROBE))) == "quiet"
    # the worse bracketing probe wins: a burst that starts mid-suite
    # shows only in the exit probe
    assert window_of(
        str(p), _bench_line(1, probes=(QUIET_PROBE, DEGRADED_PROBE))) \
        == "degraded"
    # no probe fields, unknown filename → unknown
    assert window_of(str(p), _bench_line(1)) == "unknown"
    # the adjudicated legacy artifacts route via the registry
    assert window_of("BENCH/bench_r4_closeout_degraded1.json",
                     _bench_line(1)) == "degraded"
    assert window_of("BENCH/bench_r4_conffix_local.json",
                     _bench_line(1)) == "quiet"


def _run_compare(tmp_path, old, new, *flags):
    a, b = tmp_path / "old.json", tmp_path / "new.json"
    a.write_text(json.dumps(old))
    b.write_text(json.dumps(new))
    return subprocess.run(
        [sys.executable, "/root/repo/tools/bench_compare.py",
         str(a), str(b), *flags],
        capture_output=True, text=True, cwd="/root/repo")


def test_compare_refuses_cross_window_exit_2(tmp_path):
    old = _bench_line(10.0, probes=(QUIET_PROBE, QUIET_PROBE))
    new = _bench_line(20.0, probes=(DEGRADED_PROBE, DEGRADED_PROBE))
    r = _run_compare(tmp_path, old, new)
    assert r.returncode == 2, r.stdout + r.stderr
    assert "CROSS-WINDOW" in r.stdout
    # the table is still printed (annotate, don't hide)
    assert "q1" in r.stdout


def test_compare_quiet_quiet_keeps_regression_semantics(tmp_path):
    old = _bench_line(10.0, probes=(QUIET_PROBE, QUIET_PROBE))
    new = _bench_line(20.0, probes=(QUIET_PROBE, QUIET_PROBE))
    r = _run_compare(tmp_path, old, new)
    assert r.returncode == 1, r.stdout  # a real 2× regression still exits 1
    assert "REGRESSION" in r.stdout
    ok = _run_compare(tmp_path, old,
                      _bench_line(10.1, probes=(QUIET_PROBE, QUIET_PROBE)))
    assert ok.returncode == 0, ok.stdout


def test_compare_refuses_quiet_but_throttled_host(tmp_path):
    # This round's observed failure shape: the fraction-based probe reads
    # quiet on a UNIFORMLY throttled host (every core slowed alike), so
    # two quiet labels at materially different absolute single-thread
    # rates still mustn't mint an automated verdict — 19.9M vs 30M
    # inflated the same build's suite 84.2s → 109.7s.
    fast = {**QUIET_PROBE, "single_iters_per_sec": 30_000_000}
    slow = {**QUIET_PROBE, "single_iters_per_sec": 19_900_000}
    old = _bench_line(84.2, probes=(fast, fast))
    new = _bench_line(109.7, probes=(slow, slow))
    r = _run_compare(tmp_path, old, new)
    assert r.returncode == 2, r.stdout + r.stderr
    assert "HOST-SPEED MISMATCH" in r.stdout
    # annotate, don't hide: the table and both speeds are still printed
    assert "q1" in r.stdout and "ratio 1.51" in r.stdout
    forced = _run_compare(tmp_path, old, new, "--allow-cross-window")
    assert forced.returncode == 1, forced.stdout  # regression verdict kept


def test_compare_small_speed_wobble_passes(tmp_path):
    # ≤1.25× absolute-rate wobble is normal quiet-window variance and
    # must NOT block the verdict (measured ≤ ~1.1× across quiet runs)
    a = {**QUIET_PROBE, "single_iters_per_sec": 30_000_000}
    b = {**QUIET_PROBE, "single_iters_per_sec": 27_500_000}
    r = _run_compare(tmp_path,
                     _bench_line(10.0, probes=(a, a)),
                     _bench_line(10.1, probes=(b, b)))
    assert r.returncode == 0, r.stdout


def test_compare_unknown_window_refused_unless_overridden(tmp_path):
    old = _bench_line(10.0)  # pre-r5 shape, unknown window
    new = _bench_line(10.1, probes=(QUIET_PROBE, QUIET_PROBE))
    r = _run_compare(tmp_path, old, new)
    assert r.returncode == 2
    forced = _run_compare(tmp_path, old, new, "--allow-cross-window")
    assert forced.returncode == 0, forced.stdout
