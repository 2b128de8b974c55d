"""Controlled A/B for the r1→r2 timing shift on aggregation-shaped queries
(VERDICT r2 #3: `rowsum_check` 0.33→1.15s, `chronology` 0.58→0.92s).

The r1 harness timed `.count()`; r2 times a noop-sink write with an
`observe()` row count. For projection-shaped queries the change is the
honest-timing fix (count() lets Catalyst prune UDF columns); for
aggregation-shaped queries both methods must do identical work, so any
residual gap is methodology overhead or host noise — this probe measures
it directly: same session, interleaved methods, N reps, medians, plus a
pure-CPU quietness probe before and after (this host's load average is
unreliable — see BENCH/BASELINE.md).

Usage: python tools/ab_agg_timing.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["rowsum_check", "chronology", "topk_per_type", "iqr_outliers"]


def cpu_probe(seconds: float = 2.0) -> float:
    """Single-thread arithmetic throughput (iterations/s) — the host
    quietness signal that load-average cannot provide here."""
    t0 = time.time()
    n = 0
    x = 1.0
    while time.time() - t0 < seconds:
        for _ in range(10000):
            x = x * 1.0000001 + 1e-9
        n += 10000
    return n / (time.time() - t0)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from dataquality_spark import queries as Q
    from dataquality_spark.session import get_spark

    probe_before = cpu_probe()
    spark = get_spark(app_name="ab_agg", master=f"local[{cpus}]")

    def t_count(fn):
        t0 = time.time()
        fn(spark, sf_dir).count()
        Q.release_cached()
        return time.time() - t0

    def t_noop(fn):
        t0 = time.time()
        obs = Observation()
        (fn(spark, sf_dir).observe(obs, F.count(F.lit(1)).alias("n"))
         .write.format("noop").mode("overwrite").save())
        _ = obs.get["n"]
        Q.release_cached()
        return time.time() - t0

    results = {}
    for name in QUERIES:
        fn = Q.QUERIES[name]
        t_count(fn), t_noop(fn)  # warm both paths
        a, b = [], []
        for _ in range(reps):  # interleave so drift hits both equally
            a.append(t_count(fn))
            b.append(t_noop(fn))
        results[name] = (statistics.median(a), statistics.median(b))

    probe_after = cpu_probe()
    print(f"cpu probe before/after: {probe_before:.0f} / {probe_after:.0f} "
          f"it/s (ratio {probe_after / probe_before:.3f})")
    print(f"{'query':16s} {'count()':>9s} {'noop+obs':>9s} {'noop/count':>11s}")
    for name, (ma, mb) in results.items():
        print(f"{name:16s} {ma:9.3f} {mb:9.3f} {mb / ma:11.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
