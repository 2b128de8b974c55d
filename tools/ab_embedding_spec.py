"""Interleaved A/B: embedding_neardup's PORTABLE plane spec (the exact-
oracle registry entry) vs the production ``gauss`` spec — measures the
exactness premium the registry row pays, the same adjudication
`fuzzy_dedup_decisions` carries (~0.9s for its portable shingle hash).

Method (same discipline as tools/ab_agg_timing.py): one session, warm
pass for both variants, then ABBA interleaving × N reps through the noop
sink, pins released between runs, CPU quietness probes bracketing the
whole block. Usage:

    python tools/ab_embedding_spec.py [reps]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"


def build(spark, plane_spec: str):
    from pyspark.sql import functions as F

    from dataquality_spark.operators.similarity import embedding_near_dup_pairs
    from dataquality_spark import queries as Q

    emb = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
           .select("vec_id", "embedding"))
    shadow = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"))
    pins: list = []
    out = embedding_near_dup_pairs(
        spark, emb.unionByName(shadow), threshold=0.999, dim=64,
        plane_spec=plane_spec, cleanup=pins)
    return Q._register_pins(out, pins)


def run_once(spark, plane_spec: str) -> float:
    from dataquality_spark import queries as Q

    t0 = time.time()
    out = build(spark, plane_spec)
    out.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    Q.release_cached(out)
    return dt


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from tools.cpu_window import classify, probe

    p0 = probe()
    print(f"cpu probe (before): {p0} → {classify(p0)}", flush=True)

    from dataquality_spark.session import get_spark

    spark = get_spark(app_name="ab_embspec", master="local[32]")
    # warm both variants (JIT + plane-table build out of the measurement)
    for spec_name in ("portable", "gauss"):
        run_once(spark, spec_name)
    time.sleep(5)

    times: dict[str, list[float]] = {"portable": [], "gauss": []}
    order = (["portable", "gauss", "gauss", "portable"] * reps)[: 2 * reps * 2]
    for spec_name in order:
        dt = run_once(spark, spec_name)
        times[spec_name].append(dt)
        print(f"  {spec_name}: {dt:.2f}s", flush=True)
    spark.stop()

    p1 = probe()
    print(f"cpu probe (after): {p1} → {classify(p1)}", flush=True)
    med_p = statistics.median(times["portable"])
    med_g = statistics.median(times["gauss"])
    print(f"portable median {med_p:.2f}s  gauss median {med_g:.2f}s  "
          f"premium {med_p - med_g:+.2f}s ({med_p / med_g:.2f}x)")


if __name__ == "__main__":
    main()
