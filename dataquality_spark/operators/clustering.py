"""Fixed-point k-means over embedding columns (Lloyd's algorithm).

The curation-pipeline clustering primitive (SemDeDup, Abbas et al. 2023,
clusters with k-means before per-cluster dedup; diversity sampling and
topic bucketing use the same assignment): every vector gets a cluster id
and its squared distance to the final centroid.

Engine-portable by construction — the whole iteration is exact integer
arithmetic so a SQL oracle replays it bit-for-bit:

  * vectors are quantized ONCE: q_i = floor(float64(v_i) · 10^6), an
    identical IEEE widen/multiply/floor on every engine;
  * distances are int64 sums of squared integer differences (no BLAS, no
    float accumulation order);
  * centroid updates are floor(sum / count) where the single division of
    exact integers is one correctly-rounded IEEE op — bit-identical
    everywhere (the repo's float-free oracle rule: one final division is
    portable, chains are not);
  * ties (equal distance) go to the smaller cluster index; empty clusters
    keep their previous centroid.

Scale shape (100-TB audit): the classic broadcast-centroid design —
centroids are k·dim ints (driver-bounded by the parameters, not the
data); each iteration is ONE narrow map over the persisted quantized
frame plus a k·dim-wide aggregate. No shuffle grows with iterations; the
only corpus-sized shuffle is the per-cluster aggregate, map-side combined
to k rows per partition. MLlib's KMeans has the same topology; this one
exists because its arithmetic is portable enough to verify exactly.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

KMEANS_QUANT = 10 ** 6       # fixed-point unit per embedding coordinate
_DOUBLE_EXACT = 1 << 53      # centroid sums must stay exactly representable
_INT64_MAX = (1 << 63) - 1


def _quantize(vec_col: str) -> F.Column:
    return F.transform(F.col(vec_col),
                       lambda x: F.floor(x.cast("double")
                                         * F.lit(float(KMEANS_QUANT)))
                                  .cast("long"))


def kmeans_clusters(spark: SparkSession, emb: DataFrame, *, k: int = 8,
                    iters: int = 2, dim: int | None = None,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    cleanup: list | None = None) -> DataFrame:
    """(id, cluster, dist): Lloyd's k-means with deterministic seeding —
    initial centroids are the quantized vectors of the ``k`` smallest ids;
    then ``iters`` rounds of (assign, update) and one final assignment.

    NULL vectors, wrong-length vectors and vectors with NULL elements are
    dropped on both engines (the semantic_dedup corrupt-embedding
    convention) — a crawl-scale corpus always contains a few.

    ``cleanup``: the quantized frame is persisted (every iteration and the
    envelope guard rescan it) and appended for the caller to unpersist
    after materialization."""
    if dim is None:
        head = emb.where(F.col(vec_col).isNotNull()).select(vec_col).head(1)
        if not head:
            return spark.createDataFrame(
                [], f"{id_col} long, cluster int, dist long")
        dim = len(head[0][0])
    qdf = (emb.where(F.col(vec_col).isNotNull()
                     & (F.size(vec_col) == dim)
                     & ~F.exists(F.col(vec_col), lambda x: x.isNull()))
           .select(F.col(id_col).alias("_id"), _quantize(vec_col).alias("qv"))
           .persist())
    if cleanup is not None:
        cleanup.append(qdf)

    # exactness envelope, both checked on one tiny agg over the persisted
    # frame: centroid sums must stay < 2^53 (the one IEEE division is only
    # bit-portable if its operands are exact), and a squared distance must
    # fit int64.
    stats = qdf.agg(
        F.count("*").alias("n"),
        F.max(F.array_max(F.transform("qv", F.abs))).alias("m")).first()
    n, max_abs = stats["n"], stats["m"] or 0
    if n == 0:
        return spark.createDataFrame(
            [], f"{id_col} long, cluster int, dist long")
    if n * max_abs >= _DOUBLE_EXACT:
        raise ValueError(
            f"kmeans_clusters exactness envelope exceeded: {n} vectors × "
            f"max|q|={max_abs} puts a centroid sum past 2^53, where the "
            f"floor(sum/count) update stops being bit-portable — cluster "
            f"per-partition first or lower KMEANS_QUANT.")
    if dim * (2 * max_abs) ** 2 > _INT64_MAX:
        raise ValueError(
            f"kmeans_clusters distance envelope exceeded: dim {dim} × "
            f"(2·{max_abs})² overflows int64 — lower KMEANS_QUANT.")

    seed = qdf.orderBy("_id").limit(k).collect()
    C = np.array([r["qv"] for r in seed], dtype=np.int64)     # [k', dim]

    def assign_udf(cents: np.ndarray):
        @F.pandas_udf("struct<cluster:int, dist:long>")
        def assign(qv: pd.Series) -> pd.DataFrame:
            if qv.empty:
                return pd.DataFrame({"cluster": pd.Series(dtype="int32"),
                                     "dist": pd.Series(dtype="int64")})
            Q = np.array(qv.tolist(), dtype=np.int64)
            best_d = np.full(len(Q), _INT64_MAX, dtype=np.int64)
            best_j = np.zeros(len(Q), dtype=np.int32)
            for j in range(cents.shape[0]):
                diff = Q - cents[j]
                d = np.einsum("ij,ij->i", diff, diff)   # exact int64
                upd = d < best_d                        # tie → smaller j
                best_d[upd] = d[upd]
                best_j[upd] = j
            return pd.DataFrame({"cluster": best_j, "dist": best_d})
        return assign

    sums = [F.sum(F.element_at("qv", i + 1)).alias(f"s{i}")
            for i in range(dim)]
    for _ in range(iters):
        a = qdf.withColumn("asg", assign_udf(C)("qv"))
        rows = (a.groupBy(F.col("asg.cluster").alias("cl"))
                .agg(F.count("*").alias("cnt"), *sums).collect())
        C = C.copy()                       # empty cluster keeps centroid
        for r in rows:
            cnt = r["cnt"]
            C[r["cl"]] = [math.floor(r[f"s{i}"] / cnt) for i in range(dim)]

    return (qdf.withColumn("asg", assign_udf(C)("qv"))
            .select(F.col("_id").alias(id_col),
                    F.col("asg.cluster").alias("cluster"),
                    F.col("asg.dist").alias("dist")))
