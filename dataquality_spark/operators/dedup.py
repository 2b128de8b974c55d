"""Deduplication operators: exact (skew-salted), MinHash-LSH, SimHash,
n-gram Jaccard.

Exact dedup is the north-rule shuffle (BASELINE.json): groupBy on a 64-bit
content hash of normalized text, **explicitly salted** so Zipfian-hot content
(boilerplate duplicated across hot domains) cannot pin one reducer. Two-phase
aggregate: partial min per (hash, salt), final min per hash — the classic
map-side-combine shape, SURVEY.md §4.3(2). AQE skew handling remains on as
the backstop for the join-back.

Re-expresses reference U1 exact-duplicate detection
(`dimensions/uniqueness/u1.py:34-39`) with an explicit, deterministic
keep-first policy (min (warc_ts, url)) instead of pandas `duplicated(keep=False)`,
and C1 near-dup similarity (`dimensions/consistency/c1.py:39-141`) as
MinHash-banded LSH blocking + verified Jaccard — never an O(n²) cross join
(SURVEY.md J-2).

Everything here is native DataFrame expressions — the MinHash signatures are
computed with higher-order functions (`transform`/`array_min`) over
`xxhash64`, entirely inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataquality_spark import spec
from dataquality_spark.functions import text as TX

# MinHash parameters: 64 permutations in 16 bands × 4 rows (public LSH
# S-curve: P(candidate) ≈ 1-(1-s^4)^16 → ~0.5 at s≈0.56, ~0.998 at s=0.91,
# the reference's similarity threshold spec.NEAR_DUP_SIMILARITY)
MINHASH_PERMS = 64
LSH_BANDS = 16
LSH_ROWS = 4
# Mersenne-31: a,b,x < 2^31 keeps a*x+b < 2^62 — no ANSI long overflow
_MERSENNE = (1 << 31) - 1


def _perm_params(k: int = MINHASH_PERMS) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h_i(x) = (a*x + b) mod p."""
    from dataquality_spark.models.corpus import mix64
    out = []
    for i in range(k):
        a = (int(mix64(2 * i + 1)) % (_MERSENNE - 1)) + 1
        b = int(mix64(2 * i + 2)) % _MERSENNE
        out.append((a, b))
    return out


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of normalized text (array<string>)."""
    words = F.split(TX.normalize_text(text), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    return F.when(F.size(words) >= n,
                  F.array_distinct(F.transform(
                      idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n))))
                  ).otherwise(F.array(TX.normalize_text(text)))


def minhash_signature(shingle_col: Column) -> Column:
    """array<bigint> of MINHASH_PERMS min-hashes — all JVM-side.

    xxhash64 gives the base shingle hash; each permutation is an affine map
    mod a Mersenne prime, computed inside `transform` lambdas (codegen'd).
    """
    base = F.transform(shingle_col, lambda s: F.pmod(F.xxhash64(s),
                                                     F.lit(_MERSENNE)))
    sigs = []
    for a, b in _perm_params():
        sigs.append(F.array_min(F.transform(
            base, lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(_MERSENNE))))
    return F.array(*sigs)


def lsh_band_keys(sig_col: Column) -> Column:
    """array<bigint>: one bucket key per band = xxhash64 of the band slice."""
    keys = []
    for band in range(LSH_BANDS):
        sl = F.slice(sig_col, band * LSH_ROWS + 1, LSH_ROWS)
        keys.append(F.xxhash64(F.lit(band), F.concat_ws(",", F.transform(
            sl, lambda x: x.cast("string")))))
    return F.array(*keys)


def exact_dedup_winners(df: DataFrame, id_cols: tuple[str, str] = ("warc_ts", "url"),
                        text_col: str = "text", salt_buckets: int = 64,
                        precomputed_hash: str | None = None) -> DataFrame:
    """Per-content-hash winner via salted two-phase aggregation.

    Returns ``(content_hash, win)`` where win = min struct of id_cols.
    Result is provably invariant to ``salt_buckets`` (min is associative &
    commutative) — property-tested in tests/test_dedup.py.
    """
    ts, uid = id_cols
    h = (F.col(precomputed_hash) if precomputed_hash
         else TX.content_hash(F.col(text_col))).alias("content_hash")
    salted = df.select(
        h,
        F.pmod(F.xxhash64(F.col(uid)), F.lit(salt_buckets)).alias("_salt"),
        F.struct(F.col(ts), F.col(uid)).alias("_id"),
    )
    partial = salted.groupBy("content_hash", "_salt").agg(
        F.min("_id").alias("_win_partial")
    )
    return partial.groupBy("content_hash").agg(
        F.min("_win_partial").alias("win")
    )


def with_dedup_flag(df: DataFrame, id_cols: tuple[str, str] = ("warc_ts", "url"),
                    text_col: str = "text", salt_buckets: int = 64,
                    flag_col: str = "r_dedup") -> DataFrame:
    """Append ``r_dedup`` = True iff the row is its content group's winner.

    One salted shuffle (aggregation) + one hash-join back on content_hash
    (AQE skew-join is the backstop for hot hashes).
    """
    ts, uid = id_cols
    winners = exact_dedup_winners(df, id_cols, text_col, salt_buckets)
    df = df.withColumn("content_hash", TX.content_hash(F.col(text_col)))
    joined = df.join(winners, "content_hash", "left")
    return joined.withColumn(
        flag_col,
        (F.col(f"win.{ts}") == F.col(ts)) & (F.col(f"win.{uid}") == F.col(uid)),
    ).drop("win")


def near_dup_pairs(df: DataFrame, id_col: str = "url", text_col: str = "text",
                   jaccard_threshold: float = spec.NEAR_DUP_SIMILARITY,
                   shingle_n: int = 3) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash-banded LSH, verified with
    exact shingle Jaccard. Returns (id_a, id_b, jaccard), id_a < id_b.

    Plan shape: explode band keys → self-join on (band, key) → distinct pairs
    → exact verify. The join is equi-join on bucket keys (shuffle hash / AQE);
    no cross join ever materializes (SURVEY.md J-2 requirement).
    """
    base = df.select(
        F.col(id_col).alias("_id"),
        shingles(F.col(text_col), shingle_n).alias("_sh"),
    ).where(F.size("_sh") > 0)
    with_keys = base.withColumn("_sig", minhash_signature(F.col("_sh"))) \
                    .withColumn("_bk", lsh_band_keys(F.col("_sig")))
    buckets = with_keys.select(
        "_id", "_sh", F.explode("_bk").alias("_bucket")
    )
    a = buckets.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"),
                       "_bucket")
    b = buckets.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"),
                       "_bucket")
    pairs = (
        a.join(b, "_bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash64(text: Column, shingle_n: int = 2) -> Column:
    """64-bit SimHash of word shingles — native bit arithmetic.

    For each bit position j, sum ±1 over shingle hashes' bit j; bit j of the
    result is 1 iff the sum is positive. Expressed with aggregate() over the
    shingle-hash array, packing counts via shiftright/bitwise ops.
    """
    hashes = F.transform(shingles(text, shingle_n), lambda s: F.xxhash64(s))
    bits = []
    for j in range(64):
        cnt = F.aggregate(
            hashes, F.lit(0).cast("long"),
            lambda acc, h: acc + F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1,
        )
        bits.append(F.when(cnt > 0, F.lit(1).cast("long")).otherwise(F.lit(0)))
    out = F.lit(0).cast("long")
    for j, bit in enumerate(bits):
        out = out.bitwiseOR(F.shiftleft(bit, j))
    return out
