"""TextRank keyword extraction (Mihalcea & Tarau 2004) as join algebra.

Corpus-level keyword ranking over the word co-occurrence graph: adjacent
token pairs (window 2) become undirected weighted edges, and a fixed
number of unrolled PageRank iterations scores every token. The reference
has no graph operator — this extends the text-analysis family
(`corpus_ngrams`, `bm25_topk`) with the classic graph-centrality scorer a
curation pipeline uses for corpus keyword profiling, and doubles as the
repo's iterative-graph pattern: each iteration is a join + aggregate on a
vocabulary-bounded edge table, never a pass over the corpus.

Engine-portable by construction (the dsir_select playbook):
  * tokens come from the portable ASCII normalize spec (strip non-ASCII
    BEFORE lowercasing, explicit ASCII whitespace class — the
    `shingles_portable` regex pair);
  * ranks are int64 fixed point and every per-edge contribution is the
    integer division ``(r * w) div wout`` on non-negative operands, where
    Spark ``div`` and DuckDB ``//`` agree bit-for-bit — no float anywhere
    in the iteration, so the oracle replays all iterations exactly.

Scale shape (100-TB audit): the only corpus-sized stage is the token-pair
explode, which a groupBy with map-side combine collapses to an edge table
bounded by vocabulary² (in practice far smaller — adjacency is sparse).
That table is persisted once; the ``iters`` PageRank rounds shuffle only
it. The damped update keeps total rank mass ≈ V·scale, so the int64
envelope is V·scale·max(w) < 2^63 — checked loudly against the persisted
edge table instead of silently overflowing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TEXTRANK_SCALE = 10 ** 8     # fixed-point unit for one rank point
TEXTRANK_DAMPING = 85        # d = 0.85 as an integer percentage
_INT64_MAX = (1 << 63) - 1

# the engine-portable ASCII normalize spec (operators/dedup.py
# shingles_portable): strip non-ASCII first so lower() never sees a
# codepoint Python and ICU case-map differently; explicit ws class
PORT_STRIP = r"[^A-Za-z0-9 \t\n\r\f\v]+"
PORT_WS = r"[ \t\n\r\f\v]+"


def portable_tokens(text_col: F.Column) -> F.Column:
    """text → array<string> of portable tokens (empty array for blank)."""
    t = F.lower(F.trim(F.regexp_replace(
        F.regexp_replace(F.coalesce(text_col, F.lit("")), PORT_STRIP, ""),
        PORT_WS, " ")))
    return F.when(t == "", F.array().cast("array<string>")) \
            .otherwise(F.split(t, " "))


def textrank_keywords(docs: DataFrame, *, k: int = 20, iters: int = 3,
                      text_col: str = "text",
                      scale: int = TEXTRANK_SCALE,
                      cleanup: list | None = None) -> DataFrame:
    """Top-``k`` corpus keywords by fixed-point weighted PageRank:
    (token, score) with score an int64 in units of ``scale`` = 1.0.

    Spec (replayed exactly by the SQL oracle):
      1. tokenize every document with the portable spec; drop empties;
      2. adjacent pairs (ws[i], ws[i+1]) with a ≠ b, both directions,
         counted into an undirected weighted edge table (src, dst, w);
      3. r₀(v) = scale; then ``iters`` rounds of
         r'(v) = (15·scale) div 100
               + (85 · Σ_{(u,v)} (r(u)·w_uv) div wout_u) div 100
         — all int64, all divisions on non-negative operands;
      4. top-k by rank desc, token asc.

    Isolated tokens (single-token docs, or tokens whose only neighbours
    equal themselves) keep the base rank (15·scale) div 100 after one
    round — they are nodes without in-edges, not dropped rows.

    ``cleanup``: the vocabulary-bounded edge/node frames are persisted
    (the ``iters`` rounds and the overflow guard reuse them) and appended
    for the caller to unpersist after materialization."""
    ws = portable_tokens(F.col(text_col)).alias("ws")
    base = docs.select(ws).where(F.size("ws") > 0)
    nodes = base.select(F.explode("ws").alias("token")).distinct().persist()
    raw = (base.where(F.size("ws") >= 2)
           .select(F.explode(F.arrays_zip(
               F.slice("ws", 1, F.size("ws") - 1).alias("a"),
               F.slice("ws", 2, F.size("ws") - 1).alias("b"))).alias("p"))
           .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
           .where(F.col("a") != F.col("b")))
    edges = (raw.unionAll(raw.select(F.col("b").alias("a"),
                                     F.col("a").alias("b")))
             .groupBy(F.col("a").alias("src"), F.col("b").alias("dst"))
             .agg(F.count("*").alias("w")))
    wout = edges.groupBy("src").agg(F.sum("w").alias("wout"))
    ew = edges.join(wout, "src").persist()
    if cleanup is not None:
        cleanup.extend([nodes, ew])

    # int64 envelope: rank mass stays ≈ V·scale under damping, so the
    # largest product in an iteration is bounded by V·scale·max(w).
    # Both counts run on the persisted vocabulary-bounded frames.
    n_nodes = nodes.count()
    max_w = (ew.agg(F.max("w")).first() or [0])[0] or 0
    if n_nodes * scale * max(max_w, 1) > _INT64_MAX:
        raise ValueError(
            f"textrank_keywords int64 envelope exceeded: vocabulary "
            f"{n_nodes} × scale {scale} × max edge weight {max_w} leaves "
            f"the rank·weight product past 2^63 — lower `scale` (rank "
            f"resolution) until V·scale·max(w) < 2^63.")

    base_r = (15 * scale) // 100
    ranks = nodes.select("token", F.lit(scale).cast("long").alias("r"))
    for _ in range(iters):
        contrib = (ew.join(ranks, ew.src == ranks.token)
                   .select(F.col("dst").alias("token"),
                           F.expr("(r * w) div wout").alias("c"))
                   .groupBy("token").agg(F.sum("c").alias("s")))
        ranks = (nodes.join(contrib, "token", "left")
                 .select("token",
                         (F.lit(base_r)
                          + F.expr(f"(85 * coalesce(s, 0L)) div 100"))
                         .cast("long").alias("r")))
    return (ranks.orderBy(F.desc("r"), F.asc("token")).limit(k)
            .select("token", F.col("r").alias("score")))
