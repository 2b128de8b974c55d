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

import numpy as np
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
                      driver_max_edges: int = 1_000_000,
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

    Size-adaptive iteration (the `operators/components.py` pattern): once
    the corpus has been collapsed to the vocabulary-bounded edge table, a
    graph at or under ``driver_max_edges`` iterates as a vectorized int64
    numpy loop on the driver (a 1M-edge table is ~tens of MB; three
    distributed join rounds on a small graph are pure stage overhead —
    measured 7.7s → ~2s at the bench shape), while a larger graph runs
    the same spec as distributed join+aggregate rounds. Both paths
    compute identical integers; `tests/test_textrank.py` pins the
    equivalence.

    ``cleanup``: the vocabulary-bounded edge frame is persisted (the
    guard, the path choice and the iteration reuse it — and the node
    frame too on the distributed path) and appended for the caller to
    unpersist after materialization."""
    ws = portable_tokens(F.col(text_col)).alias("ws")
    base = docs.select(ws).where(F.size("ws") > 0)
    nodes = base.select(F.explode("ws").alias("token")).distinct()
    raw = (base.where(F.size("ws") >= 2)
           .select(F.explode(F.arrays_zip(
               F.slice("ws", 1, F.size("ws") - 1).alias("a"),
               F.slice("ws", 2, F.size("ws") - 1).alias("b"))).alias("p"))
           .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
           .where(F.col("a") != F.col("b")))
    # aggregate DIRECTED pairs first — one corpus-sized shuffle — then
    # symmetrize the vocabulary-bounded result; unioning the raw pair
    # stream with its swap instead would explode the corpus twice
    directed = (raw.groupBy(F.col("a").alias("src"), F.col("b").alias("dst"))
                .agg(F.count("*").alias("w")))
    edges = (directed.unionAll(directed.select(F.col("dst").alias("src"),
                                               F.col("src").alias("dst"),
                                               "w"))
             .groupBy("src", "dst").agg(F.sum("w").alias("w"))
             .persist())
    if cleanup is not None:
        cleanup.append(edges)

    # int64 envelope: rank mass stays ≈ V·scale under damping, so the
    # largest product in an iteration is bounded by V·scale·max(w).
    def _check_envelope(n_nodes: int, max_w: int) -> None:
        if n_nodes * scale * max(max_w, 1) > _INT64_MAX:
            raise ValueError(
                f"textrank_keywords int64 envelope exceeded: vocabulary "
                f"{n_nodes} × scale {scale} × max edge weight {max_w} "
                f"leaves the rank·weight product past 2^63 — lower "
                f"`scale` (rank resolution) until V·scale·max(w) < 2^63.")

    e_stats = edges.agg(F.count("*").alias("n"),
                        F.max("w").alias("m")).first()
    n_edges, max_w = e_stats["n"], e_stats["m"] or 0
    base_r = (15 * scale) // 100
    if n_edges <= driver_max_edges:
        # the driver loop collects nodes anyway — no separate count job,
        # no persist; the envelope check runs on the collected vocabulary
        return _iterate_driver(nodes, edges, k=k, iters=iters, scale=scale,
                               base_r=base_r, max_w=max_w,
                               check=_check_envelope)

    # distributed fixpoint: nodes joins every round → persist + count it
    nodes = nodes.persist()
    if cleanup is not None:
        cleanup.append(nodes)
    _check_envelope(nodes.count(), max_w)
    # out-weight join only on the distributed path — the driver loop
    # derives wout from the collected edges for free
    wout = edges.groupBy("src").agg(F.sum("w").alias("wout"))
    ew = edges.join(wout, "src")
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


def _iterate_driver(nodes: DataFrame, edges: DataFrame, *, k: int,
                    iters: int, scale: int, base_r: int, max_w: int,
                    check) -> DataFrame:
    """The same integer iteration, vectorized on the driver over the
    already-collapsed (and size-checked) edge table. Every operation is
    int64 with non-negative operands, so numpy ``//`` computes exactly
    what Spark ``div`` and DuckDB ``//`` compute."""
    spark = nodes.sparkSession
    toks = [r["token"] for r in nodes.collect()]
    check(len(toks), max_w)
    idx = {t: i for i, t in enumerate(toks)}
    rows = edges.collect()
    src = np.fromiter((idx[r["src"]] for r in rows), dtype=np.int64,
                      count=len(rows))
    dst = np.fromiter((idx[r["dst"]] for r in rows), dtype=np.int64,
                      count=len(rows))
    w = np.fromiter((r["w"] for r in rows), dtype=np.int64, count=len(rows))
    wout_by_node = np.zeros(len(toks), dtype=np.int64)
    np.add.at(wout_by_node, src, w)
    wout = wout_by_node[src]
    r = np.full(len(toks), scale, dtype=np.int64)
    for _ in range(iters):
        s = np.zeros(len(toks), dtype=np.int64)
        np.add.at(s, dst, (r[src] * w) // wout)
        r = base_r + (85 * s) // 100
    order = sorted(range(len(toks)), key=lambda i: (-int(r[i]), toks[i]))[:k]
    return spark.createDataFrame(
        [(toks[i], int(r[i])) for i in order], "token: string, score: long")
