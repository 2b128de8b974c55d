"""Sequence packing: concatenate-and-chunk corpus prep for LLM training.

Training pipelines pack documents into fixed-length context windows by
concatenating the token stream in a deterministic order and slicing every
``ctx_len`` tokens (the GPT-style pack; each document lands at a global
token offset, and the chunk id is just ``offset // ctx_len``). The whole
problem is therefore a GLOBAL running sum of token counts in a total order
— and the naive Spark spelling, ``Window.orderBy(...)`` with no partition
key, collapses to ONE task holding the entire corpus.

``with_global_offset`` is the scale-safe spelling — the classic two-phase
distributed prefix sum:

  1. range-partition by the order key (``repartitionByRange`` — Spark
     samples the key distribution, so partitions are balanced even for
     skewed keys), then a WITHIN-partition running sum via a window keyed
     on ``spark_partition_id()`` — parallel across partitions;
  2. per-partition totals (one tiny agg, #partitions rows) are collected,
     their exclusive prefix is computed on the driver, and a broadcast map
     join adds each partition's base offset.

Wall-clock is two scans + one tiny collect instead of a single-reducer
sort; the order (key asc, then tiebreak) is identical to the one-partition
window, which is what the DuckDB oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_global_offset(df: DataFrame, size_col: str, order_by: list[str],
                       out_col: str = "offset",
                       num_partitions: int | None = None,
                       cleanup: list[DataFrame] | None = None) -> DataFrame:
    """Append ``out_col`` = exclusive global running sum of ``size_col`` in
    the total order given by ``order_by`` (columns must form a total order;
    ties would make the prefix sum nondeterministic). ``cleanup``: the
    range-partitioned frame is persisted for cross-job correctness (see
    inline comment); pass a list to receive the handle and unpersist once
    the returned frame is materialized (same contract as
    ``dedup.near_dup_pairs``)."""
    parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions")
    ranged = df.repartitionByRange(int(parts), *[F.col(c) for c in order_by])
    ranged = (ranged.withColumn("_pid", F.spark_partition_id())
              # explicit hash exchange on _pid at the operator's OWN width:
              # the window below otherwise inserts an implicit exchange at
              # the session's wide-start AQE initialPartitionNum (1024),
              # and because it sits under the correctness persist(), AQE
              # never coalesces it (cached-plan output partitioning is
              # pinned) — measured 3× on sequence_pack at sf0.1 (0.8s →
              # 2.4s warm) from repeated 1024-tiny-task stages. Same
              # shuffle volume either way; this one is `parts` wide.
              .repartition(int(parts), "_pid")
              .withColumn("_cum_in",
                          F.sum(F.col(size_col)).over(
                              Window.partitionBy("_pid")
                              .orderBy(*[F.col(c) for c in order_by])
                              .rowsBetween(Window.unboundedPreceding,
                                           Window.currentRow)))
              # persist is CORRECTNESS here, not caching: the totals
              # collect below and the caller's final action are separate
              # jobs, and each job's RangePartitioner re-SAMPLES its
              # boundaries — a row near a boundary may land in partition p
              # in one job and p+1 in the other, silently adding the wrong
              # base offset. The cache pins one materialized partitioning
              # that both jobs read.
              .persist())
    if cleanup is not None:
        cleanup.append(ranged)
    totals = (ranged.groupBy("_pid")
              .agg(F.sum(size_col).alias("_tot"))
              .collect())
    base, acc = {}, 0
    for r in sorted(totals, key=lambda r: r["_pid"]):
        base[r["_pid"]] = acc
        acc += r["_tot"]
    if base:
        base_map = F.create_map(
            *[F.lit(x) for kv in base.items() for x in kv])
        base_expr = F.coalesce(base_map[F.col("_pid")], F.lit(0))
    else:
        # empty input: a bare create_map() is map<void,void> and fails
        # analysis when indexed by the int _pid
        base_expr = F.lit(0)
    return (ranged
            .withColumn(out_col, base_expr
                        + F.col("_cum_in") - F.col(size_col))
            .drop("_pid", "_cum_in"))


def pack_sequences(df: DataFrame, ctx_len: int, size_col: str = "n_tokens",
                   order_by: list[str] | None = None,
                   cleanup: list[DataFrame] | None = None) -> DataFrame:
    """Concatenate-and-chunk packing: each doc gets its global token
    ``offset``, the training chunk it starts in (``chunk_id``), and its
    position within that chunk (``chunk_pos``). A doc whose tokens cross a
    chunk boundary spans into the next chunk, exactly as the concatenated
    token stream would — the assignment is a pure function of the order, so
    it is reproducible across runs, partitionings, and engines."""
    if order_by is None:
        order_by = ["doc_id"]
    out = with_global_offset(df, size_col, order_by, cleanup=cleanup)
    # integer div, not (offset / ctx).cast("long"): the double division
    # loses exactness past 2^53 global tokens and can disagree with the
    # exact modulo by one chunk
    return (out.withColumn("chunk_id",
                           F.expr(f"offset div {int(ctx_len)}"))
            .withColumn("chunk_pos", F.col("offset") % ctx_len))


def chunk_tokens(df: DataFrame, tokens_col: str, chunk_len: int,
                 stride: int, id_cols: list[str] | None = None,
                 sep: str = " ") -> DataFrame:
    """Per-document sliding-window chunking (the retrieval/BERT-style
    counterpart to ``pack_sequences``' cross-document concat): the token
    array is cut into windows of ``chunk_len`` tokens starting every
    ``stride`` tokens (``chunk_len > stride`` ⇒ adjacent chunks overlap by
    ``chunk_len - stride``). Window k covers tokens
    ``[k·stride, k·stride + chunk_len)``; a document with n tokens yields
    ``floor((n-1)/stride) + 1`` chunks (0 for an empty/NULL token array),
    so the final windows may be short but every token lands in ≥1 chunk.

    Returns ``id_cols + (chunk_idx, n_tokens, chunk_text)`` where
    ``chunk_text`` is the window's tokens joined by ``sep``.

    Scale shape: ZERO shuffle — one projection computes the chunk count,
    one generator (posexplode over a ``sequence``) emits the window
    starts, and each window is a ``slice`` of the already-materialized
    token array. Output grows ~n/stride rows per document, which is the
    operator's contract (a chunk table), not a plan artifact; nothing is
    keyed, nothing is exchanged, and the per-row work is O(chunk_len).
    """
    if id_cols is None:
        id_cols = ["doc_id"]
    if stride <= 0 or chunk_len <= 0:
        raise ValueError("chunk_len and stride must be positive")
    if chunk_len < stride:
        # the docstring's "every token lands in >= 1 chunk" guarantee only
        # holds when windows at least tile the stride; reject the silent
        # token-dropping configuration (round-5 advisor note)
        raise ValueError(
            f"chunk_len ({chunk_len}) < stride ({stride}) would drop the "
            f"tokens between windows — use chunk_len >= stride")
    toks = F.coalesce(F.col(tokens_col), F.array().cast("array<string>"))
    # integer div, not floor(double /): same exactness rule as
    # pack_sequences — (n-1) is non-negative under the nc>0 guard, where
    # truncating div ≡ floor
    base = (df.select(*id_cols, toks.alias("_toks"))
            .withColumn("_nc", F.when(F.size("_toks") <= 0, F.lit(0))
                        .otherwise(F.expr(
                            f"(size(_toks) - 1) div {int(stride)}")
                            .cast("int") + F.lit(1))))
    starts = base.select(
        *id_cols, "_toks",
        F.posexplode(F.sequence(F.lit(0), F.col("_nc") - 1))
        .alias("chunk_idx", "_k")).where(F.col("_nc") > 0)
    win = F.slice(F.col("_toks"),
                  F.col("chunk_idx") * int(stride) + 1, int(chunk_len))
    return starts.select(
        *id_cols, F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(win).cast("long").alias("n_tokens"),
        F.concat_ws(sep, win).alias("chunk_text"))
