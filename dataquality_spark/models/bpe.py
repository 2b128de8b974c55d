"""Distributed BPE tokenizer training + tokenization (Sennrich et al. 2016).

Real byte-pair-encoding over the corpus, structured the way production
tokenizer training actually scales (this is also how HuggingFace
``tokenizers`` and SentencePiece train): the only pass over the data is a
**distributed word count** — one shuffle with map-side partial aggregation —
because BPE merge decisions depend solely on the weighted vocabulary
(distinct words × counts), never on the raw token stream. By Heaps' law the
distinct-word table is sublinear in corpus size, so the merge loop runs
driver-side on a compact table (bounded further by a logged top-K cap), and
the learned merge ranks are broadcast back for Arrow-batched tokenization.

At 100 TB: stage 1 is a single groupBy("word") shuffle carrying
(word, partial_count) pairs — partial agg collapses each executor's stream
to its local distinct words before the exchange. Stage 2 is O(K · merges)
on the driver (K ≤ 2^17 weighted words — megabytes). Stage 3 is a broadcast
dict + one pandas UDF with per-batch word memoization: natural text repeats
words heavily, so encode work is ~O(distinct words per batch), not O(tokens).

Upstream shape this mirrors (reference has only whitespace/regex token
counting — SURVEY §2.8 "token counting"): this makes the token-budget /
sequence-packing operators (operators/packing.py) consume REAL subword
counts instead of whitespace proxies.

Determinism: merge ties break on (count desc, pair lexicographic asc);
word-count truncation ties break on (count desc, word asc). No hash
involvement anywhere, so training is reproducible across partitionings —
property-tested in tests/test_bpe.py.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

END = "</w>"  # end-of-word marker: lets merges learn suffixes ("ing</w>")

# ASCII \s+, matching Java's \s in the Spark-side split — Python's default
# \s (and str.split()) also match unicode spaces like NBSP, which would
# tokenize differently at encode time than at train time
_WS = re.compile(r"\s+", re.ASCII)


# ---------------------------------------------------------------------------
# Stage 1 — distributed weighted vocabulary
# ---------------------------------------------------------------------------

def corpus_word_counts(df: DataFrame, text_col: str = "text",
                       lowercase: bool = True) -> DataFrame:
    """(word, cnt) via explode → groupBy. ONE shuffle; partial aggregation
    collapses per-executor duplicates before the exchange (HashAggregate
    appears on both sides of the Exchange in the plan)."""
    txt = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    words = F.explode(F.split(F.trim(txt), r"\s+")).alias("word")
    return (df.where(F.col(text_col).isNotNull())
              .select(words)
              .where(F.col("word") != "")
              .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))


# ---------------------------------------------------------------------------
# Stage 2 — driver-side merge loop on the compact weighted vocabulary
# ---------------------------------------------------------------------------

def train_bpe_from_counts(counts: list[tuple[str, int]],
                          n_merges: int = 200) -> dict:
    """Sennrich-style BPE with incremental pair-count maintenance.

    Each word is a symbol tuple ending in END. Per merge: pick the
    (count, -lex) max pair, rewrite only the words that contain it (an
    inverted index pair→word ids avoids rescanning the vocabulary), and
    patch neighbour pair counts in place. Complexity ~O(total rewrites),
    vs the naive recount's O(V) per merge — parity with a from-scratch
    recount implementation is pytest-enforced.
    """
    vocab: list[list[str]] = []
    freqs: list[int] = []
    for w, c in counts:
        if w:
            vocab.append(list(w) + [END])
            freqs.append(int(c))

    pair_counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}  # pair -> word indexes

    def _add(pair: tuple[str, str], wi: int, n: int) -> None:
        pair_counts[pair] = pair_counts.get(pair, 0) + n
        if pair_counts[pair] <= 0:
            pair_counts.pop(pair)
            where.get(pair, set()).discard(wi)
        elif n > 0:
            where.setdefault(pair, set()).add(wi)
        else:
            # retraction with the global count still positive: drop wi now —
            # the rewrite loop retracts ALL old adjacencies before adding
            # the new ones back, so if the word still contains the pair the
            # following positive add re-inserts it; without the discard,
            # stale ids accumulate and degrade the per-merge rewrite toward
            # a vocabulary rescan
            where.get(pair, set()).discard(wi)

    for wi, syms in enumerate(vocab):
        for a, b in zip(syms, syms[1:]):
            _add((a, b), wi, freqs[wi])

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        # count desc, then lexicographically smallest pair — deterministic
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new_sym = best[0] + best[1]
        for wi in sorted(where.get(best, ())):
            syms, n = vocab[wi], freqs[wi]
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            # retract old adjacencies, add new ones (only for this word)
            for a, b in zip(syms, syms[1:]):
                _add((a, b), wi, -n)
            for a, b in zip(out, out[1:]):
                _add((a, b), wi, n)
            vocab[wi] = out
        pair_counts.pop(best, None)
        where.pop(best, None)

    ranks = {p: r for r, p in enumerate(merges)}
    toks = {s for syms in vocab for s in syms}
    return {"merges": merges, "ranks": ranks,
            "vocab_tokens": sorted(toks), "n_merges": len(merges)}


def train_bpe(df: DataFrame, text_col: str = "text", n_merges: int = 200,
              max_vocab_words: int = 1 << 17) -> dict:
    """End-to-end training: distributed counts → deterministic top-K
    truncation (count desc, word asc — NO silent cap: dropped-word count is
    recorded in the artifact) → driver merge loop."""
    wc = corpus_word_counts(df, text_col).persist()
    try:
        top = (wc.orderBy(F.desc("cnt"), F.asc("word"))
                 .limit(max_vocab_words).collect())
        # persisted: the truncation-count pass reads the cached aggregate,
        # not a second full corpus scan
        n_total = wc.count() if len(top) == max_vocab_words else len(top)
    finally:
        wc.unpersist()
    art = train_bpe_from_counts([(r["word"], r["cnt"]) for r in top],
                                n_merges)
    art["n_words_used"] = len(top)
    art["n_words_dropped"] = n_total - len(top)
    return art


# ---------------------------------------------------------------------------
# Stage 3 — encoding (driver kernel + broadcast Arrow UDF)
# ---------------------------------------------------------------------------

def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank merge loop (the classic GPT-2-style ``bpe``
    function shape, public). Unseen character pairs simply never merge —
    BPE has no UNK; worst case a word stays as characters."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def encode_batch(texts: pd.Series, ranks: dict) -> pd.DataFrame:
    """Shared kernel (UDF + oracle parity, same contract as models/udf.py):
    per-doc BPE token count and fertility (tokens per word — the standard
    tokenizer-quality signal; gibberish fragments into near-char tokens,
    fertility → word length). Word-level memo per batch: cost is
    O(distinct words in batch), not O(tokens)."""
    memo: dict[str, int] = {}
    n_tok, n_words = [], []
    for t in texts:
        if not isinstance(t, str):
            n_tok.append(0)
            n_words.append(0)
            continue
        # no strip() shortcut: str.strip is unicode-aware and would call a
        # pure-NBSP text empty while the ASCII split (= the train-time
        # tokenization) sees one word
        tot = w = 0
        for word in filter(None, _WS.split(t.lower())):
            k = memo.get(word)
            if k is None:
                k = memo[word] = len(encode_word(word, ranks))
            tot += k
            w += 1
        n_tok.append(tot)
        n_words.append(w)
    out = pd.DataFrame({"n_bpe_tokens": n_tok, "n_words": n_words})
    out["fertility"] = (out["n_bpe_tokens"] / out["n_words"]).where(
        out["n_words"] > 0).round(6)
    return out


BPE_SCHEMA = T.StructType([
    T.StructField("n_bpe_tokens", T.LongType()),
    T.StructField("n_words", T.LongType()),
    T.StructField("fertility", T.DoubleType()),
])


def make_bpe_udf(spark: SparkSession, artifact: dict):
    """Broadcast the rank dict once; one struct-returning Arrow UDF."""
    b = spark.sparkContext.broadcast(artifact["ranks"])

    @F.pandas_udf(BPE_SCHEMA)
    def bpe_stats(text: pd.Series) -> pd.DataFrame:
        return encode_batch(text, b.value)

    # same plan constraint as models/udf.py: stop Catalyst duplicating the
    # call per extracted struct field
    return bpe_stats.asNondeterministic()
