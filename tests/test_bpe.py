"""BPE tokenizer: incremental trainer ≡ naive reference, encode properties,
UDF parity, partitioning invariance of the distributed word count."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataquality_spark.models import bpe

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


# -- independent reference: recount every pair from scratch each merge ------

def _naive_train(counts, n_merges):
    vocab = {}
    for w, c in counts:
        if w:
            vocab[tuple(list(w) + [bpe.END])] = (
                vocab.get(tuple(list(w) + [bpe.END]), 0) + c)
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for syms, c in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            k = tuple(out)
            new_vocab[k] = new_vocab.get(k, 0) + c
        vocab = new_vocab
    return merges


CORPUS = [
    ("lower", 18), ("lowest", 7), ("newer", 12), ("newest", 9),
    ("wider", 5), ("low", 20), ("new", 15), ("widest", 3),
    ("slower", 4), ("slowest", 2), ("er", 1), ("e", 6),
]


def test_incremental_matches_naive_reference():
    for n in (1, 5, 20, 60):
        art = bpe.train_bpe_from_counts(CORPUS, n_merges=n)
        assert art["merges"] == _naive_train(CORPUS, n)


def test_training_deterministic_and_exhausts():
    a = bpe.train_bpe_from_counts(CORPUS, n_merges=10_000)
    b = bpe.train_bpe_from_counts(CORPUS, n_merges=10_000)
    assert a["merges"] == b["merges"]
    # fully merged: every word becomes a single token
    for w, _ in CORPUS:
        assert bpe.encode_word(w, a["ranks"]) == [w + bpe.END]


def test_encode_reconstruction_and_monotonicity():
    art = bpe.train_bpe_from_counts(CORPUS, n_merges=25)
    prev_ranks = {}
    prev_len = None
    for k in (0, 5, 15, 25):
        ranks = {p: r for p, r in art["ranks"].items() if r < k}
        total = 0
        for w in ("lowest", "newer", "unseenword", "slowest", "x"):
            toks = bpe.encode_word(w, ranks)
            assert "".join(toks) == w + bpe.END  # lossless
            total += len(toks)
        if prev_len is not None:
            assert total <= prev_len  # more merges never add tokens
        prev_len, prev_ranks = total, ranks
    assert bpe.encode_word("", art["ranks"]) == [bpe.END]


def test_encode_batch_kernel_nulls_and_fertility():
    art = bpe.train_bpe_from_counts(CORPUS, n_merges=60)
    out = bpe.encode_batch(
        pd.Series(["low lower low", None, "", "   ", "zzzq"]), art["ranks"])
    assert out["n_bpe_tokens"].tolist()[1:4] == [0, 0, 0]
    assert out["n_words"].tolist() == [3, 0, 0, 0, 1]
    row0 = out.iloc[0]
    assert row0["fertility"] == round(row0["n_bpe_tokens"] / 3, 6)
    assert pd.isna(out["fertility"].iloc[1])
    # "zzzq" unseen: falls back toward characters, never errors, no UNK
    assert out["n_bpe_tokens"].iloc[4] >= 1


def test_word_counts_partitioning_invariant(spark, docs_df):
    one = bpe.corpus_word_counts(docs_df.coalesce(1)).collect()
    many = bpe.corpus_word_counts(docs_df.repartition(13)).collect()
    assert sorted((r["word"], r["cnt"]) for r in one) == \
        sorted((r["word"], r["cnt"]) for r in many)


def test_udf_matches_driver_kernel(spark, docs_df):
    art = bpe.train_bpe(docs_df, text_col="text", n_merges=80)
    assert art["n_words_dropped"] == 0
    udf = bpe.make_bpe_udf(spark, art)
    got = (docs_df.select("doc_id", udf("text").alias("s"))
           .select("doc_id", "s.*").orderBy("doc_id").toPandas())
    texts = [r["text"] for r in
             docs_df.orderBy("doc_id").select("text").collect()]
    want = bpe.encode_batch(pd.Series(texts, dtype=object), art["ranks"])
    assert got["n_bpe_tokens"].tolist() == want["n_bpe_tokens"].tolist()
    assert got["n_words"].tolist() == want["n_words"].tolist()
    pd.testing.assert_series_equal(
        got["fertility"], want["fertility"], check_names=False)


def test_truncation_metadata(spark, docs_df):
    art = bpe.train_bpe(docs_df, text_col="text", n_merges=5,
                        max_vocab_words=3)
    assert art["n_words_used"] == 3
    assert art["n_words_dropped"] > 0


def test_encode_properties_hypothesis():
    from hypothesis import given, settings, strategies as st
    art = bpe.train_bpe_from_counts(CORPUS, n_merges=40)

    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet=st.characters(blacklist_categories=("Zs", "Cc")),
                   min_size=0, max_size=24))
    def check(word):
        toks = bpe.encode_word(word, art["ranks"])
        assert "".join(toks) == word + bpe.END          # lossless always
        assert len(toks) <= len(word) + 1               # never longer than chars
        # idempotent w.r.t. re-encoding the merged output's concatenation
        assert bpe.encode_word(word, art["ranks"]) == toks

    check()


def test_bpe_pack_composition(spark):
    """The composed tokenize→pack query: offsets must equal the exclusive
    prefix sum of the UDF's own token counts in (h, doc_id) order, and
    chunk ids must be offset div 512 — recomputed independently in pandas."""
    from dataquality_spark.queries import _CTX_LEN, q_bpe_pack
    out = q_bpe_pack(spark, SF).toPandas()
    assert len(out) > 0 and (out["n_tokens"] > 0).all()
    h = (out["doc_id"] * 2654435761) % 2147483647
    df = out.assign(h=h).sort_values(["h", "doc_id"]).reset_index(drop=True)
    expect_off = df["n_tokens"].cumsum().shift(fill_value=0)
    assert (df["offset"].to_numpy() == expect_off.to_numpy()).all()
    assert (df["chunk_id"] == df["offset"] // _CTX_LEN).all()
    assert (df["chunk_pos"] == df["offset"] % _CTX_LEN).all()
