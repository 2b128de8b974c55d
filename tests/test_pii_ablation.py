"""Round-4 additions: pii_stats, rule_ablation, readability,
minhash_error (the exact-oracle sweep in tools/verify_queries.py is the
cross-engine gate; these pin the operator-level semantics directly)."""

import pyspark.sql.functions as F
import pytest

SF = "/root/testdata/sf0.001"


def test_minhash_diagnostics_identical_docs(spark):
    from dataquality_spark.operators.dedup import minhash_pair_diagnostics
    t = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, t), (2, t), (3, "entirely different words live here today")],
        "id long, text string")
    rows = {(r.id_a, r.id_b): r for r in
            minhash_pair_diagnostics(df, id_col="id").collect()}
    assert (1, 2) in rows  # identical docs always collide in every band
    r = rows[(1, 2)]
    assert r.est_jaccard == 1.0 and r.exact_jaccard == 1.0
    assert r.abs_err == 0.0
    for r in rows.values():  # estimator and truth both live in [0, 1]
        assert 0.0 <= r.est_jaccard <= 1.0
        assert 0.0 <= r.exact_jaccard <= 1.0
        assert r.abs_err == pytest.approx(
            abs(r.est_jaccard - r.exact_jaccard), abs=1e-6)


def test_minhash_diagnostics_estimator_tracks_truth(spark):
    # A pair sharing half its shingles: the 64-perm estimate must land
    # within the ~3-sigma binomial band of the exact Jaccard.
    base = [f"w{i}" for i in range(40)]
    a = " ".join(base)
    b = " ".join(base[:20] + [f"x{i}" for i in range(20)])
    df = spark.createDataFrame([(1, a), (2, b)], "id long, text string")
    from dataquality_spark.operators.dedup import minhash_pair_diagnostics
    out = minhash_pair_diagnostics(df, id_col="id",
                                   max_bucket_size=None).collect()
    if out:  # collision at j≈0.3 is likely but not guaranteed
        r = out[0]
        assert r.abs_err <= 3 * (0.25 / 64) ** 0.5 + 0.06


def test_pii_stats_counts_planted_fixtures(spark):
    from dataquality_spark.queries import q_pii_stats
    rows = {r.doc_id: r for r in q_pii_stats(spark, SF).collect()}
    assert rows, "corpus empty?"
    for doc_id, r in rows.items():
        assert r.n_email >= (1 if doc_id % 3 == 0 else 0)
        assert r.n_phone >= (1 if doc_id % 5 == 0 else 0)
        assert r.n_ip >= (1 if doc_id % 7 == 0 else 0)
        assert r.n_tox >= (1 if doc_id % 17 == 0 else 0)
        assert r.pii_total == (r.n_email + r.n_phone + r.n_ip + r.n_id
                               + r.n_iban + r.n_tox)
    # the plants actually fire: corpus-level rates are in the right range
    n = len(rows)
    assert sum(r.n_email > 0 for r in rows.values()) >= n // 3


def test_rule_ablation_accounting(spark):
    from dataquality_spark.queries import q_rule_ablation, q_heuristic_gate
    ab = {r.rule: r for r in q_rule_ablation(spark, SF).collect()}
    assert set(ab) == {"r_min_words", "r_max_words", "r_mean_wlen",
                       "r_symbol", "r_stopword"}
    g = q_heuristic_gate(spark, SF)
    n = g.count()
    n_keep = g.where(F.coalesce("keep", F.lit(False))).count()
    for r in ab.values():
        assert 0 <= r.n_unique_fail <= r.n_fail <= n
        assert r.fail_frac == pytest.approx(r.n_fail / n, abs=1e-6)
        # removing one rule can rescue at most its unique-fail docs
        assert n_keep + r.n_unique_fail <= n


def test_readability_formula(spark):
    from dataquality_spark.queries import q_readability
    df = spark.createDataFrame(
        [(1, "the cat sat. the dog ran!"), (2, None), (3, "rhythm tsk")],
        "doc_id long, text string")
    import tempfile
    import os
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        rows = {r.doc_id: r for r in q_readability(spark, d).collect()}
    r1 = rows[1]
    assert (r1.n_words, r1.n_sents) == (6, 2)
    assert r1.n_syllables == 6  # one vowel group per word here
    expected = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
    assert r1.flesch == pytest.approx(expected, abs=1e-6)
    assert rows[2].n_words == 0 and rows[2].flesch is None
    assert rows[3].n_syllables == 1  # 'y' in rhythm; 'tsk' has none


def test_dedup_cluster_stats_accounting(spark):
    from dataquality_spark.queries import (q_dedup_cluster_stats,
                                           q_fuzzy_dedup_decisions)
    hist = q_dedup_cluster_stats(spark, SF).collect()
    n_docs = q_fuzzy_dedup_decisions(spark, SF).count()
    assert sum(r.n_docs for r in hist) == n_docs
    for r in hist:
        assert r.n_docs == r.cluster_size * r.n_clusters
        assert r.n_dropped == (r.cluster_size - 1) * r.n_clusters


def test_langid_confusion_totals_and_codes(spark):
    from dataquality_spark.queries import q_langid_confusion
    from dataquality_spark.queries import _t
    rows = q_langid_confusion(spark, SF).collect()
    assert sum(r.n_docs for r in rows) == \
        _t(spark, SF, "documents").count()
    assert {r.guess for r in rows} <= {"de", "en", "es", "fr", "und"}


def test_langid_confusion_diagonal_on_planted_text(spark):
    # real stopword text per language → the guess must hit the diagonal
    # (the synthetic corpus's vocabulary is English-ish for every label,
    # so the diagonal check needs planted text, not the fixture corpus)
    import os
    import tempfile
    from dataquality_spark.queries import q_langid_confusion
    df = spark.createDataFrame(
        [(1, "the cat and the dog are in the house", "en"),
         (2, "der hund und die katze sind nicht im haus", "de"),
         (3, "le chien et le chat sont dans la maison", "fr"),
         (4, "el perro y el gato son de la casa", "es"),
         (5, "zzz qqq xxx", "en"),   # no stopwords anywhere → 'und'
         (6, None, "de")],           # NULL text → 'und'
        "doc_id long, text string, lang string")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        got = {(r.lang, r.guess): r.n_docs
               for r in q_langid_confusion(spark, d).collect()}
    assert got == {("en", "en"): 1, ("de", "de"): 1, ("fr", "fr"): 1,
                   ("es", "es"): 1, ("en", "und"): 1, ("de", "und"): 1}
