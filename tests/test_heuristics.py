"""Per-rule unit fixtures (FIXTURES.md §3) — hand-written inputs with
hand-computed expected flags, plus Spark↔oracle parity on each slice.

The analogue of the reference's one-golden-CSV-per-test layout
(`run_tests/example_reports/`)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataquality_spark import oracle, spec
from dataquality_spark.rules.heuristics import rule_metrics, with_rule_flags

GOOD_EN = ("the quick brown fox jumps over the lazy dog and then it runs "
           "to the old house by the river where a small bird was waiting "
           "for the sun to rise above the hills in the morning light ") * 3


def _run(spark, rows):
    pdf = pd.DataFrame(rows, columns=["url", "text", "lang"])
    pdf["warc_ts"] = pd.Timestamp("2024-01-01")
    sdf = spark.createDataFrame(pdf)
    flags = with_rule_flags(sdf).toPandas().set_index("url")
    lab = oracle.heuristic_labels(pdf).set_index("url")
    return flags, lab


def _assert_parity(flags, lab):
    for r in spec.HEURISTIC_RULES:
        assert (flags[f"r_{r}"].astype(bool) == lab[f"r_{r}"].astype(bool)).all(), r


def test_fx_nulls(spark):
    rows = [
        ("u1", None, "en"),
        ("u2", "", "en"),
        ("u3", "   \n \t ", "en"),
        ("u4", GOOD_EN, "en"),
    ]
    flags, lab = _run(spark, rows)
    assert not flags.loc["u1", "r_nonempty"]
    assert not flags.loc["u2", "r_nonempty"]
    assert not flags.loc["u3", "r_nonempty"]
    assert flags.loc["u4", "r_nonempty"]
    _assert_parity(flags, lab)


def test_fx_wordstats(spark):
    rows = [
        ("u1", "too few words here", "en"),
        ("u2", GOOD_EN, "en"),
        ("u3", " ".join(["a"] * 100), "en"),            # mean len 1 → fail
        ("u4", " ".join(["verylongwordxxxxx"] * 100), "en"),  # mean len 17
    ]
    flags, lab = _run(spark, rows)
    assert not flags.loc["u1", "r_min_words"]
    assert flags.loc["u2", "r_min_words"] and flags.loc["u2", "r_mean_word_len"]
    assert not flags.loc["u3", "r_mean_word_len"]
    assert not flags.loc["u4", "r_mean_word_len"]
    _assert_parity(flags, lab)


def test_fx_symbols(spark):
    noisy = " ".join(w + "###" if i % 2 == 0 else w
                     for i, w in enumerate(GOOD_EN.split()))
    flags, lab = _run(spark, [("u1", noisy, "en"), ("u2", GOOD_EN, "en")])
    assert not flags.loc["u1", "r_symbol_ratio"]
    assert flags.loc["u2", "r_symbol_ratio"]
    _assert_parity(flags, lab)


def test_fx_stopwords(spark):
    salad = " ".join(["zorblex", "quixotic", "vrumple"] * 40)
    flags, lab = _run(spark, [("u1", salad, "en"), ("u2", GOOD_EN, "en")])
    assert not flags.loc["u1", "r_stopword_ratio"]
    assert flags.loc["u2", "r_stopword_ratio"]
    _assert_parity(flags, lab)


def test_fx_stopwords_lang_specific(spark):
    fr = ("le chat est sur la table et le chien est dans le jardin avec "
          "une balle pour jouer au soleil pendant que les oiseaux chantent "
          "dans les arbres du parc pres de la maison ") * 2
    flags, lab = _run(spark, [("u1", fr, "fr"), ("u2", fr, "fi")])
    # French stop words counted under lang=fr; under lang=fi they are not
    assert flags.loc["u1", "r_stopword_ratio"]
    assert not flags.loc["u2", "r_stopword_ratio"]
    _assert_parity(flags, lab)


def test_fx_duplines(spark):
    dup = "\n".join(["same line of repeated boilerplate"] * 9
                    + ["a unique closing line"])
    flags, lab = _run(spark, [("u1", dup, "en"), ("u2", GOOD_EN, "en")])
    assert not flags.loc["u1", "r_dup_lines"]
    assert flags.loc["u2", "r_dup_lines"]
    _assert_parity(flags, lab)


def test_fx_metrics_counts_sum(spark):
    """rule_metrics pass+fail must equal the row count (ref A3 sum check,
    `dimensions/accuracy/a3.py:39-53` spirit)."""
    rows = [(f"u{i}", GOOD_EN if i % 2 else "", "en") for i in range(60)]
    pdf = pd.DataFrame(rows, columns=["url", "text", "lang"])
    sdf = spark.createDataFrame(pdf)
    m = rule_metrics(with_rule_flags(sdf)).toPandas()
    assert set(m["rule_id"]) == set(spec.HEURISTIC_RULES)
    assert ((m["pass_count"] + m["fail_count"]) == 60).all()
    nonempty = m.set_index("rule_id").loc["nonempty"]
    assert nonempty["score"] == pytest.approx(0.5)


def test_top_ngram_char_frac_kernel():
    """Repetition-signal spec: max char mass of any word n-gram over the
    single-spaced text (Rae et al. 2021 §A1.1 shape)."""
    from dataquality_spark.functions.text import top_ngram_char_frac_py as f
    assert f("a b a b a b", 2) == pytest.approx(9 / 11)  # 'a b' ×3, len 3
    assert f("x y z", 3) == 1.0                          # whole text one gram
    assert f("", 2) == 0.0 and f(None, 2) == 0.0
    assert f("one", 2) == 0.0                            # fewer words than n
    assert f("spam spam spam spam", 2) == pytest.approx(27 / 19)  # can exceed 1


def test_dup_ngram_char_frac_kernel():
    from dataquality_spark.functions.text import dup_ngram_char_frac_py as f
    # 'a b c d e' 5-gram occurs twice (len 9, x2 = 18; total 21)
    assert f("a b c d e a b c d e x", 5) == pytest.approx(18 / 21)
    assert f("unique words only here now", 5) == 0.0
    assert f("", 5) == 0.0 and f("a b", 5) == 0.0


def test_canonical_url_cases(spark):
    from dataquality_spark.functions.text import canonical_url
    cases = {
        "HTTPS://WWW.Ex.COM:443/P/?utm_source=x&id=3&utm_medium=y#f":
            "https://www.ex.com/P/?id=3",
        "http://host:80/a/b///": "http://host/a/b",
        "https://h.example/p?gclid=abc": "https://h.example/p",
        "https://h.example/p?a=1&fbclid=z&b=2": "https://h.example/p?a=1&b=2",
        "https://h.example:8443/p": "https://h.example:8443/p",  # odd port kept
        "not a url": "not a url",                                # passthrough
    }
    df = spark.createDataFrame([(k,) for k in cases], "u string")
    got = {r["u"]: r["c"] for r in
           df.select("u", canonical_url(F.col("u")).alias("c")).collect()}
    assert got == cases


def test_canonical_url_literal_ampersand_path_preserved(spark):
    """Regression: the old blanket '&'→'?' promotion corrupted query-less
    URLs whose path contains a literal '&'."""
    from pyspark.sql import functions as F
    from dataquality_spark.functions.text import canonical_url
    cases = {
        "https://ex.com/p&weird": "https://ex.com/p&weird",
        "https://ex.com/a?utm_x=1": "https://ex.com/a",
        "https://ex.com/a?utm_x=1&b=2": "https://ex.com/a?b=2",
        "https://ex.com/a?b=2&utm_x=1": "https://ex.com/a?b=2",
        "https://ex.com/a?utm_a=1&utm_b=2&x=3": "https://ex.com/a?x=3",
    }
    df = spark.createDataFrame([(u,) for u in cases], "u string")
    got = {r["u"]: r["c"] for r in
           df.select("u", canonical_url(F.col("u")).alias("c")).collect()}
    assert got == cases


def test_stopword_dotted_i_full_mapping(spark):
    """U+0130 ('İ') is the one codepoint where full lowercasing (JVM/CPython:
    'i'+U+0307) and simple folding (DuckDB: 'i') disagree; without a shim a
    lone 'İ' matched the Italian stopword 'i' in the oracle but not in Spark
    (found by the differential fuzzer). The shim lives on the ORACLE side
    (queries._sql_full_lower) — an engine-side pre-fold blew the rules
    projection's generated code past the JIT threshold (5.9s → 34s). Under
    full mapping 'İ' lowers to 'i̇' and is NOT the stopword 'i', on either
    engine."""
    from dataquality_spark.functions.text import stopword_count_rx
    from dataquality_spark.queries import _sql_full_lower

    df = spark.createDataFrame(
        [("İ e non İstanbul", "it"),   # 'e' + 'non' count; 'İ' → 'i̇' ≠ 'i'
         ("İ word", "en")],            # 'i' is not in the en stoplist anyway
        "text string, lang string")
    got = {r.text: r.sc for r in df.select(
        "text", stopword_count_rx(F.col("text"), F.col("lang")).alias("sc")
    ).collect()}
    assert got["İ e non İstanbul"] == 2
    assert got["İ word"] == 0
    # DuckDB oracle mirror gives the same counts
    import duckdb
    from dataquality_spark.spec import STOPWORDS
    stoplist = "[" + ", ".join(f"'{w}'" for w in STOPWORDS["it"]) + "]"
    n = duckdb.connect().execute(
        "SELECT len(list_filter(list_filter("
        "regexp_split_to_array('İ e non İstanbul', '\\s+'), x -> x <> ''), "
        f"x -> list_contains({stoplist}, {_sql_full_lower('x')})))"
    ).fetchone()[0]
    assert n == 2


def test_url_shape_features_hand_cases(spark):
    from dataquality_spark.functions.text import url_shape_features
    rows = [
        (1, "https://a.b.example.com/x/y/z?p=1&q=2"),
        (2, "https://ex.com/item/123456789"),       # digit-heavy path
        (3, "https://ex.com/?sid=abc"),             # session param
        (4, "https://ex.com/a/b/c/d/e/f/g/h/i"),    # depth 9 > 8
        (5, "https://ex.com"),                      # bare root
        (6, None),                                  # NULL pinned
    ]
    df = spark.createDataFrame(rows, "id long, u string")
    feats = url_shape_features(F.col("u"))
    got = {r["id"]: r for r in
           df.select("id", *[c.alias(k) for k, c in feats.items()]).collect()}
    r = got[1]
    assert (r.host, r.host_depth, r.path_depth, r.n_params) == \
        ("a.b.example.com", 4, 3, 2)
    assert r.r_path_depth and r.r_params and r.r_session
    r = got[2]
    # path '/item/123456789': len 15, digits 9 -> 18 > 15 FAIL
    assert (r.path_len, r.path_digits) == (15, 9)
    assert r.r_path_digits is False
    r = got[3]
    assert (r.path_depth, r.n_params) == (0, 1)
    assert r.r_session is False
    r = got[4]
    assert r.path_depth == 9 and r.r_path_depth is False
    r = got[5]
    assert (r.path_depth, r.path_len, r.n_params) == (0, 0, 0)
    assert all([r.r_path_depth, r.r_path_digits, r.r_params, r.r_session])
    r = got[6]
    # NULL url -> empty everything, all rules PASS (0 <= 0)
    assert (r.host, r.host_depth, r.path_depth, r.n_params) == ("", 0, 0, 0)
    assert all([r.r_path_depth, r.r_path_digits, r.r_params, r.r_session])


def test_url_shape_session_param_variants(spark):
    from dataquality_spark.functions.text import url_shape_features
    rows = [(1, "https://e.x/p?a=1&PHPSESSID=k"),   # case-insensitive, mid
            (2, "https://e.x/p?jsessionid=1"),
            (3, "https://e.x/p?lsid=1"),            # no (^|&) boundary hit
            (4, "https://e.x/p?sidecar=1")]         # 'sid=' must not match
    df = spark.createDataFrame(rows, "id long, u string")
    feats = url_shape_features(F.col("u"))
    got = {r["id"]: r["r_session"] for r in
           df.select("id", *[c.alias(k) for k, c in feats.items()]).collect()}
    assert got == {1: False, 2: False, 3: True, 4: True}


def test_url_shape_is_shuffle_free(spark):
    from dataquality_spark.functions.text import url_shape_features
    df = spark.createDataFrame([(1, "https://e.x/p")], "id long, u string")
    feats = url_shape_features(F.col("u"))
    out = df.select(*[c.alias(k) for k, c in feats.items()])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_lexicon_hits_boundaries_and_case(spark):
    from dataquality_spark.functions.text import lexicon_hits
    rows = [(1, "bad WORSE bad."), (2, "badger embedded notbad bad"),
            (3, None), (4, "bad-adjacent bad, (bad) BAD!")]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {r["id"]: r["n"] for r in df.select(
        "id", lexicon_hits(F.col("t"), ["bad", "worse"]).alias("n")
    ).collect()}
    # whole words only: 'badger'/'notbad' don't hit; punctuation is a
    # boundary; case-insensitive
    assert got == {1: 3, 2: 1, 3: 0, 4: 4}


def test_lexicon_hits_rejects_regex_unsafe_terms(spark):
    from dataquality_spark.functions.text import lexicon_hits
    import pytest as _pt
    for bad in ["a.b", "x|y", "", "naïve"]:
        with _pt.raises(ValueError):
            lexicon_hits(F.lit("t"), ["ok", bad])


def test_lexicon_hits_rejects_empty_lexicon(spark):
    # (?i)\b()\b would match at every word boundary — an empty lexicon must
    # fail loudly, not return spurious nonzero counts
    import pytest as _pytest
    from pyspark.sql import functions as F
    from dataquality_spark.functions.text import lexicon_hits
    with _pytest.raises(ValueError):
        lexicon_hits(F.col("t"), [])
