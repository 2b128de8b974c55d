"""C4 line filter + Gopher line-shape stats (operators/linefilter.py).

Each C4 §2.2 rule branch is pinned on a hand-built page, the NULL-page
convention is asserted explicitly (the dsir/token_drift NULL-pin class),
and the Gopher fractions/thresholds are checked against hand counts.
"""

import pytest
from pyspark.sql import functions as F

from dataquality_spark.operators.linefilter import (
    c4_line_filter,
    gopher_line_stats,
)


def _one(spark, text):
    return spark.createDataFrame([(1, text)], "doc_id bigint, text string")


def _run_c4(spark, text, **kw):
    return c4_line_filter(_one(spark, text), **kw).collect()[0]


def test_c4_keeps_only_terminal_punct_lines(spark):
    page = "\n".join([
        "one two three four five.",    # kept
        "one two three four five",     # no terminal punct
        "one two three four five!",    # kept
        "one two three four five?",    # kept
        'one two three four five"',    # kept (end quote is terminal in C4)
        "one two three four five;",    # ';' is not terminal
    ])
    r = _run_c4(spark, page)
    assert r.total_lines == 6 and r.kept_lines == 4
    assert r.c4_text.split("\n") == [
        "one two three four five.",
        "one two three four five!",
        "one two three four five?",
        'one two three four five"',
    ]


def test_c4_min_words_and_javascript_case_insensitive(spark):
    page = "\n".join([
        "one two three four.",              # 4 words < 5
        "one two three four five.",         # kept
        "click to enable JavaScript now.",  # dropped, case-insensitive
        "one two three javascript five.",   # dropped, lowercase
    ])
    r = _run_c4(spark, page)
    assert r.kept_lines == 1
    assert r.c4_text == "one two three four five."


GOOD = "\n".join(["w1 w2 w3 w4 w5."] * 3)


def test_c4_page_gate_brace_lorem_and_min_lines(spark):
    base = _run_c4(spark, GOOD)
    assert base.kept_lines == 3 and base.page_kept is True
    # a brace ANYWHERE on the page drops it, even on a discarded line
    brace = _run_c4(spark, GOOD + "\nvar x = { 1 };")
    assert brace.kept_lines == 3 and brace.page_kept is False
    lorem = _run_c4(spark, GOOD + "\nLoReM IpSuM dolor sit amet.")
    assert lorem.kept_lines == 4 and lorem.page_kept is False
    two = _run_c4(spark, "\n".join(["w1 w2 w3 w4 w5."] * 2))
    assert two.kept_lines == 2 and two.page_kept is False


def test_c4_null_and_empty_page_pinned_convention(spark):
    for text in (None, ""):
        r = _run_c4(spark, text)
        assert (r.c4_text, r.total_lines, r.kept_lines, r.page_kept) == (
            "", 1, 0, False)


def test_c4_thresholds_are_parameters(spark):
    page = "\n".join(["w1 w2 w3.", "w4 w5 w6!"])
    r = c4_line_filter(_one(spark, page), min_line_words=3,
                       min_kept_lines=2).collect()[0]
    assert r.kept_lines == 2 and r.page_kept is True


def test_gopher_fractions_and_flags(spark):
    # 4 lines: 2 bullet starts (one '- ', one '• '), 1 ellipsis end
    page = "\n".join([
        "- bullet line one.",
        "• bullet line two.",
        "plain line goes on…",
        "plain line four.",
    ])
    r = gopher_line_stats(_one(spark, page)).collect()[0]
    assert r.total_lines == 4
    assert r.bullet_frac == pytest.approx(0.5)
    assert r.ellipsis_frac == pytest.approx(0.25)
    assert r.r_bullet is True and r.r_ellipsis is True


def test_gopher_threshold_failures(spark):
    all_bullets = "\n".join(["- b line."] * 10)
    r = gopher_line_stats(_one(spark, all_bullets)).collect()[0]
    assert r.bullet_frac == 1.0 and r.r_bullet is False
    # 4/10 ASCII '...' ellipsis ends > 30%
    dots = "\n".join(["line ends..."] * 4 + ["plain line."] * 6)
    r = gopher_line_stats(_one(spark, dots)).collect()[0]
    assert r.ellipsis_frac == pytest.approx(0.4) and r.r_ellipsis is False


def test_gopher_null_page_passes_shape_rules(spark):
    r = gopher_line_stats(_one(spark, None)).collect()[0]
    assert (r.total_lines, r.bullet_frac, r.ellipsis_frac) == (1, 0.0, 0.0)
    assert r.r_bullet is True and r.r_ellipsis is True


def test_c4_is_shuffle_free(spark):
    df = c4_line_filter(_one(spark, GOOD))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --- Gopher A1.2 repetition-removal signals -------------------------------

from dataquality_spark.operators.linefilter import gopher_repetition_stats


def _rep(spark, text):
    return gopher_repetition_stats(_one(spark, text)).collect()[0]


def test_repetition_hand_counts(spark):
    # 2 paragraphs; para 2 repeats para 1's first line twice.
    page = "aaa\nbb\n\naaa\naaa\ncc"
    r = _rep(spark, page)
    # lines (blankless): aaa bb aaa aaa cc -> 5 total, 2 dups (aaa x2 extra)
    assert (r.total_lines, r.dup_lines) == (5, 2)
    # chars: 3+2+3+3+2 = 13 total; distinct {aaa,bb,cc} = 7 -> 6 dup chars
    assert (r.line_chars, r.dup_line_chars) == (13, 6)
    # paragraphs: "aaa\nbb" and "aaa\naaa\ncc" -> 2 distinct, 0 dups
    assert (r.total_paras, r.dup_paras) == (2, 0)
    assert (r.para_chars, r.dup_para_chars) == (6 + 10, 0)
    # flags: dup_line 2/5 = 40% > 30% FAIL; dup_line_chars 6/13 > 20% FAIL
    assert r.r_dup_line is False and r.r_dup_line_chars is False
    assert r.r_dup_para is True and r.r_dup_para_chars is True


def test_repetition_duplicate_paragraphs(spark):
    page = "x y\n\nx y\n\nz."
    r = _rep(spark, page)
    assert (r.total_paras, r.dup_paras) == (3, 1)
    assert (r.para_chars, r.dup_para_chars) == (8, 3)
    # dup_paras 1/3 > 30% (cross-mult: 1*10=10 > 3*3=9) -> FAIL
    assert r.r_dup_para is False
    # dup_para_chars 3/8 > 20% -> FAIL
    assert r.r_dup_para_chars is False
    # lines: x y / x y / z. -> 1 dup of 3 -> 10 > 9 FAIL
    assert (r.total_lines, r.dup_lines) == (3, 1)
    assert r.r_dup_line is False


def test_repetition_exact_threshold_boundary(spark):
    # 10 lines, 3 duplicates -> exactly 30%: 3*10 == 10*3 -> PASS (<=)
    # chars: total 15, dup 3 -> exactly 20%: 3*5 == 15 -> PASS (<=)
    lines = ["abc", "de", "fg", "hi", "x", "y", "z", "x", "y", "z"]
    r = _rep(spark, "\n".join(lines))
    assert (r.total_lines, r.dup_lines) == (10, 3)
    assert r.r_dup_line is True
    assert (r.line_chars, r.dup_line_chars) == (15, 3)
    assert r.dup_line_chars * 5 == r.line_chars
    assert r.r_dup_line_chars is True


def test_repetition_null_and_empty_page(spark):
    for page in (None, ""):
        r = _rep(spark, page)
        assert (r.total_lines, r.total_paras) == (0, 0)
        assert (r.dup_lines, r.dup_paras) == (0, 0)
        assert (r.line_chars, r.para_chars) == (0, 0)
        assert all([r.r_dup_line, r.r_dup_para,
                    r.r_dup_line_chars, r.r_dup_para_chars])


def test_repetition_is_shuffle_free(spark):
    df = gopher_repetition_stats(_one(spark, "a\nb\n\na"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


# --- within-document keep-first line dedup ---------------------------------

from dataquality_spark.operators.linefilter import dedup_lines_within_doc


def _trim(spark, text):
    return dedup_lines_within_doc(_one(spark, text)).collect()[0]


def test_trim_dup_lines_keep_first_order(spark):
    r = _trim(spark, "b\na\nb\nc\na\nb")
    assert r.trim_text == "b\na\nc"
    assert (r.total_lines, r.removed_lines) == (6, 3)


def test_trim_dup_lines_blank_policy(spark):
    # first blank survives, later blanks collapse (documented policy)
    r = _trim(spark, "a\n\nb\n\nc")
    assert r.trim_text == "a\n\nb\nc"
    assert (r.total_lines, r.removed_lines) == (5, 1)


def test_trim_dup_lines_null_empty_and_nodup(spark):
    r = _trim(spark, None)
    assert (r.trim_text, r.total_lines, r.removed_lines) == ("", 1, 0)
    r = _trim(spark, "x\ny\nz")
    assert r.trim_text == "x\ny\nz" and r.removed_lines == 0


def test_array_distinct_first_occurrence_order_pin(spark):
    """dedup_lines_within_doc DELIBERATELY relies on array_distinct
    emitting first occurrences in original order; pin that contract
    (the byte-exact oracle also catches any regression)."""
    row = spark.range(1).select(
        F.array_distinct(F.split(F.lit("q\np\nq\nr\np"), "\n")).alias("a")
    ).collect()[0]
    assert row.a == ["q", "p", "r"]


def test_trim_dup_lines_is_shuffle_free(spark):
    df = dedup_lines_within_doc(_one(spark, "a\nb\na"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


# --- Dolma-style attribute spans -------------------------------------------

from dataquality_spark.operators.linefilter import attribute_spans


def test_attribute_spans_offsets_and_scores(spark):
    text = "bad day\n\nall clear here\nbad bad end"
    df = _one(spark, text)
    rows = attribute_spans(df, sep="\n", lexicon=["bad"]).collect()
    # paragraphs at '\n' grain: ['bad day', '', 'all clear here', 'bad bad end']
    assert [r.para_idx for r in rows] == [0, 1, 2, 3]
    for r in rows:
        # the offsets must slice the ORIGINAL text back to the paragraph
        assert text[r.start:r.end] == text.split("\n")[r.para_idx]
    assert [(r.n_words, r.hits) for r in rows] == [
        (2, 1), (0, 0), (3, 0), (3, 2)]


def test_attribute_spans_multichar_sep_and_null(spark):
    text = "x y a z w"   # ' a ' separator -> ['x y', 'z w']
    rows = attribute_spans(_one(spark, text), sep=" a ").collect()
    assert [(r.start, r.end) for r in rows] == [(0, 3), (6, 9)]
    assert text[6:9] == "z w"
    rows = attribute_spans(_one(spark, None), sep=" a ").collect()
    assert [(r.para_idx, r.start, r.end, r.n_words, r.hits)
            for r in rows] == [(0, 0, 0, 0, 0)]


def test_attribute_spans_is_shuffle_free(spark):
    df = attribute_spans(_one(spark, "a\nb"), lexicon=["bad"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
