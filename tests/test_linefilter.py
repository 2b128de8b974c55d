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
