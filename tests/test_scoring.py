"""Scoring/grading parity incl. the reference's quirks (fx_weights,
FIXTURES.md §3; `utils/core_operations.py:301-386`)."""

import pytest

from dataquality_spark.scoring import (
    are_weights_valid, calculate_dimension_score, calculate_grade,
    grade_from_metrics,
)

SCORES = [{"test": "a", "value": 0.8}, {"test": "b", "value": 0.6}]


def test_default_weights_mean():
    d = calculate_dimension_score("dim", SCORES)
    assert d["score"] == pytest.approx(0.7)


def test_failed_rule_scores_zero():
    scores = [{"test": "a", "value": 0.8},
              {"test": "b", "value": "No valid results generated"},
              {"test": "c", "value": None}]
    d = calculate_dimension_score("dim", scores)
    # quirk: non-numeric/falsy → 0 (`core_operations.py:352-355`);
    # here the string is truthy→ except path → +0 as well
    assert d["score"] == pytest.approx(0.8 / 3)


def test_weights_sum_over_one_accepted():
    # quirk: only sum < 1.0 rejected (`core_operations.py:328`)
    w, ok = are_weights_valid({"a": 0.9, "b": 0.9}, SCORES)
    assert ok and w == {"a": 0.9, "b": 0.9}


def test_weights_sum_under_one_rejected():
    w, ok = are_weights_valid({"a": 0.4, "b": 0.4}, SCORES)
    assert not ok and w == {}


def test_weights_count_mismatch_rejected():
    w, ok = are_weights_valid({"a": 1.0}, SCORES)
    assert not ok and w == {}


def test_weights_smart_quote_string():
    w, ok = are_weights_valid("{‘a’: 0.5, ‘b’: 0.5}", SCORES)
    assert ok and w == {"a": 0.5, "b": 0.5}


def test_weights_garbage_string():
    w, ok = are_weights_valid("not a dict at all", SCORES)
    assert not ok and w == {}


@pytest.mark.parametrize("score,grade", [
    (0.95, "Exceptional"),
    (0.9, "High"),        # strict >: 0.9 is NOT Exceptional
    (0.85, "High"),
    (0.8, "Good"),
    (0.75, "Good"),
    (0.7, "Minimum"),
    (0.6, "Minimum"),
    (0.5, "Needs Improvement"),
    (0.1, "Needs Improvement"),
])
def test_grade_ladder(score, grade):
    assert calculate_grade([{"dimension": "d", "score": score}]) == grade


def test_none_dimension_score_counts_zero():
    g = calculate_grade([{"dimension": "a", "score": None},
                         {"dimension": "b", "score": 1.0}])
    assert g == "Needs Improvement"  # mean 0.5 → not > 0.5


def test_grade_from_metrics():
    rows = [{"rule_id": "x", "score": 0.95}, {"rule_id": "y", "score": 0.9}]
    out = grade_from_metrics(rows)
    assert out["dimension_score"] == pytest.approx(0.925)
    assert out["grade"] == "Exceptional"
