"""Weighted rule/dimension scoring and letter grading — semantics parity with
the reference (driver-side; the inputs are tiny per-rule metrics, SURVEY.md
G-11..G-14).

Quirks preserved deliberately for parity (`utils/core_operations.py`, cites):
  * weights summing to MORE than 1.0 are accepted — only `< 1.0` is rejected
    (`core_operations.py:328-331`)
  * weight-count mismatch with the score list → fall back to defaults
    (`core_operations.py:318-322`)
  * unicode “smart quotes” sanitized before literal_eval
    (`core_operations.py:309`)
  * a failed rule (falsy / non-numeric score) contributes 0, not NaN
    (`core_operations.py:352-355`)
  * missing weight for a rule → default 1/n for that rule
    (`core_operations.py:354`)
  * grade ladder thresholds are strict `>`: .9/.8/.7/.5
    (`core_operations.py:380-386`)
"""

from __future__ import annotations

from ast import literal_eval

GRADES = [
    (0.9, "Exceptional"),
    (0.8, "High"),
    (0.7, "Good"),
    (0.5, "Minimum"),
]
GRADE_FLOOR = "Needs Improvement"


def parse_weights(weights):
    """Smart-quote-sanitized ``literal_eval`` of a stringly-typed weights
    dict (`core_operations.py:309`). Dicts pass through; returns None when
    the string is not a dict literal. The single shared parser for the
    library path AND the CLI (`dq_tool.py`) so quote handling cannot
    drift between them."""
    if isinstance(weights, dict):
        return weights
    try:
        s = (str(weights).replace("‘", "'").replace("’", "'")
             .replace("“", '"').replace("”", '"'))
        d = literal_eval(s) if s.strip() else {}
        return d if isinstance(d, dict) else None
    except Exception:
        return None


def are_weights_valid(weights, scores: list[dict], kind: str = "test"
                      ) -> tuple[dict, bool]:
    """Validate a weights dict (or its string form) against a score list."""
    if weights == "" or weights == "{}":
        return {}, True
    if isinstance(weights, str):
        weights = parse_weights(weights)
        if weights is None:
            return {}, False
    try:
        if len(weights) != len(scores):
            return {}, False
        total = 0
        for _, w in weights.items():
            total += w
        if total < 1.0:  # quirk: > 1.0 accepted
            return {}, False
    except Exception:
        return {}, False
    return weights, True


def calculate_dimension_score(dimension: str, scores: list[dict],
                              weights: dict | str = {}) -> dict:
    """scores: [{"test": rule_id, "value": score-or-falsy}] → weighted mean.

    NOTE the mutable default ``weights={}`` and the ``weights != {}``
    EQUALITY sentinel are deliberate, load-bearing reference parity
    (`utils/core_operations.py:339-386`): an explicitly-passed empty dict
    must behave exactly like the default (skip validation, fall back to
    1/len uniform weights), and a string (the reference accepts
    stringly-typed weights) must go through validation. Do not "fix" to
    ``weights=None`` / ``is not None`` — that changes which inputs validate.
    """
    if weights != {}:
        weights, _ = are_weights_valid(weights, scores)
    value = 0.0
    for s in scores:
        try:
            numeric = 0 if not s["value"] else s["value"]
            w = weights[s["test"]] if s["test"] in weights else 1.0 / len(scores)
            value += numeric * w
        except Exception:
            value += 0
    return {"dimension": dimension, "score": value}


def calculate_grade(scores: list[dict], weights: dict | str = {}) -> str:
    """[{"dimension": name, "score": value-or-None}] → letter grade."""
    if weights != {}:
        weights, _ = are_weights_valid(weights, scores, kind="dimension")
    total = 0.0
    for s in scores:
        numeric = 0 if s["score"] is None else s["score"]
        w = (weights[s["dimension"]] if s["dimension"] in weights
             else 1.0 / len(scores))
        total += numeric * w
    for bound, grade in GRADES:
        if total > bound:
            return grade
    return GRADE_FLOOR


def grade_from_metrics(rule_metrics_rows: list[dict],
                       weights: dict | str = {}) -> dict:
    """Convenience: rule_metrics rows (rule_id, score) → dimension score +
    grade, mirroring the reference notebook flow (§3.1 step 4)."""
    scores = [{"test": r["rule_id"], "value": r["score"]} for r in rule_metrics_rows]
    dim = calculate_dimension_score("quality", scores, weights)
    grade = calculate_grade([dim])
    return {"dimension_score": dim["score"], "grade": grade}
