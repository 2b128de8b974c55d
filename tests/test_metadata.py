"""Parameter-metadata surface (reference `ui_tool/metadata.py:25-68`
analogue): registry shape, validation, and end-to-end re-parameterization
of the rule flags."""

import pytest
from pyspark.sql import functions as F

from dataquality_spark import spec
from dataquality_spark.metadata import (default_params, rule_metadata,
                                        validate_params)
from dataquality_spark.rules.heuristics import with_rule_flags


def test_registry_covers_all_heuristic_and_model_rules():
    ids = {rm["rule_id"] for rm in rule_metadata()}
    tunable = set(spec.ALL_RULES) - {"nonempty"}  # nonempty has no knobs
    assert tunable <= ids
    for rm in rule_metadata():
        for p in rm["parameters"]:
            assert {"name", "title", "type", "default"} <= set(p)
            assert p["type"] in {"decimal", "integer", "checkbox",
                                 "string-list", "single-select"}


def test_defaults_round_trip():
    assert validate_params(None) == default_params()
    assert validate_params({}) == default_params()


def test_validation_rejects_bad_input():
    with pytest.raises(ValueError, match="unknown parameter"):
        validate_params({"no_such_knob": 1})
    with pytest.raises(ValueError, match="min"):
        validate_params({"min_alpha_ratio": -0.5})
    with pytest.raises(ValueError, match="max"):
        validate_params({"max_symbol_ratio": 1.5})
    with pytest.raises(ValueError, match="integer"):
        validate_params({"min_words": 10.5})


def test_params_reparameterize_rule_flags(spark):
    df = spark.createDataFrame(
        [("u1", "en", "short text here"),
         ("u2", "en", " ".join(f"w{i} the of and to in is" for i in range(20)))],
        ["url", "lang", "text"])
    strict = with_rule_flags(df, params={"min_words": 100})
    loose = with_rule_flags(df, params={"min_words": 3})
    s = {r["url"]: r["r_min_words"] for r in strict.collect()}
    l = {r["url"]: r["r_min_words"] for r in loose.collect()}
    assert s == {"u1": False, "u2": True}
    assert l == {"u1": True, "u2": True}
    # defaults path unchanged
    d = {r["url"]: r["r_min_words"]
         for r in with_rule_flags(df).collect()}
    assert d == {"u1": False, "u2": True}
