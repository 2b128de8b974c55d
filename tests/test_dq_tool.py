"""The interactive/CLI entry surface (`dq_tool.py`) — the terminal
analogue of the reference's Streamlit UI flow (ui_tool/dq_ui.py:55-185):
rule selection, metadata-driven typed parameter collection with the
warn-and-default error path, two-level weight validation with uniform
fallback, one-pass metrics, grade, run-log append + XLSX export."""

import json

import pytest

import dq_tool


def test_select_rules_rejects_unknown():
    with pytest.raises(SystemExit, match="unknown rules"):
        dq_tool.select_rules("min_words,nope", interactive=False)
    assert dq_tool.select_rules(None, False) == dq_tool.known_rules()
    assert dq_tool.select_rules("dedup, min_words", False) == [
        "dedup", "min_words"]


def test_gather_params_typed_and_loud_on_scripted_typos():
    eff = dq_tool.gather_params(["min_words"], ["min_words=17"], False)
    assert eff["min_words"] == 17
    with pytest.raises(ValueError, match="unknown parameter"):
        dq_tool.gather_params(["min_words"], ["not_a_param=1"], False)
    with pytest.raises(SystemExit, match="name=value"):
        dq_tool.gather_params([], ["malformed"], False)


def test_gather_params_interactive_warns_and_defaults(monkeypatch, capsys):
    """Invalid interactive input must warn and keep the default — the
    reference UI's error path (dq_ui.py:110-117) — not crash."""
    answers = iter(["bogus"])  # min_words := bogus → default
    monkeypatch.setattr("builtins.input", lambda *_: next(answers, ""))
    eff = dq_tool.gather_params(["min_words"], [], True)
    from dataquality_spark import spec
    assert eff["min_words"] == spec.MIN_WORDS
    assert "using default" in capsys.readouterr().err


def _metrics():
    return [
        {"rule_id": "min_words", "pass_count": 8, "fail_count": 2,
         "score": 0.8},
        {"rule_id": "max_words", "pass_count": 6, "fail_count": 4,
         "score": 0.6},
        {"rule_id": "stopword_ratio", "pass_count": 10, "fail_count": 0,
         "score": 1.0},
    ]


def test_grade_metrics_routes_weights_per_dimension(capsys):
    # min/max_words are accuracy; their weights apply within accuracy only
    dims, grade = dq_tool.grade_metrics(
        _metrics(), "{'min_words': 0.25, 'max_words': 0.75}", "")
    by = {d["dimension"]: d["score"] for d in dims}
    assert by["accuracy"] == pytest.approx(0.25 * 0.8 + 0.75 * 0.6)
    assert by["consistency"] == pytest.approx(1.0)
    assert grade in ("Exceptional", "High", "Good", "Minimum",
                     "Needs Improvement")


def test_grade_metrics_invalid_weights_fall_back_uniform(capsys):
    # sum < 1.0 is the reference's invalid case → warn + uniform
    dims, _ = dq_tool.grade_metrics(
        _metrics(), "{'min_words': 0.1, 'max_words': 0.1}", "")
    by = {d["dimension"]: d["score"] for d in dims}
    assert by["accuracy"] == pytest.approx((0.8 + 0.6) / 2)
    assert "invalid" in capsys.readouterr().err


def test_main_end_to_end_with_runlog(spark, tmp_path, capsys):
    src = str(tmp_path / "docs.parquet")
    spark.range(0, 50).selectExpr(
        "cast(id as long) doc_id",
        "concat('the of and a to word text sample number ', id) as text",
        "'en' as lang", "cast(id as string) as url",
        "current_timestamp() as warc_ts").write.parquet(src)
    cat_dir = str(tmp_path / "cat")
    xlsx = str(tmp_path / "log.xlsx")
    rc = dq_tool.main([src, "--rules", "min_words,dedup",
                       "--set", "min_words=3", "--head", "0",
                       "--log-dir", cat_dir, "--export-xlsx", xlsx])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rules"]["min_words"] == 1.0
    assert out["rules"]["dedup"] == 1.0  # no dup texts
    assert out["grade"] == "Exceptional"
    # run log landed in the catalog and round-trips through the
    # reference-schema XLSX export
    from dataquality_spark.sources.xlsx import read_xlsx
    log = read_xlsx(spark, xlsx)
    # the exported log carries the reference's DQS_Output_Log column
    # contract verbatim (core_operations.py:110-125), in order
    assert log.columns == [
        "Dataset", "Dimension", "Test", "Selected_Columns", "Threshold",
        "Score", "Run_Time_and_Date", "New_or_Existing_Test",
        "One_Line_Summary", "Errors", "Why_Did_the_Test_Fail"]
    rows = {r["Test"]: r for r in log.collect()}
    assert set(rows) == {"min_words", "dedup"}
    assert rows["min_words"]["Score"] == "100.00%"  # reference :.2f format
    assert rows["min_words"]["Dimension"] == "accuracy"
    assert rows["dedup"]["Dimension"] == "uniqueness"
    assert rows["min_words"]["New_or_Existing_Test"] == "Standard"
    assert rows["min_words"]["Dataset"] == src
    # the reference's summary synthesis populates One_Line_Summary
    assert "50" in rows["min_words"]["One_Line_Summary"]


def test_main_dedup_only_skips_heuristic_flagging(spark, tmp_path, capsys):
    """--rules dedup on a dataset WITHOUT text-stat prerequisites (no lang
    column) must run the dedup flag instead of dying inside
    with_rule_flags (advisor-flagged; the reference UI computes selected
    tests only)."""
    src = str(tmp_path / "nolang.parquet")
    spark.range(0, 20).selectExpr(
        "concat('dup text block ', id % 10) as text",
        "cast(id as string) as url",
        "current_timestamp() as warc_ts").write.parquet(src)
    rc = dq_tool.main([src, "--rules", "dedup", "--head", "0"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rules"]["dedup"] == 0.5  # 10 winners of 20 docs


def test_main_heuristics_without_lang_fail_loud(spark, tmp_path):
    src = str(tmp_path / "nolang2.parquet")
    spark.range(0, 5).selectExpr("'a b c' as text").write.parquet(src)
    with pytest.raises(SystemExit, match="lang"):
        dq_tool.main([src, "--rules", "min_words", "--head", "0"])


def test_main_dedup_without_id_cols_fails_loud(spark, tmp_path):
    src = str(tmp_path / "nocols.parquet")
    spark.range(0, 10).selectExpr("'x y z' as text", "'en' as lang") \
        .write.parquet(src)
    with pytest.raises(SystemExit, match="id-cols"):
        dq_tool.main([src, "--rules", "dedup", "--head", "0"])


def test_interactive_rule_typo_warns_and_includes_all(monkeypatch, capsys):
    """An interactive typo in the rule list must warn and fall back (the
    parameter-prompt error path), not kill the session."""
    answers = iter(["min_words, dedop"])
    monkeypatch.setattr("builtins.input", lambda *_: next(answers, ""))
    assert dq_tool.select_rules(None, True) == dq_tool.known_rules()
    assert "including all rules" in capsys.readouterr().err


def test_docstring_weights_example_is_accepted(capsys):
    """The module docstring's own --rule-weights example must validate:
    per-dimension contract, accuracy = {min_words: 0.4, max_words: 0.6}."""
    dims, _ = dq_tool.grade_metrics(
        _metrics(), "{'min_words': 0.4, 'max_words': 0.6}", "")
    by = {d["dimension"]: d["score"] for d in dims}
    assert by["accuracy"] == pytest.approx(0.4 * 0.8 + 0.6 * 0.6)
    assert "invalid" not in capsys.readouterr().err


def test_export_xlsx_without_log_dir_fails_before_spark():
    """The flag error must surface straight from argparse handling — no
    Spark session, no dataset read (path doesn't even exist)."""
    with pytest.raises(SystemExit, match="log-dir"):
        dq_tool.main(["/nonexistent.parquet", "--export-xlsx", "/tmp/x.xlsx"])


def test_id_cols_whitespace_stripped(spark, tmp_path):
    src = str(tmp_path / "ws.parquet")
    spark.range(0, 10).selectExpr(
        "concat('a b c d e f ', id) as text", "'en' as lang",
        "cast(id as string) as url", "current_timestamp() as warc_ts") \
        .write.parquet(src)
    rc = dq_tool.main([src, "--rules", "dedup", "--head", "0",
                       "--id-cols", "warc_ts, url"])
    assert rc == 0
