"""Round-5 evaluation-harness operators: pairwise rule kappa
(`rule_agreement`), encoding-anomaly detection (`mojibake_stats`) and the
classifier-vs-gate PR threshold sweep (`filter_pr_curve`). The exact-oracle
sweep is the cross-engine gate; these pin the semantics against
independent pure-Python recomputations and crafted fixtures."""

import math

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sf0001():
    return SF


def _write_docs(spark, tmp_path, rows):
    d = tmp_path / "docs"
    df = spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string, "
              "n_chars: long")
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{d}/documents.parquet")
    return str(d)


# --- mojibake_stats --------------------------------------------------------

def test_mojibake_counts_and_suspect_flag(spark, tmp_path):
    from dataquality_spark.queries import q_mojibake_stats
    rows = [
        (0, "clean ascii text", "en", "s", 16),
        # two distinct cp1252 signatures + one repeated: 'Ã©' twice, 'â€™'
        (1, "cafÃ© and donâ€™t and Ã© again", "en", "s", 1),
        (2, "lost �� bytes", "en", "s", 1),         # 2 U+FFFD
        (3, "ctrl\x07 and \x1f and del\x7f", "en", "s", 1),   # 3 C0/DEL
        (4, "tab\tand\nnewline\rare fine", "en", "s", 1),     # ws controls
        (5, None, "en", "s", None),                           # NULL text
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {r.doc_id: r for r in q_mojibake_stats(spark, sf).collect()}
    assert (got[0].n_moji, got[0].n_repl, got[0].n_ctrl,
            got[0].suspect) == (0, 0, 0, False)
    assert (got[1].n_moji, got[1].suspect) == (3, True)
    assert (got[2].n_repl, got[2].suspect) == (2, True)
    assert (got[3].n_ctrl, got[3].suspect) == (3, True)
    # \t \n \r are whitespace, not encoding damage
    assert (got[4].n_ctrl, got[4].suspect) == (0, False)
    assert (got[5].n_moji, got[5].n_repl, got[5].n_ctrl,
            got[5].suspect) == (0, 0, 0, False)


def test_mojibake_alternation_is_prefix_free():
    # the cross-engine count-parity argument requires that no signature is
    # a prefix of another (leftmost-first alternation then counts the
    # same number of non-overlapping matches on Java regex and RE2)
    from dataquality_spark.queries import _MOJI_SIGS
    for i, a in enumerate(_MOJI_SIGS):
        for j, b in enumerate(_MOJI_SIGS):
            if i != j:
                assert not b.startswith(a), (a, b)


# --- rule_agreement (pairwise Cohen's kappa) -------------------------------

def _py_kappa(flags_a, flags_b):
    n = len(flags_a)
    n11 = sum(1 for x, y in zip(flags_a, flags_b) if x and y)
    a1, b1 = sum(flags_a), sum(flags_b)
    n00 = n - a1 - b1 + n11
    agree = n11 + n00
    pe_num = a1 * b1 + (n - a1) * (n - b1)
    den = n * n - pe_num
    if den == 0:
        return agree, round(agree / n, 6), None
    return agree, round(agree / n, 6), round((n * agree - pe_num) / den, 6)


def test_rule_agreement_matches_pure_python_recount(spark, sf0001):
    from dataquality_spark.queries import (_KAPPA_PAIRS, q_heuristic_gate,
                                           q_rule_agreement)
    gate = q_heuristic_gate(spark, sf0001).collect()
    got = {(r.rule_a, r.rule_b): r
           for r in q_rule_agreement(spark, sf0001).collect()}
    assert set(got) == set(_KAPPA_PAIRS)
    for a, b in _KAPPA_PAIRS:
        fa = [bool(getattr(r, a)) if getattr(r, a) is not None else False
              for r in gate]
        fb = [bool(getattr(r, b)) if getattr(r, b) is not None else False
              for r in gate]
        agree, po, kappa = _py_kappa(fa, fb)
        r = got[(a, b)]
        assert r.n_agree == agree
        assert r.po == pytest.approx(po, abs=1e-9)
        if kappa is None:
            assert r.kappa is None
        else:
            assert r.kappa == pytest.approx(kappa, abs=1e-9)


def test_rule_agreement_constant_rules_hit_the_degenerate_cases(
        spark, tmp_path):
    # every doc identical -> every rule constant. Pairs constant in the
    # SAME direction have pe = 1 -> kappa NULL (0/0 guarded by nullif on
    # both engines) and po = 1; pairs constant in OPPOSITE directions have
    # agree = 0 -> po = 0 and a DEFINED kappa of exactly 0
    # (n*0 - pe_num = -pe_num... with a1∈{0,n}: pe_num = 0, so kappa = 0).
    from dataquality_spark.queries import (_KAPPA_RULES, q_heuristic_gate,
                                           q_rule_agreement)
    rows = [(i, "the data table row value", "en", "s", 24) for i in range(5)]
    sf = _write_docs(spark, tmp_path, rows)
    gate = q_heuristic_gate(spark, sf).collect()
    const = {r: bool(getattr(gate[0], r) or False) for r in _KAPPA_RULES}
    assert all(all(bool(getattr(g, r) or False) == const[r] for g in gate)
               for r in _KAPPA_RULES)
    out = q_rule_agreement(spark, sf).collect()
    assert len(out) == 10
    for r in out:
        if const[r.rule_a] == const[r.rule_b]:
            assert r.po == 1.0 and r.kappa is None, r
        else:
            assert r.po == 0.0 and r.kappa == 0.0, r


# --- chunk_tokens (sliding-window chunking) --------------------------------

def _chunks(spark, toks_rows, **kw):
    from dataquality_spark.operators.packing import chunk_tokens
    df = spark.createDataFrame(toks_rows, "doc_id long, ws array<string>")
    out = chunk_tokens(df, "ws", **kw).collect()
    return sorted((r.doc_id, r.chunk_idx, r.n_tokens, r.chunk_text)
                  for r in out)


def test_chunk_windows_overlap_and_tail(spark):
    toks = [str(i) for i in range(10)]
    got = _chunks(spark, [(1, toks)], chunk_len=4, stride=3)
    # starts 0,3,6,9 — every token covered, adjacent chunks overlap by 1,
    # final window short (1 token)
    assert got == [
        (1, 0, 4, "0 1 2 3"),
        (1, 1, 4, "3 4 5 6"),
        (1, 2, 4, "6 7 8 9"),
        (1, 3, 1, "9"),
    ]


def test_chunk_windows_edges(spark):
    rows = [
        (1, []),                 # empty -> no chunks
        (2, None),               # NULL  -> no chunks
        (3, ["only"]),           # single token -> one 1-token chunk
        (4, ["a", "b", "c"]),    # n == chunk_len exactly -> one chunk
    ]
    got = _chunks(spark, rows, chunk_len=3, stride=3)
    assert got == [(3, 0, 1, "only"), (4, 0, 3, "a b c")]


def test_chunk_windows_every_token_covered(spark):
    # coverage property: union of [k*stride, k*stride+len) spans [0, n)
    from dataquality_spark.operators.packing import chunk_tokens
    import pyspark.sql.functions as F
    n = 53
    df = spark.createDataFrame(
        [(1, [f"t{i}" for i in range(n)])], "doc_id long, ws array<string>")
    out = chunk_tokens(df, "ws", chunk_len=8, stride=5).collect()
    covered = set()
    for r in out:
        covered.update(r.chunk_text.split(" "))
        assert r.n_tokens == len(r.chunk_text.split(" "))
    assert covered == {f"t{i}" for i in range(n)}


def test_chunk_windows_rejects_bad_params(spark):
    from dataquality_spark.operators.packing import chunk_tokens
    df = spark.createDataFrame([(1, ["a"])], "doc_id long, ws array<string>")
    with pytest.raises(ValueError):
        chunk_tokens(df, "ws", chunk_len=0, stride=1)
    with pytest.raises(ValueError):
        chunk_tokens(df, "ws", chunk_len=4, stride=0)


# --- filter_pr_curve -------------------------------------------------------

def test_pr_curve_matches_pure_python_recount(spark, sf0001):
    from dataquality_spark.queries import (_PR_BIN_OFF, _PR_BIN_W, _PR_BINS,
                                           q_filter_pr_curve,
                                           q_heuristic_gate,
                                           q_quality_classifier)
    logits = {r.doc_id: r.logit_num
              for r in q_quality_classifier(spark, sf0001).collect()}
    labels = {r.doc_id: bool(r.keep) if r.keep is not None else False
              for r in q_heuristic_gate(spark, sf0001).collect()}
    assert set(logits) == set(labels)
    bins = {}
    for did, lg in logits.items():
        b = max(0, min(_PR_BINS - 1, (lg + _PR_BIN_OFF) // _PR_BIN_W))
        n, p = bins.get(b, (0, 0))
        bins[b] = (n + 1, p + (1 if labels[did] else 0))
    total_pos = sum(p for _, p in bins.values())
    got = q_filter_pr_curve(spark, sf0001).collect()
    assert [r.bin for r in got] == sorted(bins)
    tp = pp = 0
    exp = {}
    for b in sorted(bins, reverse=True):
        n, p = bins[b]
        tp += p
        pp += n
        exp[b] = (n, p, tp, pp - tp, total_pos - tp)
    for r in got:
        n, p, etp, efp, efn = exp[r.bin]
        assert (r.n_docs, r.n_pos, r.tp, r.fp, r.fn) == (n, p, etp, efp, efn)
        assert r.threshold_logit == r.bin * _PR_BIN_W - _PR_BIN_OFF
        assert r.precision == pytest.approx(round(etp / (etp + efp), 6))
        if total_pos:
            assert r.recall == pytest.approx(round(etp / total_pos, 6))
            assert r.f1 == pytest.approx(
                round(2 * etp / (etp + efp + total_pos), 6))


def test_pr_curve_is_monotone_and_bounded(spark, sf0001):
    from dataquality_spark.queries import _PR_BINS, q_filter_pr_curve
    got = q_filter_pr_curve(spark, sf0001).collect()
    assert 0 < len(got) <= _PR_BINS
    # descending threshold = ascending bin here; recall must be monotone
    # non-increasing in bin (higher threshold keeps fewer docs)
    recalls = [r.recall for r in got]
    assert all(x >= y for x, y in zip(recalls, recalls[1:]))
    for r in got:
        for v in (r.precision, r.recall, r.f1):
            if v is not None:
                assert 0.0 <= v <= 1.0 and math.isfinite(v)


def test_chunk_windows_rejects_token_dropping_config(spark):
    # chunk_len < stride would silently drop the tokens between windows —
    # the coverage guarantee in the docstring must be enforced
    from dataquality_spark.operators.packing import chunk_tokens
    df = spark.createDataFrame([(1, ["a", "b"])], "doc_id long, ws array<string>")
    with pytest.raises(ValueError):
        chunk_tokens(df, "ws", chunk_len=3, stride=5)
