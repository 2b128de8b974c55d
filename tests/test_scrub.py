"""Scrub fixtures (fx_scrub): byte-identity vs oracle, idempotence,
null/unicode safety (SURVEY.md §5.2 property tests)."""

import pandas as pd
import pytest

from dataquality_spark import oracle
from dataquality_spark.scrub import scrub_series, with_scrubbed_text

CASES = [
    "contact john.doe+spam@sub.example.co.uk today",
    "call +1-555-123-4567 or (555) 123-4567 now",
    "ssn 123-45-6789 leaked",
    "server 10.0.255.1 and 192.168.1.1 up",
    "iban DE89370400440532013000 on file",
    "that frakking gorram smegging thing",
    "no pii here at all just words",
    "",
    "mixed: a@b.co then 1.2.3.4 then 999-88-7777 end",
    "unicode — émail tëst@exämple.com ünïcödé",  # non-ascii local/domain
    "edge frakkingly should NOT mask (substring)",
]


def test_scrub_matches_oracle_bytes():
    got = scrub_series(pd.Series(CASES))
    want = [oracle.scrub_text(t) for t in CASES]
    for g, w in zip(got, want):
        assert g == w, (g, w)


def test_scrub_replaces_pii():
    out = list(scrub_series(pd.Series(CASES)))
    assert "<EMAIL>" in out[0]
    assert out[1].count("<PHONE>") == 2
    assert "<ID>" in out[2]
    assert out[3].count("<IP>") == 2
    assert "<IBAN>" in out[4]
    assert out[5].count("<TOX>") == 3
    assert out[6] == CASES[6]
    assert "frakkingly" in out[10]  # whole-word only


def test_scrub_idempotent():
    once = scrub_series(pd.Series(CASES))
    twice = scrub_series(once)
    assert list(once) == list(twice)


def test_scrub_null_passthrough():
    out = scrub_series(pd.Series([None, "x@y.zz", None]))
    assert out[0] is None and out[2] is None
    assert out[1] == "<EMAIL>"


def test_scrub_udf_matches_series(spark):
    pdf = pd.DataFrame({"url": [f"u{i}" for i in range(len(CASES))],
                        "text": CASES})
    got = (with_scrubbed_text(spark.createDataFrame(pdf))
           .toPandas().set_index("url").sort_index()["scrubbed_text"])
    want = scrub_series(pdf.set_index("url").sort_index()["text"])
    assert list(got) == list(want)


def test_scrub_idempotent_property(artifacts):
    """Property: idempotence over the synthetic corpus (incl. PII injections)."""
    import numpy as np
    from dataquality_spark.synth import gen_pages_pdf
    pdf = gen_pages_pdf(np.arange(300), 42, 300)
    once = scrub_series(pdf["text"])
    twice = scrub_series(once)
    assert list(once.fillna("-")) == list(twice.fillna("-"))


def test_witness_gating_equals_naive_chain():
    """The witness-gated applier must be byte-identical to the plain
    ordered chain — including the interaction edges the gating could get
    wrong: digits that exist ONLY inside an email (consumed before the
    digit witness is evaluated), witnesses with no actual match, toxic
    literals inside larger words (witness hits, \\b sub doesn't), and the
    synthetic corpus with its PII injections."""
    import re

    import numpy as np

    from dataquality_spark import spec
    from dataquality_spark.synth import gen_pages_pdf

    comp = [(re.compile(p), r) for p, r in spec.SCRUB_PATTERNS] + [
        (re.compile(rf"\b{re.escape(w)}\b"), spec.TOXIC_REPLACEMENT)
        for w in spec.TOXIC_WORDS]

    def naive(x):
        if x is None:
            return None
        for p, r in comp:
            x = p.sub(r, x)
        return x

    edge = [
        "digits only here: a1b2c3@mail99.com and nothing else",  # email eats
        "text with @ but no email shape",                        # witness, no match
        "frakkingly unfrakking gorramless",                      # \b blocks subs
        "plain text no witnesses at all",
        "ip 10.0.0.1 and id 123-45-6789 and +1-234-567-8901",
        "", None, "   ",
    ]
    pdf = gen_pages_pdf(np.arange(400), 7, 400)
    s = pd.concat([pd.Series(edge, dtype=object), pdf["text"]],
                  ignore_index=True)
    got = scrub_series(s)
    want = s.map(naive)
    assert list(got.fillna("∅")) == list(want.fillna("∅"))


def test_digit_lead_bytes_match_interpreter_tables():
    """The frozen _DIGIT_LEAD_BYTES set must equal the UTF-8 lead bytes
    of every non-ASCII codepoint this interpreter's \\d matches — a
    CPython Unicode-table upgrade that adds a digit block with a new
    lead byte must fail HERE, not silently skip scrubbing those rows."""
    import re

    from dataquality_spark.scrub import _DIGIT_LEAD_BYTES

    pat = re.compile(r"\d")
    leads = set()
    for cp in range(0x80, 0x110000):
        if 0xD800 <= cp <= 0xDFFF:
            continue
        if pat.search(chr(cp)):
            leads.add(chr(cp).encode("utf-8")[0])
    assert leads == set(_DIGIT_LEAD_BYTES), sorted(map(hex, leads))


def test_digit_witness_superset_and_unicode_digits_scrubbed():
    """_digit_witness must include every row the regex witness includes
    (superset soundness), including non-ASCII digit scripts; Latin
    accent rows without digits must be excluded (the fast path's point)."""
    import pandas as pd

    from dataquality_spark.scrub import _DIGIT_RE, _digit_witness

    rows = pd.Series([
        "no digits at all", "x1", "٠١٢ arabic-indic", "１２３ fullwidth",
        "é accent only", "mixé çédille ñ", "²³ superscripts",
        "devanagari १२३", "", " ", "\t\n",
    ])
    fast = _digit_witness(rows)
    slow = rows.str.contains(_DIGIT_RE, regex=True)
    assert (fast | ~slow).all(), "witness missed a \\d row"
    assert not fast["é accent only" == rows].iloc[0]
    assert not fast["mixé çédille ñ" == rows].iloc[0]
