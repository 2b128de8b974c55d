"""HTML→text extraction: scalar-spec fixtures, UDF parity, and the
north-rule byte-identity gate on the synthetic corpus."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataquality_spark.functions.html_extract import (
    escape_html,
    extract_text_py,
    extract_text_udf,
    with_extracted_text,
)

CASES = [
    # simple wrapper: verbatim body (the synth corpus shape)
    (b"<html><body>hello world</body></html>", "hello world"),
    # script/style subtrees contribute nothing, even nested/unbalanced
    (b"<div>a<script>var x = '<b>no</b>';</script>b</div>", "\nab\n"),
    (b"<style>p { color: red }</style>text", "text"),
    (b"<noscript><p>enable js</p></noscript>ok", "ok"),
    # block boundaries emit \n; inline tags emit nothing
    (b"<p>one</p><p>two</p>", "\none\n\ntwo\n"),
    (b"a<br/>b", "a\nb"),
    (b"<span>in</span><a href='x'>line</a>", "inline"),
    # entities decode
    (b"fish &amp; chips &lt;3 &#65;", "fish & chips <3 A"),
    # mojibake bytes never fail
    (b"ok \xff\xfe end", "ok �� end"),
    # comments and attributes are not text
    (b"<!-- hidden --><div class='x'>shown</div>", "\nshown\n"),
    # head/title subtrees are not content
    (b"<head><title>T</title><meta x='y'></head><body>bod</body>", "bod"),
    (None, None),
    (b"", ""),
]


def test_extract_text_scalar_spec():
    for html, want in CASES:
        assert extract_text_py(html) == want, html


def test_extract_text_udf_parity(spark):
    df = spark.createDataFrame([(i, h) for i, (h, _) in enumerate(CASES)],
                               "i: long, html: binary")
    got = (df.select("i", extract_text_udf()(F.col("html")).alias("t"))
           .toPandas().sort_values("i")["t"].tolist())
    want = [w for _, w in CASES]
    got = [None if g is None or (isinstance(g, float) and pd.isna(g)) else g
           for g in got]
    assert got == want


def test_synth_corpus_byte_identity(spark):
    """The north-rule invariant, literal: extracting the synthetic corpus's
    html reproduces its text column byte-for-byte (non-empty html rows)."""
    from dataquality_spark.synth import generate_pages
    pages = generate_pages(spark, 2000, seed=42)
    ex = with_extracted_text(pages.where(F.length("html") > 0),
                             out_col="extracted")
    # synth encodes html as wrap(text or "") — null text becomes an empty
    # body, so the invariant is extracted == coalesce(text, '')
    mismatches = ex.where(
        ~F.col("extracted").eqNullSafe(
            F.coalesce(F.col("text"), F.lit("")))).count()
    assert mismatches == 0


def test_escape_roundtrip(spark):
    """escape_html (native exprs) → wrap → extract is the identity even for
    texts containing &, <, > — exercises entity decoding end-to-end."""
    texts = ["a & b", "x < y > z", "pre &amp; already", "plain", "<tag>"]
    df = spark.createDataFrame([(t,) for t in texts], "t: string")
    wrapped = df.select(
        "t", F.concat(F.lit("<html><body>"), escape_html(F.col("t")),
                      F.lit("</body></html>")).cast("binary").alias("html"))
    out = with_extracted_text(wrapped, out_col="back").toPandas()
    assert out["back"].tolist() == out["t"].tolist()


def test_extract_links(spark):
    from dataquality_spark.functions.html_extract import (
        extract_links_py, outlinks)
    html = (b"<html><body><a href='/a'>x</a><A HREF=\"http://b.ex/p?x=1&amp;y=2\">"
            b"</A><a name='no-href'>z</a><a href=''></a><a href='/c'/></body></html>")
    # entity decoded, empty href skipped, attribute-less <a> skipped,
    # self-closing form included, tag/attr case-insensitive
    assert extract_links_py(html) == ["/a", "http://b.ex/p?x=1&y=2", "/c"]
    assert extract_links_py(None) == []

    df = spark.createDataFrame([("u1", html), ("u2", b"<p>none</p>")],
                               "url string, html binary")
    got = [(r["url"], r["outlink"]) for r in outlinks(df).collect()]
    assert got == [("u1", "/a"), ("u1", "http://b.ex/p?x=1&y=2"), ("u1", "/c")]


def test_link_graph_stats_hand_counts(spark):
    from dataquality_spark.functions.html_extract import link_graph_stats
    rows = [
        # two sources link to T.example.com in hostile forms that must
        # canonicalize to the same host (case, :443, utm, fragment)
        ("a.ex", "HTTPS://T.Example.COM:443/p1?utm_source=x#f"),
        ("a.ex", "https://t.example.com/p2"),
        ("b.ex", "https://t.example.com/p3?gclid=1"),
        # self-link: b.ex -> b.ex
        ("b.ex", "https://b.ex/home"),
        # http :80 default-port strip
        ("a.ex", "HTTP://U.EX:80/q"),
    ]
    df = spark.createDataFrame(rows, "src_host string, outlink string")
    got = {r["host"]: (r["in_links"], r["src_hosts"], r["self_links"])
           for r in link_graph_stats(df).collect()}
    assert got == {
        "t.example.com": (3, 2, 0),
        "b.ex": (1, 1, 1),
        "u.ex": (1, 1, 0),
    }


def test_link_graph_end_to_end_extraction(spark):
    from dataquality_spark.functions.html_extract import (
        link_graph_stats, outlinks)
    html = (b'<html><body><a href="HTTPS://X.EX:443/a?utm_source=1#z">1</a>'
            b'<a href="https://x.ex/b">2</a>'
            b'<a href="https://me.ex/self">3</a></body></html>')
    df = spark.createDataFrame([("me.ex", html)], "src_host string, html binary")
    links = outlinks(df, html_col="html", url_col="src_host")
    got = {r["host"]: (r["in_links"], r["src_hosts"], r["self_links"])
           for r in link_graph_stats(links).collect()}
    assert got == {"x.ex": (2, 1, 0), "me.ex": (1, 1, 1)}
