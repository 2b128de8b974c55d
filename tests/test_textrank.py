"""TextRank (operators/textrank.py): the fixed-point PageRank iteration
against a scalar pure-Python replay of the same spec, hand-checked graph
shapes, mass behavior, the int64 envelope guard, and partition
invariance."""

import pytest
from pyspark.sql import functions as F

from dataquality_spark.operators.textrank import (TEXTRANK_SCALE,
                                                  portable_tokens,
                                                  textrank_keywords)


def _scalar_textrank(texts, iters=3, scale=TEXTRANK_SCALE):
    """Slow reference: exactly the documented spec, dict arithmetic."""
    import re
    strip = re.compile(r"[^A-Za-z0-9 \t\n\r\f\v]+")
    ws_rx = re.compile(r"[ \t\n\r\f\v]+")
    edges: dict[tuple[str, str], int] = {}
    nodes: set[str] = set()
    for t in texts:
        norm = ws_rx.sub(" ", strip.sub("", t or "")).strip().lower()
        if not norm:
            continue
        ws = norm.split(" ")
        nodes.update(ws)
        for a, b in zip(ws, ws[1:]):
            if a != b:
                edges[(a, b)] = edges.get((a, b), 0) + 1
                edges[(b, a)] = edges.get((b, a), 0) + 1
    wout: dict[str, int] = {}
    for (a, _), w in edges.items():
        wout[a] = wout.get(a, 0) + w
    base = (15 * scale) // 100
    r = {v: scale for v in nodes}
    for _ in range(iters):
        s: dict[str, int] = {}
        for (a, b), w in edges.items():
            s[b] = s.get(b, 0) + (r[a] * w) // wout[a]
        r = {v: base + (85 * s.get(v, 0)) // 100 for v in nodes}
    return r


def _run(spark, texts, **kw):
    df = spark.createDataFrame([(t,) for t in texts], "text: string")
    pins: list = []
    out = textrank_keywords(df, cleanup=pins, **kw)
    rows = {r["token"]: r["score"] for r in out.collect()}
    for p in pins:
        p.unpersist()
    return rows


def test_matches_scalar_reference(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the dog barks at the quick fox",
        "Pünct, (strip) — İstanbul 東京 quick fox tail",
        "", None, "solo",
        "a b a b a c",
        "tabs\tand\nnewlines  collapse here",
    ]
    got = _run(spark, texts)
    ref = _scalar_textrank(texts)
    top = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == dict(top)


def test_isolated_token_keeps_base_rank(spark):
    # 'solo' has no co-occurrence edges: after any iteration its rank is
    # exactly the damping base — a node without in-edges, not a dropped row
    got = _run(spark, ["left right", "solo"])
    assert got["solo"] == (15 * TEXTRANK_SCALE) // 100


def test_symmetric_two_node_mass_fixed_point(spark):
    # a—b with equal weights: each node passes its whole rank across, so
    # scale is the exact fixed point: 15% base + 85% of one full rank
    got = _run(spark, ["alpha beta"])
    assert got == {"alpha": TEXTRANK_SCALE, "beta": TEXTRANK_SCALE}


def test_self_pairs_are_not_edges(spark):
    # "x x x" produces only self-pairs → x is isolated at base rank
    got = _run(spark, ["x x x"])
    assert got["x"] == (15 * TEXTRANK_SCALE) // 100


def test_overflow_guard_trips(spark):
    df = spark.createDataFrame([("hub spoke",)] * 3, "text: string")
    with pytest.raises(ValueError, match="envelope"):
        textrank_keywords(df, scale=1 << 62)


def test_driver_and_distributed_paths_agree(spark):
    # the size-adaptive cutover must be invisible: force the distributed
    # join rounds (driver_max_edges=0) and compare against the default
    # driver loop on the same corpus
    texts = [f"w{i % 6} w{(i + 2) % 6} w{(i * 5) % 11} common"
             for i in range(60)] + ["solo", "", None]
    a = _run(spark, texts)
    b = _run(spark, texts, driver_max_edges=0)
    assert a == b


def test_partition_invariance(spark):
    texts = [f"w{i % 5} w{(i + 1) % 5} w{(i * 3) % 7}" for i in range(50)]
    a = _run(spark, texts)
    df = spark.createDataFrame([(t,) for t in texts], "text: string") \
              .repartition(13)
    pins: list = []
    out = textrank_keywords(df, cleanup=pins)
    b = {r["token"]: r["score"] for r in out.collect()}
    for p in pins:
        p.unpersist()
    assert a == b


def test_portable_tokens_blank_and_nonascii(spark):
    df = spark.createDataFrame(
        [("",), (None,), ("東京",), (" A  B\t",)], "text: string")
    got = [r[0] for r in
           df.select(portable_tokens(F.col("text"))).collect()]
    assert got == [[], [], [], ["a", "b"]]
