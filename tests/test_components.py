"""Connected components (large-star/small-star) + canonical winner policy.

Python oracle: union-find over the same edge list, min-id component labels.
"""

import random

import pytest
from pyspark.sql import functions as F

from dataquality_spark.operators.components import (
    canonical_winners,
    connected_components,
    neardup_components,
)


def _uf_labels(edges, nodes=None):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    out = {}
    for x in list(parent) + list(nodes or []):
        out[x] = find(x)
    return out


def _spark_labels(spark, edges, driver_threshold=0):
    # driver_threshold=0 forces the distributed fixpoint (the scale path);
    # the small-graph union-find strategy is asserted equal separately.
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    return {r["id"]: r["component"]
            for r in connected_components(
                df, driver_threshold=driver_threshold).collect()}


def test_components_basic(spark):
    # Two triangles bridged by one edge + an isolated pair.
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4),
             (10, 11)]
    assert _spark_labels(spark, edges) == _uf_labels(edges)


def test_components_strategies_agree(spark):
    """Driver union-find (small-graph strategy) and the distributed
    fixpoint must produce identical labelings."""
    rng = random.Random(13)
    edges = [(rng.randrange(120), rng.randrange(120)) for _ in range(90)]
    edges = [(u, v) for u, v in edges if u != v]
    dist = _spark_labels(spark, edges, driver_threshold=0)
    drv = _spark_labels(spark, edges, driver_threshold=10**6)
    assert dist == drv == _uf_labels(edges)


def test_components_path_graph_converges_logn(spark):
    # A 200-node path is the worst case for naive label propagation
    # (diameter 199); large/small-star must collapse it in <= 25 rounds.
    edges = [(i, i + 1) for i in range(200)]
    labels = _spark_labels(spark, edges)
    assert set(labels.values()) == {0}
    assert len(labels) == 201


def test_components_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    nodes = list(range(300))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(250)]
    edges = [(u, v) for u, v in edges if u != v]
    assert _spark_labels(spark, edges) == _uf_labels(edges)


def test_components_empty_pairs(spark):
    df = spark.createDataFrame([], "id_a: long, id_b: long")
    assert connected_components(df).count() == 0
    assert connected_components(df, driver_threshold=0).count() == 0


def test_neardup_components_singletons_and_winners(spark):
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "aa"), (3, "b"), (4, "cccc cccc")],
        "doc_id: long, text: string")
    pairs = spark.createDataFrame([(1, 2)], "id_a: long, id_b: long")
    labeled = neardup_components(docs, pairs)
    got = {r["doc_id"]: r["component"] for r in labeled.collect()}
    assert got == {1: 1, 2: 1, 3: 3, 4: 4}

    winners = canonical_winners(labeled)
    kept = sorted(r["doc_id"] for r in winners.collect() if r["is_winner"])
    # Component {1,2}: doc 1 has the longer text -> wins; singletons keep.
    assert kept == [1, 3, 4]


def test_components_nonconvergence_raises(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "id_a: long, id_b: long")
    with pytest.raises(RuntimeError):
        connected_components(df, max_iter=0, driver_threshold=0)


def test_components_label_is_min_id(spark):
    edges = [(100, 7), (7, 42), (9, 100)]
    labels = _spark_labels(spark, edges)
    assert set(labels.values()) == {7}


def test_fuzzy_dedup_end_to_end_string_ids(spark):
    from tests.test_dedup import BODY, _pages
    from dataquality_spark.operators.components import fuzzy_dedup

    words = BODY.split()
    v1 = " ".join(w.upper() if i == 7 else w for i, w in enumerate(words))
    v2 = " ".join(w.upper() if i == 13 else w for i, w in enumerate(words))
    rows = [
        ("u_a", "2024-01-01", BODY),
        ("u_b", "2024-01-02", v1),       # near-dup of u_a
        ("u_c", "2024-01-03", v2),       # near-dup of u_a (and of u_b only
                                         # transitively -> same component)
        ("u_d", "2024-01-04", "unrelated content " * 40),
    ]
    out = fuzzy_dedup(_pages(spark, rows), id_col="url").toPandas()
    comp = out.set_index("url")["component"]
    assert comp["u_a"] == comp["u_b"] == comp["u_c"]
    assert comp["u_d"] != comp["u_a"]
    winners = set(out[out["is_winner"]]["url"])
    assert "u_d" in winners
    assert len(winners & {"u_a", "u_b", "u_c"}) == 1
    # every row labeled, exactly one winner per component
    assert len(out) == 4
    per_comp = out.groupby("component")["is_winner"].sum()
    assert (per_comp == 1).all()


def test_fuzzy_dedup_numeric_ids(spark):
    from tests.test_dedup import BODY
    from dataquality_spark.operators.components import fuzzy_dedup

    words = BODY.split()
    v1 = " ".join(w.upper() if i == 7 else w for i, w in enumerate(words))
    df = spark.createDataFrame(
        [(1, BODY), (2, v1), (3, "unrelated content " * 40)],
        "doc_id: long, text: string")
    out = fuzzy_dedup(df, id_col="doc_id").toPandas()
    comp = out.set_index("doc_id")["component"]
    # numeric ids keep their own values as labels (min id in component)
    assert comp[1] == comp[2] == 1
    assert comp[3] == 3


def test_global_offset_matches_single_partition_window(spark):
    """The two-phase distributed prefix sum must equal the naive global
    window for any partitioning."""
    import random
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from dataquality_spark.operators.packing import with_global_offset

    rng = random.Random(3)
    rows = [(i, rng.randint(1, 50)) for i in range(500)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "doc_id: long, n_tokens: long") \
        .repartition(7)
    got = {r["doc_id"]: r["offset"]
           for r in with_global_offset(df, "n_tokens",
                                       ["doc_id"]).collect()}
    w = (Window.orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    want = {r["doc_id"]: r["off"]
            for r in df.withColumn(
                "off", F.sum("n_tokens").over(w) - F.col("n_tokens"))
            .collect()}
    assert got == want


def test_pack_sequences_chunks(spark):
    from dataquality_spark.operators.packing import pack_sequences
    df = spark.createDataFrame(
        [(1, 600), (2, 300), (3, 200), (4, 1500), (5, 10)],
        "doc_id: long, n_tokens: long")
    out = {r["doc_id"]: (r["offset"], r["chunk_id"], r["chunk_pos"])
           for r in pack_sequences(df, ctx_len=1024).collect()}
    assert out == {
        1: (0, 0, 0),
        2: (600, 0, 600),
        3: (900, 0, 900),      # crosses into chunk 1 — starts in chunk 0
        4: (1100, 1, 76),
        5: (2600, 2, 552),
    }


def test_fuzzy_dedup_nondefault_text_col(spark):
    """Regression: the default winner policy must derive from THIS call's
    text_col — canonical_winners' own default hardcodes 'text' and used to
    crash (UNRESOLVED_COLUMN) for any other column name."""
    from tests.test_dedup import BODY
    from dataquality_spark.operators.components import fuzzy_dedup
    rows = [(1, BODY + " longer tail here"), (2, BODY),
            (3, "unrelated filler " * 40)]
    df = spark.createDataFrame(rows, "doc_id long, body string")
    out = fuzzy_dedup(df, id_col="doc_id", text_col="body",
                      jaccard_threshold=0.5).toPandas()
    comp = out.set_index("doc_id")["component"]
    assert comp[1] == comp[2] != comp[3]
    # longest body wins within the near-dup component
    winners = set(out[out["is_winner"]]["doc_id"])
    assert 1 in winners and 2 not in winners and 3 in winners


def test_global_offset_empty_frame(spark):
    """Regression: empty input used to fail analysis (bare create_map() is
    map<void,void> and cannot be indexed by the int partition id)."""
    from dataquality_spark.operators.packing import pack_sequences
    df = (spark.createDataFrame([(1, 5)], "doc_id long, n_tokens long")
          .where("n_tokens < 0"))
    out = pack_sequences(df, ctx_len=16)
    assert out.count() == 0
    assert {"offset", "chunk_id", "chunk_pos"} <= set(out.columns)


def test_global_offset_persists_one_partitioning(spark):
    """The range-partitioned frame must be persisted: the totals collect and
    the caller's action are separate jobs whose RangePartitioners re-sample
    boundaries independently — the cache pins one materialized partitioning
    (cleanup contract returns the handle)."""
    from dataquality_spark.operators.packing import with_global_offset
    rows = [(i, (i * 7) % 13 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    cleanup = []
    out = with_global_offset(df, "n_tokens", ["doc_id"], cleanup=cleanup)
    assert len(cleanup) == 1 and cleanup[0].is_cached
    got = {r["doc_id"]: r["offset"] for r in out.collect()}
    acc = 0
    for i in range(500):
        assert got[i] == acc
        acc += (i * 7) % 13 + 1
    for f in cleanup:
        f.unpersist()


def test_asof_join_null_keys_never_match(spark):
    """Regression: NULL equality keys used to match each other through the
    window partition — ASOF/equi-join semantics say NULL matches nothing."""
    from dataquality_spark.operators.asof import asof_join
    left = spark.createDataFrame(
        [(None, 5), ("k", 5)], "k string, t int")
    right = spark.createDataFrame(
        [(None, 1, 9.0), ("k", 1, 7.0)], "k string, t int, v double")
    out = {(r["k"],): r["v"] for r in
           asof_join(left, right, on="k", left_time="t", right_time="t",
                     value_cols=["v"]).collect()}
    assert out[("k",)] == 7.0
    assert out[(None,)] is None


def test_leakage_safe_split_cluster_grain(spark):
    """Every near-dup cluster lands wholly in ONE split (the structural
    guarantee), and the split label matches the portable hash of the
    component id."""
    from dataquality_spark.queries import q_leakage_safe_split
    out = q_leakage_safe_split(spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    by_comp = {}
    for r in out:
        by_comp.setdefault(r.component, set()).add(r.split)
        b = (r.component * 2654435761) % 2147483647 % 100
        want = "train" if b < 80 else ("val" if b < 90 else "test")
        assert r.split == want
    assert all(len(s) == 1 for s in by_comp.values())
    # the sf0.001 corpus has at least one multi-doc cluster, so the
    # guarantee is exercised, not vacuous
    from collections import Counter
    comp_sizes = Counter(r.component for r in out)
    assert max(comp_sizes.values()) >= 2
