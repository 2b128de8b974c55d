"""Round-5 late additions: per-group boilerplate line removal
(`remove_boilerplate_lines`) and top-K-vocabulary coverage
(`vocab_coverage`). The exact-oracle sweep (tools/verify_queries.py) is
the cross-engine gate; these pin the operator-level semantics directly."""

import pyspark.sql.functions as F


def _boiler(spark, rows, **kw):
    from dataquality_spark.operators.dedup import remove_boilerplate_lines
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string")
    out = remove_boilerplate_lines(
        df, id_col="doc_id", text_col="text", group_col="source",
        sep="\n", **kw)
    return {r.doc_id: r.text for r in out.collect()}


def test_boilerplate_removed_from_every_doc_of_the_group(spark):
    # "cookie banner" appears in 3 distinct docs of src0 -> removed from
    # ALL of them (no first-occurrence survivor, unlike dedup_paragraphs)
    rows = [
        (1, "src0", "cookie banner\nreal content one"),
        (2, "src0", "cookie banner\nreal content two"),
        (3, "src0", "intro\ncookie banner\noutro"),
    ]
    got = _boiler(spark, rows, min_docs=3)
    assert got == {1: "real content one", 2: "real content two",
                   3: "intro\noutro"}


def test_boilerplate_threshold_and_group_scoping(spark):
    # the same line in only 2 docs stays below min_docs=3; and counts
    # never pool across groups — 2 hits in src0 + 2 in src1 is 2, not 4
    rows = [
        (1, "src0", "shared line\nalpha"),
        (2, "src0", "shared line\nbeta"),
        (3, "src1", "shared line\ngamma"),
        (4, "src1", "shared line\ndelta"),
    ]
    got = _boiler(spark, rows, min_docs=3)
    assert got[1] == "shared line\nalpha"
    assert got[4] == "shared line\ndelta"


def test_boilerplate_within_doc_repeats_count_once(spark):
    # one doc repeating the line 5 times contributes ONE distinct-doc hit
    rows = [
        (1, "src0", "\n".join(["promo"] * 5)),
        (2, "src0", "promo\nbody"),
    ]
    got = _boiler(spark, rows, min_docs=3)
    assert got[1] == "\n".join(["promo"] * 5)  # nd=2 < 3: kept everywhere
    got2 = _boiler(spark, rows, min_docs=2)
    assert got2 == {1: "", 2: "body"}  # nd=2 >= 2: dropped everywhere


def test_boilerplate_null_and_blank_edges(spark):
    rows = [
        (1, "src0", None),            # null text -> ''
        (2, "src0", "   \n  "),       # blank lines only -> ''
        (3, None, "x\nkept"),         # NULL group never matches boiler
        (4, None, "x\nkept too"),
        (5, None, "x\nthird"),
    ]
    got = _boiler(spark, rows, min_docs=2)
    assert got[1] == "" and got[2] == ""
    # Spark's left_anti is null-unsafe on the group key: 'x' appears in 3
    # NULL-group docs but is still kept (the oracle mirrors with plain =)
    assert got[3] == "x\nkept" and got[5] == "x\nthird"


def test_boilerplate_partition_invariance(spark):
    rows = [(i, f"src{i % 3}",
             "banner\n" + " ".join(f"w{i}{j}" for j in range(4)))
            for i in range(30)]
    from dataquality_spark.operators.dedup import remove_boilerplate_lines
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string")
    outs = []
    for parts in (1, 7):
        out = remove_boilerplate_lines(
            df.repartition(parts), id_col="doc_id", text_col="text",
            group_col="source", sep="\n", min_docs=3)
        outs.append(sorted((r.doc_id, r.text) for r in out.collect()))
    assert outs[0] == outs[1]
    assert all("banner" not in t for _, t in outs[0])


def _cov(spark, tmp_path, rows):
    from dataquality_spark.queries import QUERIES
    df = spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string, "
              "n_chars: long")
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet")
    out = QUERIES["vocab_coverage"](spark, str(tmp_path))
    return {r.doc_id: (r.total_tokens, r.in_vocab_tokens, r.coverage)
            for r in out.collect()}


def test_vocab_coverage_counts(spark, tmp_path):
    # 30 'hot' + 30 'warm' swamp the top-24 cutoff; each rare word
    # appears once, so the vocabulary is exactly {hot, warm} + 22 rares —
    # but with 24 >= distinct words here, EVERY word is in vocab. Force a
    # real OOV by using > 24 distinct singletons.
    rare = " ".join(f"r{i}" for i in range(40))  # 40 singleton words
    rows = [
        (1, "hot " * 30 + "warm " * 30, "en", "s", 1),
        (2, rare, "en", "s", 1),
        (3, "hot warm hot", "en", "s", 1),
        (4, None, "en", "s", None),
        (5, "", "en", "s", 0),
    ]
    got = _cov(spark, tmp_path, rows)
    # vocab = hot, warm + 22 of the 40 singletons (hex tie-break): doc 2
    # has exactly 22 of its 40 words in vocab
    assert got[1] == (60, 60, 1.0)
    assert got[2][0] == 40 and got[2][1] == 22
    assert got[3] == (3, 3, 1.0)
    assert got[4] == (0, 0, 0.0)
    assert got[5] == (0, 0, 0.0)


def test_vocab_coverage_boundary_tiebreak_is_bytewise(spark, tmp_path):
    # every word is a singleton: the whole top-K is one big tie, resolved
    # by hex(utf8 bytes) ascending — 'a' (0x61) beats 'b' (0x62), and the
    # non-BMP math X (0xF0 0x9D ...) sorts AFTER all ASCII on both engines
    words = [f"w{i:02d}" for i in range(23)] + ["a", "b", "\U0001d54f"]
    rows = [(i, w, "en", "s", len(w)) for i, w in enumerate(words)]
    got = _cov(spark, tmp_path, rows)
    by_word = {w: got[i] for i, w in enumerate(words)}
    assert by_word["a"][1] == 1          # in vocab (lowest bytes)
    assert by_word["\U0001d54f"][1] == 0  # highest bytes: the one cut
