"""S-1/S-2/S-3 source dispatch: XLSX reader/writer round-trip, shared-string
cells, CSV encoding fallback, DataFrame passthrough.

Reference parity: `read_data` (`/root/reference/utils/core_operations.py:50-70`).
"""

import zipfile

import pandas as pd
import pytest

from dataquality_spark.sources import read_data, read_xlsx, read_xlsx_pdf, write_xlsx


@pytest.fixture()
def sample_pdf():
    return pd.DataFrame({
        "name": ["alice", "bob", "zoë — ünïcode", "d<&>e"],
        "count": [1, 2, 3, 4],
        "score": [0.5, 1.25, None, 3.0],
        "ok": [True, False, True, False],
    })


def test_xlsx_roundtrip_values(tmp_path, sample_pdf):
    p = str(tmp_path / "t.xlsx")
    write_xlsx(sample_pdf, p)
    back = read_xlsx_pdf(p)
    assert list(back.columns) == ["name", "count", "score", "ok"]
    assert back["name"].tolist() == sample_pdf["name"].tolist()
    # pandas-default narrowing: whole-valued numeric column -> int64
    assert back["count"].dtype == "int64"
    assert back["count"].tolist() == [1, 2, 3, 4]
    assert back["score"][1] == 1.25 and pd.isna(back["score"][2])
    assert back["ok"].tolist() == [True, False, True, False]


def test_xlsx_spark_read(spark, tmp_path, sample_pdf):
    p = str(tmp_path / "t.xlsx")
    write_xlsx(sample_pdf, p)
    df = read_xlsx(spark, p)
    assert df.count() == 4
    assert set(df.columns) == {"name", "count", "score", "ok"}
    row = df.where("name = 'bob'").collect()[0]
    assert row["count"] == 2 and row["score"] == 1.25 and row["ok"] is False


def test_xlsx_shared_strings_and_sparse_rows(tmp_path):
    """Exercise the t="s" shared-string path and missing-cell alignment —
    the layout openpyxl/Excel actually emit (our writer uses inlineStr)."""
    p = str(tmp_path / "ss.xlsx")
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = (
        f'<worksheet xmlns="{ns}"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>'
        '<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>10</v></c></row>'
        '<row r="3"><c r="B3"><v>20</v></c></row>'  # A3 missing -> null
        "</sheetData></worksheet>"
    )
    shared = (
        f'<sst xmlns="{ns}" count="3" uniqueCount="3">'
        "<si><t>city</t></si><si><t>pop</t></si>"
        "<si><r><t>mont</t></r><r><t>réal</t></r></si></sst>"  # rich runs
    )
    write_xlsx(pd.DataFrame({"x": [1]}), p)  # valid scaffold…
    with zipfile.ZipFile(p, "a") as zf:      # …then override sheet + add sst
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
        zf.writestr("xl/sharedStrings.xml", shared)
    back = read_xlsx_pdf(p)
    assert list(back.columns) == ["city", "pop"]
    assert back["city"][0] == "montréal" and back["city"][1] is None
    assert back["pop"].tolist() == [10, 20]


def test_read_data_csv_utf8_and_cp1252(spark, tmp_path):
    utf8 = tmp_path / "a.csv"
    utf8.write_bytes("﻿name,n\nzoë,1\n".encode("utf-8"))
    df = read_data(spark, str(utf8))
    assert df.columns == ["name", "n"]  # BOM stripped from header
    assert df.collect()[0]["name"] == "zoë"

    win = tmp_path / "b.csv"
    # cp1252, invalid utf-8: é (0xE9, latin-1-shared) AND cp1252-only
    # curly quotes + euro (0x93/0x94/0x80, which latin-1 maps to C1 controls)
    win.write_bytes(b"name,n\ncaf\xe9 \x93x\x94 \x80,2\n")
    df2 = read_data(spark, str(win))
    assert df2.collect()[0]["name"] == "café “x” €"


def test_read_data_passthrough_and_name_ext(spark, tmp_path, sample_pdf):
    df = spark.range(3)
    assert read_data(spark, df) is df  # S-3
    p = str(tmp_path / "blob")         # extension carried via name=
    write_xlsx(sample_pdf, p)
    assert read_data(spark, p, name="upload.xlsx").count() == 4


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    """Two tables bucketed on the join key with the same bucket count must
    join with ZERO shuffle exchanges; the identical unbucketed join must
    shuffle — the co-location contract for recurring joins at scale."""
    from dataquality_spark.sources.bucketed import (
        colocated_join, exchange_count, write_bucketed)

    docs = spark.range(0, 2000).selectExpr(
        "id AS doc_id", "concat('text-', id) AS text")
    labels = spark.range(0, 2000).selectExpr(
        "id AS doc_id", "id % 7 AS label")
    write_bucketed(docs, "b_docs", "doc_id", n_buckets=8, sort_col="doc_id")
    write_bucketed(labels, "b_labels", "doc_id", n_buckets=8,
                   sort_col="doc_id")
    # tiny test tables would broadcast (which also avoids a shuffle but
    # proves nothing about co-location); force the shuffle-join regime the
    # technique targets — at scale neither side is broadcastable
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(spark, "b_docs", "b_labels", "doc_id")
        assert exchange_count(j) == 0
        assert j.count() == 2000
        row = j.where("doc_id = 13").collect()[0]
        assert row["text"] == "text-13" and row["label"] == 6

        plain = docs.join(labels.withColumnRenamed("label", "l2"), "doc_id")
        assert exchange_count(plain) >= 1  # contrast: unbucketed shuffles
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_docs")
        spark.sql("DROP TABLE IF EXISTS b_labels")


def test_run_rule_on_xlsx_input(spark, tmp_path):
    """End-to-end S-2 integration: the uniform rule API accepts an .xlsx
    dataset path exactly like the reference's read_data dispatch."""
    from dataquality_spark.api import run_rule
    pdf = pd.DataFrame({
        "url": ["u1", "u2", "u3"],
        "text": ["word " * 60, "tiny", "another document " * 30],
        "lang": ["en", "en", "en"],
    })
    p = str(tmp_path / "pages.xlsx")
    write_xlsx(pdf, p)
    score, _ = run_rule(spark, p, "min_words")
    assert score == pytest.approx(2 / 3)


def test_xlsx_roundtrip_property():
    """Property: any table of XML-legal text + finite numerics survives the
    write→read round trip; XML-invalid control chars are stripped on write
    (openpyxl's policy) rather than corrupting the file."""
    from hypothesis import given, settings, strategies as st
    import re
    xml_invalid = re.compile(
        "[\x00-\x08\x0b\x0c\x0e-\x1f\ud800-\udfff￾￿]")
    text = st.text(min_size=0, max_size=40)
    num = st.floats(allow_nan=False, allow_infinity=False,
                    width=32).map(float)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.tuples(text, num, st.booleans()),
                    min_size=1, max_size=8))
    def check(rows):
        import tempfile, os
        pdf = pd.DataFrame(rows, columns=["s", "x", "b"])
        fd, p = tempfile.mkstemp(suffix=".xlsx")
        os.close(fd)
        try:
            write_xlsx(pdf, p)
            back = read_xlsx_pdf(p)
        finally:
            os.unlink(p)
        for i, (s, x, b) in enumerate(rows):
            want = xml_invalid.sub("", s)
            got = back["s"][i]
            assert (got or "") == want, (got, want)
            assert back["x"][i] == pytest.approx(x)
            assert bool(back["b"][i]) == b

    check()


def test_read_data_empty_csv_and_probe_boundary(spark, tmp_path):
    """A zero-byte CSV must not crash on the BOM strip; a valid UTF-8 file
    whose probe window truncates a multi-byte char mid-sequence must still
    be read as UTF-8 (no silent mojibake)."""
    from dataquality_spark.sources.read import _PROBE_BYTES, _is_utf8
    empty = tmp_path / "e.csv"
    empty.write_bytes(b"")
    assert read_data(spark, str(empty)).count() == 0

    big = tmp_path / "big.csv"
    pad = b"name,n\n" + b"x,1\n" * ((_PROBE_BYTES - 7) // 4)
    body = pad + (b"a" * (_PROBE_BYTES - len(pad) - 1)) + "é".encode("utf-8")
    assert body[_PROBE_BYTES - 1:_PROBE_BYTES + 1] == "é".encode("utf-8")
    big.write_bytes(body + b",2\n")
    assert _is_utf8(str(big))  # boundary-truncated é is not a cp1252 signal


def test_zorder_key_matches_scalar_spec(spark):
    import random
    from pyspark.sql import functions as F
    from dataquality_spark.functions.zorder import (
        zorder_key2, zorder_key2_py)
    rng = random.Random(5)
    rows = [(rng.randrange(1 << 16), rng.randrange(1 << 16))
            for _ in range(200)] + [(0, 0), (65535, 65535), (1, 0), (0, 1)]
    df = spark.createDataFrame(rows, "a: long, b: long")
    got = [r["k"] for r in
           df.select(zorder_key2(F.col("a"), F.col("b")).alias("k"))
           .collect()]
    want = [zorder_key2_py(a, b) for a, b in rows]
    assert got == want


def test_write_zordered_prunes_both_dims(spark, tmp_path):
    """The point of the layout: after a z-ordered write, a range predicate
    on EITHER dimension touches a small fraction of files (per-file min/max
    tiles), vs ~all files under a one-dimensional sort for the non-sorted
    column."""
    import itertools
    from pyspark.sql import functions as F
    from dataquality_spark.functions.zorder import write_zordered

    rows = [(x, y) for x, y in itertools.product(range(256), range(256))]
    df = spark.createDataFrame(rows, "x: long, y: long")
    path = str(tmp_path / "zo")
    write_zordered(df, path, "x", "y", files=16)

    back = spark.read.parquet(path).withColumn(
        "f", F.element_at(F.split(F.input_file_name(), "/"), -1))
    n_files = back.select("f").distinct().count()
    assert n_files == 16
    # a 1/8th range slice on each dimension
    fx = back.where(F.col("x") < 32).select("f").distinct().count()
    fy = back.where(F.col("y") < 32).select("f").distinct().count()
    # each slice intersects a minority of tiles on BOTH dimensions (a
    # 1-D x-sort would put y<32 rows in every file)
    assert fx <= n_files // 2 and fy <= n_files // 2


def test_warc_streaming_parse_with_tiny_chunks():
    """The incremental parser must produce identical records regardless of
    where decompression chunk boundaries fall (records split across
    chunks, headers split mid-line, multi-member gzip)."""
    from dataquality_spark.sources import warc as W
    recs = [(f"http://h/{i}", "2024-01-02T03:04:05Z",
             (f"<html>{'x' * (50 + 37 * i)}</html>").encode())
            for i in range(12)]
    import tempfile, os
    d = tempfile.mkdtemp()
    p = os.path.join(d, "t.warc.gz")
    W.write_warc(recs, p)
    raw = open(p, "rb").read()
    want = list(W.iter_warc_records(raw))
    # force pathological chunking: 7-byte compressed feeds so records and
    # headers split across every boundary
    old = W._GZ_STEP
    try:
        W._GZ_STEP = 7
        got = list(W.iter_warc_records(raw))
    finally:
        W._GZ_STEP = old
    assert len(want) == len(got) == 12
    for (h1, p1), (h2, p2) in zip(want, got):
        assert h1 == h2 and p1 == p2


def test_xlsx_error_and_date_cells_do_not_crash(tmp_path):
    """Formula-error (t="e") and ISO-date (t="d") cells must read as their
    text, matching pd.read_excel's keep-the-string behavior."""
    import zipfile
    from dataquality_spark.sources.xlsx import read_xlsx_pdf, write_xlsx
    import pandas as pd
    p = str(tmp_path / "t.xlsx")
    write_xlsx(pd.DataFrame({"a": [1.0], "b": ["x"]}), p)
    # splice an error cell into the sheet xml
    with zipfile.ZipFile(p) as z:
        names = {n: z.read(n) for n in z.namelist()}
    sheet = names["xl/worksheets/sheet1.xml"]
    sheet = sheet.replace(
        b"</sheetData>",
        b'<row r="3"><c r="A3" t="e"><v>#DIV/0!</v></c>'
        b'<c r="B3" t="d"><v>2024-01-02</v></c></row></sheetData>')
    names["xl/worksheets/sheet1.xml"] = sheet
    with zipfile.ZipFile(p, "w") as z:
        for n, data in names.items():
            z.writestr(n, data)
    df = read_xlsx_pdf(p)
    assert df.iloc[-1, 0] == "#DIV/0!"
    assert df.iloc[-1, 1] == "2024-01-02"


def test_write_xlsx_quoted_sheet_name_roundtrip(tmp_path):
    from dataquality_spark.sources.xlsx import read_xlsx_pdf, write_xlsx
    import pandas as pd
    p = str(tmp_path / "q.xlsx")
    write_xlsx(pd.DataFrame({"a": [1.0]}), p, sheet_name='Q1 "final"')
    assert read_xlsx_pdf(p)["a"].tolist() == [1]
