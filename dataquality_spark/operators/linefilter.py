"""C4/Gopher line-level page cleaning as native DataFrame expressions.

C4 (Raffel et al. 2020, "Exploring the Limits of Transfer Learning with a
Unified Text-to-Text Transformer", §2.2) cleans Common Crawl pages line by
line: retain only lines that end in a terminal punctuation mark, contain at
least five words, and do not contain the word "javascript"; then discard
whole pages that contain a curly brace or the phrase "lorem ipsum", or that
retain fewer than three lines (C4 states the floor in sentences; at line
granularity the retained-line count is the standard restatement, cf.
RefinedWeb appendix). Gopher (Rae et al. 2021, "Scaling Language Models",
§A1.1) adds page-shape rules over the same line list: at most 90% of lines
may start with a bullet and at most 30% may end with an ellipsis.

The reference has no line-level stage — its quality tests are whole-column
heuristics (`dimensions/accuracy/a1.py:34-72`) — so this module is the
web-curation analogue its rule registry implies, built the way the rest of
`rules/heuristics.py` is: split → per-line predicate → rejoin inside ONE
projection using higher-order functions (`filter`/`transform`), no UDF, no
shuffle. The operator is a narrow map: at 100 TB it costs exactly one pass,
composes with column pruning, and the boolean `page_kept` pushes into any
downstream filter.

NULL convention (pinned on both engines, same class as the dsir_select /
token_drift NULL-key pins): a NULL page is treated as the empty page — one
empty line, nothing retained, `page_kept = false` — via an explicit
coalesce, so neither engine's NULL propagation decides the flag.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# C4 §2.2: "terminal punctuation mark (i.e. a period, exclamation mark,
# question mark, or end quotation mark)"
TERMINAL_PUNCT = (".", "!", "?", '"')
# Gopher A1.1 bullet/ellipsis line prefixes and suffixes.
BULLET_PREFIXES = ("- ", "• ", "* ")
ELLIPSIS_SUFFIXES = ("…", "...")

C4_MIN_LINE_WORDS = 5
C4_MIN_KEPT_LINES = 3
GOPHER_MAX_BULLET_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_FRAC = 0.3


def _line_word_count(line: Column) -> Column:
    """Words on one rendered line: split on single spaces, drop empties.
    Kept deliberately simpler than functions/text.words_col (\\s+): a line
    by construction has no internal newlines/tabs, and the single-space
    split is cheap enough to run per line inside the higher-order filter."""
    return F.size(F.filter(F.split(line, " "), lambda w: w != F.lit("")))


def _c4_keep_line(line: Column, min_line_words: int) -> Column:
    return (
        F.substring(line, -1, 1).isin(list(TERMINAL_PUNCT))
        & (_line_word_count(line) >= F.lit(min_line_words))
        & ~F.lower(line).contains("javascript")
    )


def c4_line_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_line_words: int = C4_MIN_LINE_WORDS,
    min_kept_lines: int = C4_MIN_KEPT_LINES,
) -> DataFrame:
    """C4 §2.2 line filter + page gate in one shuffle-free projection.

    Returns ``(id_col, c4_text, total_lines, kept_lines, page_kept)`` where
    ``c4_text`` is the retained lines rejoined with ``sep`` ('' when nothing
    survives) and ``page_kept`` applies the page-level rules (no '{', no
    case-insensitive 'lorem ipsum', >= min_kept_lines retained lines).
    ``sep`` is used as a literal by the rejoin and as a regex by the split —
    pass a regex-neutral separator (the default newline is).
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(text, sep)
    kept = F.filter(lines, lambda l: _c4_keep_line(l, min_line_words))
    page_kept = (
        ~text.contains("{")
        & ~F.lower(text).contains("lorem ipsum")
        & (F.size(kept) >= F.lit(min_kept_lines))
    )
    return df.select(
        F.col(id_col),
        F.array_join(kept, sep).alias("c4_text"),
        F.size(lines).alias("total_lines"),
        F.size(kept).alias("kept_lines"),
        page_kept.alias("page_kept"),
    )


def _any_startswith(line: Column, prefixes: tuple[str, ...]) -> Column:
    out = F.lit(False)
    for p in prefixes:
        out = out | line.startswith(p)
    return out


def _any_endswith(line: Column, suffixes: tuple[str, ...]) -> Column:
    out = F.lit(False)
    for s in suffixes:
        out = out | line.endswith(s)
    return out


def gopher_line_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    max_bullet_frac: float = GOPHER_MAX_BULLET_FRAC,
    max_ellipsis_frac: float = GOPHER_MAX_ELLIPSIS_FRAC,
) -> DataFrame:
    """Gopher A1.1 page-shape stats: bullet-start and ellipsis-end line
    fractions plus their PASS flags (<= 90% / <= 30%), same flag-column
    convention as rules/heuristics.py (True = PASS).

    The fractions are emitted as the raw single division of two counts —
    both engines divide identical integers, so the doubles are
    bit-identical without any rounding shim (the float-free oracle
    design rule; see the İ/round(·,4) episodes in BENCH/BASELINE.md).
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(text, sep)
    n = F.size(lines)  # split yields >= 1 element, so n >= 1 always
    bullets = F.size(F.filter(lines, lambda l: _any_startswith(l, BULLET_PREFIXES)))
    ells = F.size(F.filter(lines, lambda l: _any_endswith(l, ELLIPSIS_SUFFIXES)))
    bullet_frac = bullets / n
    ellipsis_frac = ells / n
    return df.select(
        F.col(id_col),
        n.alias("total_lines"),
        bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"),
        (bullet_frac <= F.lit(max_bullet_frac)).alias("r_bullet"),
        (ellipsis_frac <= F.lit(max_ellipsis_frac)).alias("r_ellipsis"),
    )


# Gopher A1.2 repetition-removal thresholds (Rae et al. 2021 Table A1),
# expressed as exact rationals (num, den) so the PASS flags can compare
# cross-multiplied integers instead of floats.
GOPHER_MAX_DUP_LINE_FRAC = (3, 10)        # duplicate line fraction <= 0.30
GOPHER_MAX_DUP_PARA_FRAC = (3, 10)        # duplicate paragraph fraction <= 0.30
GOPHER_MAX_DUP_LINE_CHAR_FRAC = (1, 5)    # dup line char fraction   <= 0.20
GOPHER_MAX_DUP_PARA_CHAR_FRAC = (1, 5)    # dup para char fraction   <= 0.20


def _nonblank(arr: Column) -> Column:
    return F.filter(arr, lambda x: x != F.lit(""))


def _char_sum(arr: Column) -> Column:
    """Total characters across an array of strings, as int64."""
    return F.aggregate(arr, F.lit(0).cast("long"),
                       lambda acc, x: acc + F.length(x))


def gopher_repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_sep: str = "\n",
    para_sep: str = "\n\n",
    max_dup_line_frac: tuple[int, int] = GOPHER_MAX_DUP_LINE_FRAC,
    max_dup_para_frac: tuple[int, int] = GOPHER_MAX_DUP_PARA_FRAC,
    max_dup_line_char_frac: tuple[int, int] = GOPHER_MAX_DUP_LINE_CHAR_FRAC,
    max_dup_para_char_frac: tuple[int, int] = GOPHER_MAX_DUP_PARA_CHAR_FRAC,
) -> DataFrame:
    """Gopher repetition-removal signals (Rae et al. 2021 §A1.2, Table A1):
    per document, duplicate-line / duplicate-paragraph counts and the
    character mass inside those duplicates, plus the four PASS flags
    (dup-line and dup-paragraph fraction <= 30%, dup-line-char and
    dup-paragraph-char fraction <= 20%; True = PASS, the
    rules/heuristics.py flag convention).

    Definition pinned for exactness (the paper's prose is ambiguous about
    whether the first occurrence counts): a "duplicate" is every
    occurrence of a value BEYOND its first, so
    ``dup = size(arr) - size(array_distinct(arr))`` and
    ``dup_chars = char_sum(arr) - char_sum(array_distinct(arr))`` — the
    identity form: integer-exact, no hashing, no sort, derivable from the
    same array primitives on any engine.

    All eight emitted measures are int64 COUNTS, never fractions; the
    flags compare cross-multiplied integers (``dup * den <= num * total``
    for threshold num/den), so the operator is float-free end to end —
    the strongest form of the repo's float-free oracle rule.

    Scale shape: ZERO shuffle — one narrow projection over the scan using
    higher-order functions only (split / filter / array_distinct /
    aggregate), no UDF, so whole-stage codegen keeps it JVM-side and at
    100 TB it costs exactly one pass, composing with column pruning and
    any downstream filter pushdown on the flags.

    Lines are ``line_sep`` splits with blank entries dropped (a paragraph
    boundary rendered as ``line_sep + line_sep`` would otherwise read as
    a phantom empty line); blank paragraphs are likewise dropped. A
    NULL/empty page emits zero totals and passes all four rules (0 <= 0).

    The reference's repetition surface is whole-column duplicate
    detection (`/root/reference/dimensions/completeness/c3.py`); this is
    the within-document web-curation analogue its rule registry implies.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = _nonblank(F.split(text, line_sep))
    paras = _nonblank(F.split(text, para_sep))

    n_l = F.size(lines).cast("long")
    d_l = (F.size(lines) - F.size(F.array_distinct(lines))).cast("long")
    c_l = _char_sum(lines)
    dc_l = c_l - _char_sum(F.array_distinct(lines))
    n_p = F.size(paras).cast("long")
    d_p = (F.size(paras) - F.size(F.array_distinct(paras))).cast("long")
    c_p = _char_sum(paras)
    dc_p = c_p - _char_sum(F.array_distinct(paras))

    def _pass(dup: Column, total: Column, frac: tuple[int, int]) -> Column:
        num, den = frac
        return dup * F.lit(den) <= total * F.lit(num)

    return df.select(
        F.col(id_col),
        n_l.alias("total_lines"),
        d_l.alias("dup_lines"),
        c_l.alias("line_chars"),
        dc_l.alias("dup_line_chars"),
        n_p.alias("total_paras"),
        d_p.alias("dup_paras"),
        c_p.alias("para_chars"),
        dc_p.alias("dup_para_chars"),
        _pass(d_l, n_l, max_dup_line_frac).alias("r_dup_line"),
        _pass(d_p, n_p, max_dup_para_frac).alias("r_dup_para"),
        _pass(dc_l, c_l, max_dup_line_char_frac).alias("r_dup_line_chars"),
        _pass(dc_p, c_p, max_dup_para_char_frac).alias("r_dup_para_chars"),
    )


def dedup_lines_within_doc(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Within-document duplicate-line removal, keep-first — the TRIM
    counterpart of Gopher's repetition REJECTION (`gopher_repetition_stats`
    flags the page; this salvages it, the policy line-level curation
    pipelines apply to navigation/boilerplate repeats inside one page) and
    the within-page analogue of `operators/dedup.dedup_paragraphs`' cross-
    corpus first-occurrence winner.

    Every later occurrence of an already-seen line value is dropped and the
    page is rebuilt in original order — BYTE-EXACT contract. A blank line
    is a line value like any other: the first blank survives, later blanks
    are dropped (so runs of paragraph breaks collapse after the first —
    pinned in tests as the documented policy).

    Scale shape: ZERO shuffle — one narrow projection; the keep-first
    semantics ride Spark's `array_distinct`, whose first-occurrence output
    order this operator deliberately relies on (pinned by a dedicated
    order test AND by the byte-exact oracle, whose DuckDB side derives the
    same text with an order-EXPLICIT row_number window — any future change
    to array_distinct's order breaks both immediately).
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(text, sep)
    kept = F.array_distinct(lines)
    return df.select(
        F.col(id_col),
        F.array_join(kept, sep).alias("trim_text"),
        F.size(lines).cast("long").alias("total_lines"),
        (F.size(lines) - F.size(kept)).cast("long").alias("removed_lines"))


def attribute_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    lexicon: list[str] | None = None,
) -> DataFrame:
    """Paragraph-level attribute spans — the Dolma attributes pattern
    (Soldaini et al. 2024: quality/toxicity signals stored as
    (start, end, score) spans over the raw text, so downstream consumers
    can mask or drop spans without re-running the tagger). Per document,
    one row per ``sep``-separated paragraph with its exact character
    offsets into the ORIGINAL text ([start, end) — verifiable by
    ``substring``), its word count, and its lexicon hit count
    (`functions/text.lexicon_hits` semantics).

    Offsets are computed by ONE linear fold per row (an ``aggregate``
    with a struct accumulator carrying (cursor, spans)) — deliberately
    NOT the transform-with-index + slice prefix-sum form, whose
    re-inlined subexpressions are the measured blowup that moved the
    winnowing operator to an Arrow UDF. The fold is O(paragraphs), the
    tree is O(1), and the whole operator is a zero-shuffle projection +
    one Generate (posexplode) — no UDF, int64 everywhere.
    """
    from dataquality_spark.functions.text import lexicon_hits

    lex = lexicon if lexicon is not None else []
    text = F.coalesce(F.col(text_col), F.lit(""))
    paras = F.split(text, sep)
    sep_len = len(sep)
    init = F.struct(
        F.lit(0).cast("long").alias("pos"),
        F.array().cast("array<struct<start: bigint, end: bigint>>")
        .alias("spans"))
    folded = F.aggregate(
        paras, init,
        lambda acc, p: F.struct(
            (acc["pos"] + F.length(p) + sep_len).alias("pos"),
            F.concat(
                acc["spans"],
                F.array(F.struct(acc["pos"].alias("start"),
                                 (acc["pos"] + F.length(p)).alias("end")))
            ).alias("spans")))
    scored = F.zip_with(
        folded["spans"], paras,
        lambda s, p: F.struct(
            s["start"].alias("start"), s["end"].alias("end"),
            F.size(F.filter(F.split(p, " "), lambda w: w != F.lit("")))
            .cast("long").alias("n_words"),
            (lexicon_hits(p, lex) if lex else F.lit(0)).cast("long")
            .alias("hits")))
    return (df.select(F.col(id_col), F.posexplode(scored))
            .select(id_col, F.col("pos").cast("long").alias("para_idx"),
                    "col.start", "col.end", "col.n_words", "col.hits"))
