"""PDF/layout extraction path: generator, parser, layout analysis,
Spark surface. The contract is pdfgen's reconstruction law —
``" ".join(content_lines) == text`` — plus the never-raise law shared
with the html extractor."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from octospark.pdfextract import (
    analyze_layout,
    classify_line,
    extract_pdf,
    parse_runs,
)
from octospark.pdfgen import (
    LINES_PER_PAGE,
    MAX_LINE_CHARS,
    build_pdf,
    esc_string,
    wrap_text,
)


def rt(text: str, doc_id: int = 1) -> dict:
    return extract_pdf(build_pdf(doc_id, text, "en", "src0"))


# --- wrap_text: exact-substring law -----------------------------------------

@pytest.mark.parametrize(
    "text",
    [
        "",
        " ",
        "   ",
        "one",
        "a (b) c \\ d",
        "double  space   runs kept intact",
        "trailing space ",
        " leading space",
        "x" * 500,
        "x" * 500 + " tail",
        "héllo wörld — ünïcode ❄ §",
        "contains endstream keyword and stream and obj",
        "parens ((nested (deep))) and \\escapes\\ everywhere",
        ("word " * 300).strip(),
    ],
)
def test_roundtrip_cases(text):
    assert rt(text)["text"] == text


def test_wrap_never_splits_space_runs():
    text = ("ab " * 40) + "gap  here" + (" cd" * 40)
    lines = wrap_text(text)
    assert " ".join(lines) == text
    assert all("  " not in (a[-1] + b[0])
               for a, b in zip(lines, lines[1:]) if a and b)


def test_wrap_line_lengths_bounded():
    lines = wrap_text(("word " * 500).strip())
    assert all(len(ln) <= MAX_LINE_CHARS for ln in lines)


@settings(max_examples=150, deadline=None)
@given(st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",),  # no lone surrogates (not UTF-8)
    ),
    max_size=400,
))
def test_roundtrip_hypothesis(text):
    # the generator/parser pair must round-trip ARBITRARY unicode,
    # including control chars, parens, backslashes, multi-space runs
    assert rt(text)["text"] == text


@settings(max_examples=50, deadline=None)
@given(st.lists(st.sampled_from(
    ["scan", "filter", "join", "agg", "window", "endstream", "(x)", "a\\b"]
), min_size=0, max_size=600))
def test_roundtrip_wordlists(words):
    text = " ".join(words)
    assert rt(text)["text"] == text


# --- escapes ----------------------------------------------------------------

def test_esc_string_bytes():
    assert esc_string("a(b)c\\") == rb"a\(b\)c\\"
    assert esc_string("\n") == rb"\012"
    assert esc_string("é") == rb"\303\251"


# --- multi-page layout -------------------------------------------------------

def test_multipage_and_boilerplate_stripped():
    text = ("lorem ipsum dolor sit amet " * 200).strip()
    assert len(wrap_text(text)) > LINES_PER_PAGE  # really multi-page
    r = rt(text, doc_id=42)
    assert r["text"] == text
    assert r["n_pages"] >= 2
    # boilerplate present in the parsed runs, absent from the output
    all_txt = " ".join(t for _, _, _, t in
                       parse_runs(build_pdf(42, text, "en", "src0")))
    assert "preprint 42" in all_txt and "page 1 of" in all_txt \
        and "DRAFT en" in all_txt
    assert "preprint" not in r["text"] and "page 1 of" not in r["text"]


def test_block_inventory_invariants():
    text = ("alpha beta gamma delta " * 150).strip()
    pdf = build_pdf(7, text, "de", "src3")
    r = extract_pdf(pdf)
    blocks = r["blocks"]
    n_pages = r["n_pages"]
    by_kind = {}
    for b in blocks:
        by_kind.setdefault(b["kind"], []).append(b)
    # exactly one header, footer, margin per page
    assert len(by_kind["header"]) == n_pages
    assert len(by_kind["footer"]) == n_pages
    assert len(by_kind["margin"]) == n_pages
    # content blocks exist on every page and carry every line in order
    content_lines = [ln for b in blocks if b["kind"] == "content"
                     for ln in b["lines"]]
    assert content_lines == wrap_text(text)


def test_classify_line_bands():
    assert classify_line(72, 756) == "header"
    assert classify_line(72, 36) == "footer"
    assert classify_line(500, 400) == "margin"
    assert classify_line(72, 400) == "content"


def test_analyze_layout_merges_fragments_in_x_order():
    runs = [(0, 200.0, 500.0, "world"), (0, 72.0, 500.0, "hello ")]
    blocks = analyze_layout(runs)
    assert blocks[0]["lines"] == ["hello world"]


# --- never-raise law ---------------------------------------------------------

@pytest.mark.parametrize(
    "data",
    [None, b"", b"not a pdf", b"%PDF-1.4\ngarbage",
     b"stream\n(((((", b"stream\n" + b"\xff" * 64,
     b"stream\n1 2 Td (unterminated"],
)
def test_extract_pdf_never_raises(data):
    r = extract_pdf(data)
    assert set(r) == {"text", "blocks", "n_pages", "error"}
    assert isinstance(r["text"], str)


def test_truncated_pdf_salvages_prefix():
    text = ("salvage me now please " * 100).strip()
    pdf = build_pdf(3, text, "en", "src1")
    r = extract_pdf(pdf[: len(pdf) // 2])
    # a prefix of the pages survives; whatever came out is a prefix
    # of the golden text (never garbage)
    assert text.startswith(r["text"][: len(r["text"]) - 40] or "")


# --- corpus golden sweep -----------------------------------------------------

def test_corpus_roundtrip_sf0001(sf_dir):
    rows = duckdb.sql(
        f"SELECT doc_id, text, lang, source FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    assert rows
    for d, t, lg, s in rows:
        assert extract_pdf(build_pdf(int(d), t, lg, s))["text"] == t


# --- Spark surface -----------------------------------------------------------

def test_extract_pdf_layout_matches_documents(spark, sf_dir):
    from octospark.pdfops import QUERIES

    got = QUERIES["extract_pdf_layout"](spark, sf_dir).toPandas()
    want = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).df()
    g = got.sort_values("doc_id").reset_index(drop=True)
    w = want.sort_values("doc_id").reset_index(drop=True)
    assert len(g) == len(w)
    assert (g["text"] == w["text"]).all()


def test_pdf_layout_blocks_counts(spark, sf_dir):
    from octospark.pdfops import QUERIES

    inv = QUERIES["pdf_layout_blocks"](spark, sf_dir).toPandas()
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    assert len(inv) == n_docs
    # single-page corpus docs: one block per boilerplate kind,
    # content split at most around the margin interleave
    assert (inv["header"] == inv["footer"]).all()
    assert (inv["margin"] == inv["header"]).all()
    assert (inv["content"] >= 1).all()
