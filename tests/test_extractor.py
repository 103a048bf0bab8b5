"""Pure-Python extractor tests: frozen goldens + invariant laws
(FIXTURES.md §D) + generated-corpus quality. No Spark here."""

from __future__ import annotations

import json
import pathlib

import duckdb
import pytest

from octospark.extractor import (
    CONTENT_LABELS,
    LABELS,
    classify_blocks,
    extract,
    merge_spans,
    segment_blocks,
)
from octospark.htmlgen import build_html, build_page
from tests.fixtures.adversarial import CASES

GOLDEN = json.loads(
    (pathlib.Path(__file__).parent / "fixtures/golden.json").read_text()
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(limit=None):
    q = f"SELECT doc_id, text, lang, source FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
    if limit:
        q += f" LIMIT {limit}"
    return duckdb.sql(q).fetchall()


# --- frozen golden regression ----------------------------------------------

@pytest.mark.parametrize("name,html", CASES, ids=[c[0] for c in CASES])
def test_golden_frozen(name, html):
    r = extract(html)
    g = GOLDEN[name]
    assert r["text"] == g["text"]
    assert r["spans"] == g["spans"]
    assert r["n_blocks"] == g["n_blocks"]


# --- invariant laws -----------------------------------------------------------

@pytest.mark.parametrize("name,html", CASES, ids=[c[0] for c in CASES])
def test_span_laws(name, html):
    r = extract(html)
    text, spans = r["text"], r["spans"]
    prev_end = -1
    for s in spans:
        assert 0 <= s["start"] <= s["end"] <= len(text)
        assert s["start"] > prev_end  # monotonic, non-overlapping
        prev_end = s["end"]
        assert s["label"] in CONTENT_LABELS
    # concatenating span slices reproduces text exactly
    assert "\n".join(text[s["start"]:s["end"]] for s in spans) == text


@pytest.mark.parametrize("name,html", CASES, ids=[c[0] for c in CASES])
def test_never_raises_and_deterministic(name, html):
    a, b = extract(html), extract(html)
    assert a == b


def test_labels_in_vocabulary():
    for _, html in CASES:
        for blk in classify_blocks(segment_blocks(html)):
            assert blk.label in LABELS


def test_script_style_never_leak():
    r = extract(CASES[8][1])  # script_style_excluded
    assert "not_content" not in r["text"]
    assert "color:red" not in r["text"]


def test_none_and_empty_input():
    assert extract(None)["text"] == ""
    assert extract(b"")["text"] == ""
    assert extract(b"")["error"] is None  # still a valid (empty) row


# --- merge offset math (direct) -----------------------------------------------

def test_merge_offsets_exact():
    blocks = classify_blocks(segment_blocks(CASES[11][1]))  # headings_interleaved
    text, spans = merge_spans(blocks)
    assert len(spans) == 4
    assert spans[0].start == 0
    for a, b in zip(spans, spans[1:]):
        assert b.start == a.end + 1  # exactly one '\n' between spans
        assert text[a.end] == "\n"


# --- generated corpus quality (real classifier assertion, not tautology) -----

def test_generated_corpus_quality():
    rows = _docs()
    assert len(rows) == 500
    recalls = []
    boiler_hits = 0
    for doc_id, dtext, lang, source in rows:
        page = build_page(doc_id, dtext, lang, source)
        got_words = set(page["text"].split())
        orig_words = set(dtext.split())
        recalls.append(len(orig_words & got_words) / max(1, len(orig_words)))
        # boilerplate phrases must not leak into extracted text
        for phrase in ("Copyright 2026", "Sign up", "Shop now", "Privacy",
                       "Related story", "Nice post"):
            if phrase in page["text"]:
                boiler_hits += 1
    assert sum(recalls) / len(recalls) > 0.75
    assert boiler_hits == 0


def test_htmlgen_deterministic():
    d = _docs(limit=5)
    for doc_id, text, lang, source in d:
        assert build_html(doc_id, text, source) == build_html(doc_id, text, source)
        p1, p2 = (build_page(doc_id, text, lang, source) for _ in range(2))
        assert p1 == p2


# --- fast-tokenizer equivalence (engine='fast' vs stdlib HTMLParser) -------

def _block_key(b):
    return (b.block_id, b.tag_path, b.depth, b.text, b.n_chars, b.n_words,
            b.n_link_chars, b.link_density, b.text_density,
            tuple(b.char_hist))


def _engines_agree(html) -> bool:
    from octospark.extractor import segment_blocks

    return [_block_key(b) for b in segment_blocks(html, engine="fast")] == [
        _block_key(b) for b in segment_blocks(html, engine="stdlib")
    ]


@pytest.mark.parametrize("name,html", CASES, ids=[c[0] for c in CASES])
def test_fast_engine_equivalent_on_fixtures(name, html):
    assert _engines_agree(html)


def test_fast_engine_equivalent_on_corpus_and_mutations():
    """Block-identical fast vs stdlib tokenization over generated pages
    plus byte-level mutations (truncations + adversarial injections at
    several positions) — the contract that lets the fast engine be the
    default."""
    rows = duckdb.sql(
        "SELECT doc_id, text, source FROM "
        "'/root/testdata/sf0.001/documents.parquet' LIMIT 60"
    ).fetchall()
    pages = [build_html(*r) for r in rows]
    for h in pages:
        assert _engines_agree(h)
    inject = [
        b"<", b"<<>", b"</", b"<!--oops", b"<p junk='a>b'",
        b"&amp;&bogus;&#65;", b"<br/>", b"<ScRiPt>x<div></sCrIpT>",
        b"<style>p{}<", b"<?php echo ?>", b"<!DOCTYPE junk>", b"<a/>",
        b"</ weird>", b"</>", b"<p a=\"x>y\"", b"<em x='unclosed",
        b"<!--term-->", b"<div/><span>word</span>",
        b"<![CDATA[hidden <p>x</p>]]>", b"<![BAD[z]]>",
        b"<![if !IE]>hidden<![endif]>", b"<![ ", b"</script foo>",
        b"<scriptx>y</scriptx>", b"<vector</p>", b"<p\x00weird>",
        b"<P UPPER>x</P>", b"<a href=x/>", b"<hr />",
        b"<input type='checkbox' checked/>",
    ]
    for h in pages[:12]:
        n = len(h)
        for cut in [3, 17, n // 7, n // 3, n // 2, n - 5, n - 1]:
            assert _engines_agree(h[:cut]), ("trunc", cut)
        for inj in inject:
            for pos in [n // 4, n // 2, 3 * n // 4]:
                assert _engines_agree(h[:pos] + inj + h[pos:]), (inj, pos)


# --- property-based fuzz (hypothesis) ---------------------------------------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HTMLISH = st.text(
        alphabet=st.sampled_from(
            list("<>/!-='\"& abcdefghijklmnopqrstuvwxyzPBR&#;\n\t中\U0001f600")
        ),
        max_size=400,
    )
    _TAGS = st.sampled_from(
        ["<p>", "</p>", "<div>", "</div>", "<a href='/x'>", "</a>",
         "<script>", "</script>", "<br/>", "<nav>", "</nav>", "<!--",
         "-->", "<![CDATA[", "]]>", "&amp;", "&#65;", "word "]
    )
    _PAGE = st.lists(st.one_of(_HTMLISH, _TAGS), max_size=30).map(
        lambda parts: "".join(parts).encode("utf-8")
    )

    @given(_PAGE)
    @settings(max_examples=300, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def test_fuzz_fast_engine_equivalent(html):
        assert _engines_agree(html)

    @given(st.binary(max_size=300))
    @settings(max_examples=200, deadline=None)
    def test_fuzz_extract_total_and_lawful(data):
        """extract() is total on arbitrary bytes and its outputs obey
        the span laws (FIXTURES.md §D)."""
        from octospark.extractor import extract

        r = extract(data)
        assert isinstance(r["text"], str)
        pos = 0
        for s in r["spans"]:
            assert 0 <= s["start"] <= s["end"] <= len(r["text"])
            assert s["start"] >= pos or s["start"] == 0
            pos = s["end"]
        # concatenating span slices reproduces text exactly
        joined = "\n".join(
            r["text"][s["start"]:s["end"]] for s in r["spans"]
        )
        assert joined == r["text"]

except ImportError:  # pragma: no cover — hypothesis absent
    pass


def test_huge_block_at_size_guard_boundary():
    """VERDICT r3 #8: a 10 MB single-block page driven to the size-guard
    boundary. (a) under the default 20 MB guard the block extracts
    exactly (expectation computed analytically — a 10 MB golden.json
    entry would bloat the repo); (b) through the inline per-row guard,
    max_bytes == len(html) still parses (the guard is strictly
    greater-than) while max_bytes == len(html) - 1 yields the
    size_guard error row — never an exception, never a dropped row."""
    import pandas as pd

    from octospark.pipeline import _make_extract_batches

    html = b"<html><body><p>" + b"word " * 2_000_000 + b"</p></body></html>"
    assert len(html) > 10_000_000

    expected = ("word " * 2_000_000).strip()
    r = extract(html)
    assert r["error"] is None
    assert r["n_blocks"] == 1
    assert r["text"] == expected
    assert r["spans"][0]["start"] == 0
    assert r["spans"][0]["end"] == len(expected)

    def run(max_bytes):
        frames = [pd.DataFrame({
            "url": ["u"], "warc_ts": [None], "html": [html], "lang": ["en"],
        })]
        out = pd.concat(list(_make_extract_batches(max_bytes)(iter(frames))))
        return out.iloc[0]

    at = run(len(html))  # == boundary: still parsed (guard is >)
    assert at["error"] is None and at["text"] == expected
    over = run(len(html) - 1)  # just over the guard: error row
    assert over["error"] == "size_guard" and over["text"] == ""


def _mutate(rng, html: bytes) -> bytes:
    """One seeded random byte-mutation: truncation, tag splicing,
    byte flips, invalid-UTF-8 injection, or chunk duplication."""
    kind = rng.randrange(5)
    if not html:
        return b"<p" * rng.randrange(3)
    if kind == 0:  # truncate anywhere (possibly mid-tag / mid-rune)
        return html[: rng.randrange(len(html))]
    if kind == 1:  # splice random tag fragments at random offsets
        frags = [b"<div", b"</p>", b"<![CDATA[", b"<script>", b"</",
                 b"<p class='", b"-->", b"<template>", b"]]>"]
        out = html
        for _ in range(rng.randrange(1, 4)):
            i = rng.randrange(len(out))
            out = out[:i] + rng.choice(frags) + out[i:]
        return out
    if kind == 2:  # flip random bytes
        b = bytearray(html)
        for _ in range(rng.randrange(1, 8)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        return bytes(b)
    if kind == 3:  # inject invalid / truncated UTF-8 sequences
        i = rng.randrange(len(html))
        return html[:i] + bytes(
            rng.choice([[0xFF, 0xFE], [0xE2, 0x82], [0xC0, 0xAF],
                        [0xF8, 0x88, 0x80]])
        ) + html[i:]
    i = rng.randrange(len(html))  # duplicate a chunk
    j = min(len(html), i + rng.randrange(1, 200))
    return html[:i] + html[i:j] + html[i:]


def _fuzz_corpus(n_pages: int = 30, n_mut: int = 8):
    """Seeded mutated pages from the golden generator + the adversarial
    fixture set — (url, html) rows, deterministic across calls."""
    import random

    import duckdb

    from octospark.htmlgen import build_page
    from tests.fixtures.adversarial import CASES

    rng = random.Random(42)
    rows = duckdb.sql(
        "SELECT doc_id, text, lang, source FROM "
        "'/root/testdata/sf0.001/documents.parquet' "
        f"ORDER BY doc_id LIMIT {n_pages}"
    ).fetchall()
    seeds = [build_page(*r)["html"] for r in rows] + [
        h for _, h in CASES
    ]
    out = []
    for si, html in enumerate(seeds):
        for mi in range(n_mut):
            out.append((f"https://fuzz.example/{si}/{mi}",
                        _mutate(rng, html)))
    return out


def test_fuzz_extract_never_throws_and_is_deterministic():
    """Extractor fuzz law (VERDICT r4 #7), library half: seeded random
    byte-mutations of golden + adversarial pages never raise, always
    return the full contract dict, and extract twice -> identical."""
    from octospark.extractor import extract

    corpus = _fuzz_corpus()
    assert len(corpus) >= 400
    for url, html in corpus:
        a = extract(html)
        assert isinstance(a, dict) and isinstance(a.get("text"), str)
        assert "spans" in a
        b = extract(html)
        assert a == b, url


def test_fuzz_extract_pages_never_drops_and_repartition_invariant(
    spark,
):
    """Extractor fuzz law, Spark half: the mutated corpus through
    extract_pages keeps EVERY url exactly once (never-drop) and the
    extracted bytes are identical at 2 vs 8 partitions."""
    import pyspark.sql.functions as F

    from octospark.pipeline import extract_pages

    corpus = _fuzz_corpus(n_pages=15, n_mut=4)
    pages = spark.createDataFrame(
        [(u, None, h, None, None) for u, h in corpus],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string",
    )
    outs = []
    for parts in (2, 8):
        got = (
            extract_pages(pages.repartition(parts))
            .select("url", "text", "error")
            .collect()
        )
        assert len(got) == len(corpus)  # never-drop, no dup
        assert {r.url for r in got} == {u for u, _ in corpus}
        outs.append(sorted((r.url, r.text, r.error) for r in got))
    assert outs[0] == outs[1]
