"""Deterministic synthesis of the ``pages`` table from ``documents``.

Implements FIXTURES.md §B: wrap each documents.text row in one of k=6
boilerplate HTML templates chosen by ``doc_id % 6``. Everything is a pure
function of (doc_id, text, lang, source) — no RNG (the analog of the
reference's ``seed_everything(42)`` determinism discipline,
reference src/octopy/train.py:56-60) — so the pages table is identical
no matter where or how many times it is built.

Output shape per BASELINE.json.input_hint:
    pages(url string, warc_ts timestamp, html binary, text string, lang string)
where ``text`` is the golden extraction — defined as the output of
:func:`octospark.extractor.extract` on ``html`` (byte-identical target).

No Spark dependency here; :mod:`octospark.sources` wraps this for
DataFrame use.
"""

from __future__ import annotations

import datetime as _dt

from octospark.extractor import extract

N_TEMPLATES = 6

_EPOCH = _dt.datetime(2026, 1, 1, 0, 0, 0)

_NAV = (
    '<nav class="top"><ul>'
    '<li><a href="/">Home</a></li><li><a href="/news">News</a></li>'
    '<li><a href="/about">About us</a></li><li><a href="/contact">Contact</a></li>'
    '<li><a href="/login">Log in</a></li><li><a href="/signup">Sign up</a></li>'
    "</ul></nav>"
)
_HEADER = (
    "<header><h1>Example Site {src}</h1>"
    '<p>Your trusted source for <a href="/topics">topics</a> since 2001.</p>'
    "</header>"
)
_FOOTER = (
    "<footer><p>Copyright 2026 Example Site {src}. All rights reserved. "
    '<a href="/privacy">Privacy</a> <a href="/terms">Terms</a> '
    '<a href="/sitemap">Sitemap</a></p></footer>'
)
_SIDEBAR = (
    '<aside class="ads"><div class="ad">Buy one get one free! '
    '<a href="/deal1">Shop now</a></div>'
    '<div class="ad">Hot singles in your area. <a href="/deal2">Click here</a></div>'
    '<div class="ad">Lose weight fast with this one trick. '
    '<a href="/deal3">Learn more</a></div></aside>'
)
_LINKFARM = (
    '<div class="related"><a href="/r1">Related story one</a> '
    '<a href="/r2">Related story two</a> <a href="/r3">Related story three</a> '
    '<a href="/r4">Related story four</a> <a href="/r5">Related story five</a></div>'
)
_COMMENTS = (
    '<section class="comments"><h4>Comments</h4>'
    '<div class="comment">First!</div>'
    '<div class="comment">Nice post.</div>'
    '<div class="comment">I disagree with this take.</div></section>'
)
_TABLE = (
    "<table><tr><th>Key</th><th>Value</th></tr>"
    "<tr><td>Views</td><td>{views}</td></tr>"
    "<tr><td>Shares</td><td>{shares}</td></tr></table>"
)


def _sentences(text: str, doc_id: int) -> list:
    """Split document text into paragraph chunks deterministically.

    The synthetic corpus has no sentence punctuation, so chunk on word
    count: chunk size cycles 12/18/25 words keyed by doc_id."""
    words = text.split()
    if not words:
        return []
    size = (12, 18, 25)[doc_id % 3]
    return [" ".join(words[i : i + size]) for i in range(0, len(words), size)]


def _main_paragraphs(text: str, doc_id: int) -> str:
    paras = _sentences(text, doc_id) or [""]
    return "".join(f"<p>{p}</p>" for p in paras)


def build_html(doc_id: int, text: str, source: str) -> bytes:
    """Pure function (doc_id, text, source) -> page html bytes (UTF-8)."""
    t = doc_id % N_TEMPLATES
    main = _main_paragraphs(text, doc_id)
    header = _HEADER.format(src=source)
    footer = _FOOTER.format(src=source)
    table = _TABLE.format(views=doc_id * 7 % 1000, shares=doc_id * 3 % 100)
    title = f"Doc {doc_id} - Example Site {source}"
    head = f"<head><title>{title}</title><style>body{{margin:0}}</style></head>"
    if t == 0:  # plain article
        body = f"{_NAV}{header}<main><article><h2>Document {doc_id}</h2>{main}</article></main>{footer}"
    elif t == 1:  # sidebar ads + link farm
        body = f"{_NAV}{header}<div class='wrap'>{_SIDEBAR}<main><h2>Document {doc_id}</h2>{main}{_LINKFARM}</main></div>{footer}"
    elif t == 2:  # deeply nested divs
        body = (
            f"{_NAV}{header}<div><div><div><div class='deep'>"
            f"<h2>Document {doc_id}</h2>{main}</div></div></div></div>{footer}"
        )
    elif t == 3:  # comments after content
        body = f"{header}<main><h2>Document {doc_id}</h2>{main}</main>{_COMMENTS}{footer}"
    elif t == 4:  # table + content interleaved
        body = f"{_NAV}{header}<main><h2>Document {doc_id}</h2>{table}{main}</main>{_LINKFARM}{footer}"
    else:  # t == 5: content split across sibling divs, script noise
        half = len(main) // 2
        cut = main.find("</p>", half)
        cut = cut + 4 if cut != -1 else len(main)
        body = (
            f"{_NAV}{header}<script>var x = 'not content';</script>"
            f"<div class='a'><h2>Document {doc_id}</h2>{main[:cut]}</div>"
            f"<div class='b'>{main[cut:]}</div>{footer}"
        )
    page = f"<!DOCTYPE html><html>{head}<body>{body}</body></html>"
    return page.encode("utf-8")


def build_url(doc_id: int, source: str) -> str:
    return f"https://{source}.example.org/doc/{doc_id}"


def build_warc_ts(doc_id: int) -> _dt.datetime:
    # bounded to one year so arbitrarily large doc_ids (bench replicas)
    # stay within pandas' ns-timestamp range
    return _EPOCH + _dt.timedelta(minutes=doc_id % 525_600)


def build_page(doc_id: int, text: str, lang: str, source: str) -> dict:
    """One pages row; golden ``text`` = reference extraction of the html."""
    html = build_html(doc_id, text, source)
    return {
        "url": build_url(doc_id, source),
        "warc_ts": build_warc_ts(doc_id),
        "html": html,
        "text": extract(html)["text"],
        "lang": lang,
    }
