"""Pure-Python reference extractor — the golden-defining oracle.

This module has NO Spark dependency. It defines the exact semantics of
main-content extraction; the Spark pipeline (:mod:`octospark.pipeline`)
imports these same functions inside its Arrow-batched UDFs, so
"byte-identical extracted text per url" holds by construction at any
parallelism (the north-rule invariant, BASELINE.json).

Structure mirrors the reference's two-stage flow (jahtz/octopy):

- :func:`segment_blocks`  — stage 1: html -> ordered Block list with
  shallow text features (analog of ``SegmentationTaskModel.predict``,
  reference src/octopy/segment.py:70,179 + feature precompute
  src/octopy/plugins/kraken_polygonizer.py:64-70).
- :func:`classify_blocks` — stage 2: Boilerpipe-style shallow-feature
  rules over (prev, curr, next) blocks with a never-drop fallback
  (analog of polygonization + ``_calculate_fallback``,
  reference src/octopy/plugins/kraken_polygonizer.py:28-35,109-122).
- :func:`merge_spans`     — span concatenation with offset bookkeeping
  (analog of ``_segmentation_to_pagexml`` join/sort/serialize,
  reference src/octopy/segment.py:117-157).
- :func:`extract`         — the fused per-page pipeline; pure function
  of (html bytes) with row-level error tolerance (analog of the
  per-document try/except, reference src/octopy/cli/segment.py:137-145).

Determinism rules (SURVEY.md §7.3):
- pure functions of the input bytes; no RNG, no global state;
- unicode decoding is ``errors='replace'`` (deterministic);
- whitespace normalization happens in exactly one place
  (:func:`_norm_ws`); all features are derived from normalized text.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from html import unescape as _unescape  # same fn HTMLParser uses
from html.parser import HTMLParser

# --- vocabulary -----------------------------------------------------------
# Block label vocabulary — the analog of the reference's 27-class region
# mapping (src/octopy/mappings.py:15-48). Unmapped/failed -> 'unknown'.
LABELS = (
    "content",
    "heading",
    "boilerplate-nav",
    "boilerplate-header",
    "boilerplate-footer",
    "advert",
    "table",
    "caption",
    "noise",
    "unknown",
)

#: labels whose blocks contribute to the final extracted text
CONTENT_LABELS = frozenset({"content", "heading"})

#: tags whose subtree text is never emitted
_SKIP_TAGS = frozenset(
    {"script", "style", "noscript", "template", "head", "svg", "iframe",
     "title", "option", "datalist"}
)

#: tags that open/close a block (flush the text accumulator)
_BLOCK_TAGS = frozenset(
    {"p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
     "td", "th", "tr", "table", "thead", "tbody", "pre", "blockquote",
     "article", "section", "main", "aside", "nav", "header", "footer",
     "figure", "figcaption", "dd", "dt", "dl", "form", "body", "html",
     "br", "hr", "fieldset", "address", "details", "summary"}
)

#: ancestor tag -> forced label (checked nearest-ancestor-first)
_ANCESTOR_LABELS = {
    "nav": "boilerplate-nav",
    "header": "boilerplate-header",
    "footer": "boilerplate-footer",
    "aside": "advert",
    "form": "noise",
}

_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
_TABLE_TAGS = frozenset({"table", "td", "th", "tr", "thead", "tbody"})

#: char-class histogram buckets (fixed order, len 8)
HIST_BUCKETS = (
    "alpha", "digit", "space", "punct", "quote", "bracket", "other", "nonascii"
)

_PUNCT = frozenset(".,;:!?-")
_QUOTE = frozenset("\"'`")
_BRACKET = frozenset("()[]{}<>")


@dataclass
class Block:
    """Stage-1 IR: one candidate text block (analog of a BaselineLine,
    reference src/octopy/segment.py:104-114)."""

    block_id: int
    tag_path: str
    depth: int
    text: str          # whitespace-normalized visible text
    n_chars: int
    n_words: int
    n_link_chars: int
    link_density: float
    text_density: float
    char_hist: list    # list[int] of len 8, HIST_BUCKETS order
    label: str = ""    # filled by stage 2
    path_tags: list | None = None  # tag_path pre-split (perf cache)


@dataclass
class Span:
    """Stage-2/merge output: character span into the extracted text."""

    block_id: int
    start: int
    end: int
    label: str


def _norm_ws(s: str) -> str:
    """Collapse all unicode whitespace runs to single spaces and strip.

    The single normalization point: every feature and the final text are
    computed from this form (analog of the downscale->compute->rescale
    discipline, reference src/octopy/plugins/kraken_polygonizer.py:50-62).
    """
    return " ".join(s.split())


def decode_html(html: bytes | str | None) -> str:
    """Deterministic html-bytes decode (errors='replace')."""
    if html is None:
        return ""
    if isinstance(html, str):
        return html
    return html.decode("utf-8", errors="replace")


def char_histogram(text: str) -> list:
    """8-bucket char-class histogram (per-block shared feature, analog of
    the per-page feature precompute, reference
    src/octopy/plugins/kraken_polygonizer.py:64-70)."""
    h = [0] * 8
    for ch in text:
        o = ord(ch)
        if o > 127:
            h[7] += 1
        elif ch.isalpha():
            h[0] += 1
        elif ch.isdigit():
            h[1] += 1
        elif ch == " ":
            h[2] += 1
        elif ch in _PUNCT:
            h[3] += 1
        elif ch in _QUOTE:
            h[4] += 1
        elif ch in _BRACKET:
            h[5] += 1
        else:
            h[6] += 1
    return h


class _BlockParser(HTMLParser):
    """Stdlib-HTMLParser DOM walk that accumulates text into blocks.

    Lenient on malformed nesting by design (FIXTURES.md §C case 4): stray
    end tags pop to the nearest matching open tag; unclosed tags simply
    leave stack residue (depth is a feature, not a correctness anchor).
    """

    def __init__(self, with_hist: bool = True) -> None:
        super().__init__(convert_charrefs=True)
        self.with_hist = with_hist
        self.stack: list = []
        self.open_counts: dict = {}  # tag -> open count (O(1) membership)
        self.skip_depth = 0
        self.link_depth = 0
        self.pieces: list = []       # (raw_text, is_link) for current block
        self.block_has_link = False  # any piece with is_link in pieces
        self.block_stack_snapshot: list = []
        self.blocks: list = []

    # -- block lifecycle ---------------------------------------------------
    def _flush(self) -> None:
        pieces = self.pieces
        if not pieces:
            return
        raw = (
            pieces[0][0] if len(pieces) == 1
            else "".join(p for p, _ in pieces)
        )
        words = raw.split()  # one pass: text = _norm_ws(raw), words, count
        if not words:
            self.pieces = []
            self.block_has_link = False
            return
        text = " ".join(words)
        n_chars = len(text)
        n_words = len(words)
        if self.block_has_link:
            n_link_chars = sum(
                len(_norm_ws(p)) for p, is_link in pieces if is_link
            )
            n_link_chars = min(n_link_chars, n_chars)
        else:  # common case: no <a> in the block — skip the scan
            n_link_chars = 0
        link_density = n_link_chars / n_chars
        # words-per-wrapped-line proxy at 80 cols (Boilerpipe-style density)
        lines = max(1, math.ceil(n_chars / 80))
        text_density = n_words / lines
        path = self.block_stack_snapshot
        self.blocks.append(
            Block(
                block_id=len(self.blocks),
                tag_path="/".join(path),
                depth=len(path),
                text=text,
                n_chars=n_chars,
                n_words=n_words,
                n_link_chars=n_link_chars,
                link_density=link_density,
                text_density=text_density,
                char_hist=char_histogram(text) if self.with_hist else [],
                path_tags=path,
            )
        )
        self.pieces = []
        self.block_has_link = False

    # -- parser callbacks ----------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self.skip_depth += 1
            return
        if tag in _BLOCK_TAGS and self.pieces:
            self._flush()
        if tag == "a":
            self.link_depth += 1
        if tag not in ("br", "hr"):  # void elements don't nest
            self.stack.append(tag)
            oc = self.open_counts
            oc[tag] = oc.get(tag, 0) + 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            if self.skip_depth > 0:
                self.skip_depth -= 1
            return
        if tag in _BLOCK_TAGS and self.pieces:
            self._flush()
        if tag == "a" and self.link_depth > 0:
            self.link_depth -= 1
        # pop to nearest matching open tag (lenient recovery); the
        # open_counts dict makes the membership test O(1) instead of an
        # O(depth) list scan per end tag
        oc = self.open_counts
        if oc.get(tag):
            stack = self.stack
            while stack:
                top = stack.pop()
                oc[top] -= 1
                if top == tag:
                    break

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in ("br", "hr"):
            is_link = self.link_depth > 0
            self.pieces.append((" ", is_link))
            if is_link:
                self.block_has_link = True

    def handle_data(self, data: str) -> None:
        if self.skip_depth > 0 or not data:
            return
        if not self.pieces:
            self.block_stack_snapshot = list(self.stack)
        is_link = self.link_depth > 0
        self.pieces.append((data, is_link))
        if is_link:
            self.block_has_link = True


# --- fast tokenizer --------------------------------------------------------
# Drives the SAME _BlockParser handler methods as the stdlib HTMLParser
# but with a single lean scan (~2-3x faster: the stdlib machinery —
# attribute materialization, updatepos, charref splitting — dominates
# the profile and none of it feeds our features). Tag-boundary decisions
# reuse html.parser's OWN compiled tolerant regexes, so the tokenization
# is behavior-identical by construction; equivalence with the stdlib
# walk is additionally enforced block-for-block in
# tests/test_extractor.py over every fixture, every sf0.001 page, and
# thousands of byte-level mutations.

try:  # CPython html.parser module-level regexes (3.8-3.12 stable names)
    from html.parser import attrfind_tolerant as _ATTRFIND
    from html.parser import endtagfind as _ENDTAGFIND
    from html.parser import locatestarttagend_tolerant as _LOCATE_START
    from html.parser import tagfind_tolerant as _TAGFIND

    _HAVE_TOLERANT = True
except ImportError:  # pragma: no cover — fall back to stdlib engine
    _HAVE_TOLERANT = False

_CDATA_STRICT = {
    "script": re.compile(r"</\s*script\s*>", re.IGNORECASE),
    "style": re.compile(r"</\s*style\s*>", re.IGNORECASE),
}
# Conservative well-formed start tag (the hot path): simple name, simple
# attrs (no '<'/'>'/stray quotes inside), optional '/>' suffix. By
# construction every match is tokenized identically by the stdlib
# tolerant machinery (incl. the self-closing rule: a bare value eats a
# trailing '/', so only a detached '/' marks '/>'); anything else falls
# back to the tolerant path below.
_SIMPLE_START = re.compile(
    r"<([a-zA-Z][-a-zA-Z0-9:_.]*)"
    r"((?:\s+[^\s/>=\"'<]+"
    r"(?:\s*=\s*(?:\"[^\"<>]*\"|'[^'<>]*'|[^\s>\"'`=<]+))?)*)"
    r"\s*(/?)>"
)
_MARKED_CLOSE = re.compile(r"]\s*]\s*>")   # standard  ]]>
_MS_MARKED_CLOSE = re.compile(r"]\s*>")    # MS Office ]>  (if/else/endif)
_MARKED_STD = frozenset({"temp", "cdata", "ignore", "include", "rcdata"})
_MARKED_MS = frozenset({"if", "else", "endif"})
# check_for_whole_start_tag's incomplete-at-boundary character class
_INCOMPLETE_NEXT = frozenset(
    "abcdefghijklmnopqrstuvwxyz=/ABCDEFGHIJKLMNOPQRSTUVWXYZ"
)


def _recover(text: str, p: _BlockParser, lt: int) -> int:
    """stdlib goahead() end-of-input recovery for an incomplete
    construct at ``lt``: emit through the next '>' (inclusive) or up to
    the next '<', unescaped, else just '<'; return the resume index."""
    j = text.find(">", lt + 1)
    if j >= 0:
        chunk = text[lt : j + 1]
    else:
        j2 = text.find("<", lt + 1)
        if j2 >= 0:
            chunk = text[lt:j2]
            j = j2 - 1
        else:
            p.handle_data("<")
            return lt + 1
    p.handle_data(_unescape(chunk) if "&" in chunk else chunk)
    return j + 1


def _fast_walk(text: str, p: _BlockParser) -> None:
    """Tokenize ``text`` and drive the handler callbacks of ``p``,
    mirroring stdlib HTMLParser(convert_charrefs=True) semantics for
    everything our handler observes: charrefs decoded in data; CDATA
    content mode for script/style (tags inside are NOT parsed, and only
    a strict ``</script>`` leaves the mode); '/>'-suffixed tags routed
    to handle_startendtag; broken start tags emitted raw; bogus end
    tags consumed as comments; incomplete constructs recovered via
    :func:`_recover`; stray '<' emitted as data."""
    i, n = 0, len(text)
    find = text.find
    while i < n:
        lt = find("<", i)
        if lt < 0:
            chunk = text[i:]
            p.handle_data(_unescape(chunk) if "&" in chunk else chunk)
            break
        if lt > i:
            chunk = text[i:lt]
            p.handle_data(_unescape(chunk) if "&" in chunk else chunk)
        nxt = text[lt + 1] if lt + 1 < n else ""
        if nxt == "/":
            gt = find(">", lt + 1)
            if gt < 0:  # no '>' anywhere: incomplete endtag
                i = _recover(text, p, lt)
                continue
            # fast path: plain '</name>' (name all ascii letters) —
            # exactly what _ENDTAGFIND accepts with no whitespace, so
            # behavior-identical by construction; skips a regex match
            # on the overwhelmingly common case
            name = text[lt + 2 : gt]
            if name.isascii() and name.isalpha():
                p.handle_endtag(name.lower())
                i = gt + 1
                continue
            m = _ENDTAGFIND.match(text, lt)  # strict '</ name >'
            if m:
                p.handle_endtag(m.group(1).lower())
                i = m.end()
                continue
            nm = _TAGFIND.match(text, lt + 2)  # tolerant name at i+2
            if nm:
                p.handle_endtag(nm.group(1).lower())
                i = find(">", nm.end()) + 1  # exists: gt >= name end
                continue
            if text.startswith("</>", lt):
                i = lt + 3
                continue
            i = gt + 1  # bogus comment: silent consume to '>'
            continue
        elif "a" <= nxt <= "z" or "A" <= nxt <= "Z":
            ms = _SIMPLE_START.match(text, lt)
            if ms:
                tag = ms.group(1).lower()
                selfclose = ms.group(3) == "/"
                endpos = ms.end()
            else:  # weird tag: stdlib tolerant machinery, verbatim
                m = _LOCATE_START.match(text, lt)
                j = m.end()
                nc = text[j : j + 1]
                if nc == ">":
                    endpos = j + 1
                elif nc == "/" and text.startswith("/>", j):
                    endpos = j + 2
                elif nc == "" or nc in _INCOMPLETE_NEXT:
                    i = _recover(text, p, lt)  # incomplete at input end
                    continue
                else:  # broken start tag: raw data through attr region
                    p.handle_data(text[lt:j])
                    i = j
                    continue
                # faithful parse_starttag: walk attrs, then classify the
                # tail — '>' start, '/>' startend, else raw data
                nm = _TAGFIND.match(text, lt + 1)
                tag = nm.group(1).lower()
                k = nm.end()
                while k < endpos:
                    am = _ATTRFIND.match(text, k)
                    if not am:
                        break
                    k = am.end()
                tail = text[k:endpos].strip()
                if tail == ">":
                    selfclose = False
                elif tail == "/>":
                    selfclose = True
                else:
                    p.handle_data(text[lt:endpos])
                    i = endpos
                    continue
            i = endpos
            if selfclose:
                p.handle_startendtag(tag, None)
                continue
            p.handle_starttag(tag, None)
            cd = _CDATA_STRICT.get(tag)
            if cd is not None:  # content mode: no tag parsing inside
                mc = cd.search(text, i)
                if mc is None:
                    break  # never strictly closed: rest is raw data
                i = mc.start()  # strict close: _ENDTAGFIND consumes it
            continue
        elif nxt == "!":
            if text.startswith("<!--", lt):
                j = find("-->", lt + 4)
                if j >= 0:
                    i = j + 3
                    continue
                i = _recover(text, p, lt)
                continue
            if text.startswith("<![", lt):
                # stdlib _scan_name's declname token
                sect = re.match(r"[a-zA-Z][-_.a-zA-Z0-9]*",
                                text[lt + 3 : lt + 20])
                name = sect.group(0).lower() if sect else ""
                if name in _MARKED_STD:
                    mc = _MARKED_CLOSE.search(text, lt + 3)
                elif name in _MARKED_MS:
                    mc = _MS_MARKED_CLOSE.search(text, lt + 3)
                else:
                    raise ValueError("unknown marked section")  # = stdlib
                if mc is None:
                    i = _recover(text, p, lt)
                    continue
                i = mc.end()
                continue
            j = find(">", lt + 2)
            if j >= 0:  # doctype / bogus comment: silent
                i = j + 1
                continue
            i = _recover(text, p, lt)
            continue
        elif nxt == "?":
            j = find(">", lt + 2)
            if j >= 0:
                i = j + 1
                continue
            i = _recover(text, p, lt)
            continue
        # lone/stray '<': data (tolerant mode)
        p.handle_data("<")
        i = lt + 1


def segment_blocks(
    html: bytes | str | None, with_hist: bool = True, engine: str | None = None
) -> list:
    """Stage 1: html -> ordered list[Block] in DOM order.

    Pure function of the input bytes; DOM order is preserved (reading
    order, analog of reference src/octopy/segment.py:149-156).
    ``with_hist=False`` skips the char-class histogram (~20% of parse
    cost) — used by the fused extraction path, where the classifier
    never reads it. ``engine='fast'`` (default) uses the lean regex
    tokenizer; ``'stdlib'`` uses html.parser.HTMLParser — both drive the
    same handler and are tested block-identical.
    """
    if engine is None:
        engine = "fast" if _HAVE_TOLERANT else "stdlib"
    text = decode_html(html)
    parser = _BlockParser(with_hist=with_hist)
    try:
        if engine == "fast":
            _fast_walk(text, parser)
        else:
            parser.feed(text)
            parser.close()
    except Exception:
        # parser blow-up: salvage whatever blocks were produced
        pass
    parser._flush()
    return parser.blocks


# --- stage 2: classification ----------------------------------------------

# Boilerpipe NumWordsRulesClassifier thresholds (public knowledge:
# boilerpipe's NumWordsRulesClassifier; also SNIPPETS.md). All comparisons
# are on exact float64 values derived identically in the Spark-expression
# variant (octospark.pipeline.classify), so both paths agree bit-for-bit.
_LINK_DENSITY_MAX = 0.333333
_PREV_LINK_DENSITY_HIGH = 0.555555


def classify_block(
    curr: Block, prev: Block | None, next_: Block | None
) -> str:
    """Label one block from its features and its neighbors' features.

    Deterministic rule cascade:
    1. forced ancestor labels (nav/header/footer/aside/form) — the analog
       of the fixed region-class mapping (reference
       src/octopy/mappings.py:15-48);
    2. heading / table / caption tags;
    3. Boilerpipe-style (prev, curr, next) word-count + link-density rules.
    """
    path_tags = curr.path_tags
    if path_tags is None:
        path_tags = curr.tag_path.split("/") if curr.tag_path else []
    for tag in reversed(path_tags):  # nearest ancestor wins
        if tag in _ANCESTOR_LABELS:
            return _ANCESTOR_LABELS[tag]
    last = path_tags[-1] if path_tags else ""
    if last in _HEADING_TAGS:
        return "heading"
    if last == "figcaption":
        return "caption"
    if last in _TABLE_TAGS or any(t in _TABLE_TAGS for t in path_tags):
        # layout-table carve-out (r3): long, low-link prose inside a
        # table is page content rendered through a layout table — let it
        # fall through to the word-count cascade instead of losing it.
        # Short cells / link-heavy rows keep the 'table' label.
        if not (
            curr.n_words > 16 and curr.link_density <= _LINK_DENSITY_MAX
        ):
            return "table"
    if curr.link_density > _LINK_DENSITY_MAX:
        return "boilerplate-nav"
    prev_words = prev.n_words if prev is not None else 0
    prev_ld = prev.link_density if prev is not None else 0.0
    next_words = next_.n_words if next_ is not None else 0
    if prev_ld > _PREV_LINK_DENSITY_HIGH:
        if curr.n_words > 40 or next_words > 17:
            return "content"
        return "noise"
    if curr.n_words > 16 or next_words > 15 or prev_words > 4:
        return "content"
    return "noise"


def classify_blocks(blocks: list) -> list:
    """Stage 2 over the whole page, with the never-drop fallback: a block
    whose classification raises gets label 'unknown' instead of being
    dropped (analog of ``_calculate_fallback``, reference
    src/octopy/plugins/kraken_polygonizer.py:28-35,109-122)."""
    out = []
    n = len(blocks)
    for i, b in enumerate(blocks):
        prev = blocks[i - 1] if i > 0 else None
        next_ = blocks[i + 1] if i + 1 < n else None
        try:
            b.label = classify_block(b, prev, next_)
        except Exception:
            b.label = "unknown"
        out.append(b)
    return out


# --- merge ------------------------------------------------------------------

def merge_spans(blocks: list) -> tuple:
    """Concatenate content-label block texts (DOM order) into the final
    extracted text; return (text, list[Span]) with exact offsets.

    Invariants (FIXTURES.md §D): spans are monotonic, non-overlapping,
    within [0, len(text)]; ``"\\n".join`` slices reproduce text exactly.
    Offsets are clamped >= 0 (analog of the output coordinate clamp,
    reference src/octopy/segment.py:83-84).
    """
    parts: list = []
    spans: list = []
    pos = 0
    for b in blocks:
        if b.label not in CONTENT_LABELS:
            continue
        if parts:
            pos += 1  # the '\n' joiner
        start = max(0, pos)
        end = start + len(b.text)
        parts.append(b.text)
        spans.append(Span(block_id=b.block_id, start=start, end=end, label=b.label))
        pos = end
    return "\n".join(parts), spans


def extract(html: bytes | str | None) -> dict:
    """Fused per-page pipeline: html -> {text, spans, n_blocks, error}.

    Never raises — any failure yields text='' with the error recorded
    (row-level error tolerance, analog of the per-document try/except in
    reference src/octopy/cli/segment.py:137-145). Every input page yields
    exactly one output row (never-drop law)."""
    try:
        blocks = classify_blocks(segment_blocks(html, with_hist=False))
        text, spans = merge_spans(blocks)
        return {
            "text": text,
            "spans": [
                {"block_id": s.block_id, "start": s.start, "end": s.end,
                 "label": s.label}
                for s in spans
            ],
            "n_blocks": len(blocks),
            "error": None,
        }
    except Exception as exc:  # pragma: no cover — defensive outer guard
        return {"text": "", "spans": [], "n_blocks": 0,
                "error": f"{type(exc).__name__}: {exc}"}
