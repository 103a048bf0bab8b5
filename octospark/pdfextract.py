"""PDF layout parse + main-content extraction (the PDF twin of
:mod:`octospark.extractor`).

Stage 1 (parse): a tolerant scanner walks every ``stream …
endstream`` content stream in document order — deliberately NOT
trusting the xref table, the same lenient-recovery stance the HTML
extractor takes toward malformed nesting — tokenizes the text-object
operators (Tm/Td/TD/TL/T*/Tj/TJ/') and yields positioned text runs
(page, x, y, text). Stage 2 (layout analysis): runs are grouped into
lines by shared baseline, lines into blocks by baseline gap, and each
line is classified by geometry — running header (top band), page
footer (bottom band), margin note (right column), content — the PDF
analog of the HTML block classifier's ancestor/link-density cascade
(and of the reference's region-class mapping,
/root/reference/src/octopy/mappings.py:15-48). Merge joins content
lines in reading order (page, descending baseline, ascending x) with
single spaces, which by pdfgen's reconstruction law recovers the
source text byte-identically.

Like :func:`octospark.extractor.extract`, :func:`extract_pdf` never
raises — a malformed document yields ``text=''`` with the error
recorded (never-drop law; analog of the per-document try/except in
reference src/octopy/cli/segment.py:137-145).
"""

from __future__ import annotations

import re

from octospark.pdfgen import FOOTER_Y, LINE_H, MARGIN_X

_STREAM_RE = re.compile(rb"stream\r?\n")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)")
_NUM_RE = re.compile(rb"[-+]?(?:\d+\.?\d*|\.\d+)")
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")
_OCTAL_RE = re.compile(rb"\\([0-7]{1,3})")

# geometry classification bands (see pdfgen constants)
_HEADER_MIN_Y = 740.0
_FOOTER_MAX_Y = 60.0
_MARGIN_MIN_X = 400.0
_BLOCK_GAP = 1.5 * LINE_H  # baseline gap that starts a new block

assert FOOTER_Y <= _FOOTER_MAX_Y and MARGIN_X >= _MARGIN_MIN_X


def _unescape(raw: bytes) -> str:
    """Decode a PDF literal-string body: backslash escapes
    (n r t b f ( ) \\), octal byte escapes, and line continuations;
    then UTF-8 (errors='replace'). Exact inverse of pdfgen.esc_string."""
    out = bytearray()
    i, n = 0, len(raw)
    simple = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08,
              0x66: 0x0C, 0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C}
    while i < n:
        b = raw[i]
        if b != 0x5C:
            out.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break  # trailing lone backslash: dropped (spec: ignore)
        nxt = raw[i + 1]
        if nxt in simple:
            out.append(simple[nxt])
            i += 2
        elif 0x30 <= nxt <= 0x37:
            m = _OCTAL_RE.match(raw, i)
            out.append(int(m.group(1), 8) & 0xFF)
            i = m.end()
        elif nxt in (0x0A, 0x0D):  # escaped newline: continuation
            i += 2
            if nxt == 0x0D and i < n and raw[i] == 0x0A:
                i += 1
        else:  # unknown escape: backslash dropped, char kept (spec)
            out.append(nxt)
            i += 2
    return out.decode("utf-8", errors="replace")


def _read_string(data: bytes, i: int) -> tuple:
    """Parse a literal string starting at ``data[i] == '('``; returns
    (decoded_str, index_after). Handles nested parens and escapes."""
    depth = 0
    j = i
    n = len(data)
    body = bytearray()
    while j < n:
        b = data[j]
        if b == 0x5C and j + 1 < n:  # escape: copy verbatim, decode later
            body += data[j:j + 2]
            j += 2
            continue
        if b == 0x28:  # (
            depth += 1
            if depth > 1:
                body.append(b)
        elif b == 0x29:  # )
            depth -= 1
            if depth == 0:
                return _unescape(bytes(body)), j + 1
            body.append(b)
        else:
            body.append(b)
        j += 1
    return _unescape(bytes(body)), n  # unterminated: salvage what we have


def _parse_content(data: bytes, page: int, runs: list) -> None:
    """Tokenize one content stream and append (page, x, y, text) runs.

    Minimal faithful text-object state machine: Tm sets the line origin
    absolutely, Td translates it, TD additionally sets the leading,
    TL sets the leading, T* advances one leading, ' advances then
    shows, Tj shows, TJ shows each string element of its array (the
    numeric elements are glyph-spacing adjustments and contribute no
    characters). Operators outside this set just clear the operand
    stack — unknown constructs never abort the page (lenient law)."""
    x = y = 0.0
    leading = 0.0
    stack: list = []  # numeric operands + pending strings (in order)
    in_array = False
    array_strs: list = []
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        if b in b" \t\r\n\x00\x0c":
            i += 1
            continue
        if b == 0x28:  # string
            s, i = _read_string(data, i)
            if in_array:
                array_strs.append(s)
            else:
                stack.append(s)
            continue
        if b == 0x5B:  # [
            in_array = True
            array_strs = []
            i += 1
            continue
        if b == 0x5D:  # ]
            in_array = False
            stack.append(array_strs)
            i += 1
            continue
        if b == 0x2F:  # name: skip token
            m = re.compile(rb"/[^\s/\[\]()<>]*").match(data, i)
            i = m.end()
            continue
        mnum = _NUM_RE.match(data, i)
        if mnum and not _OP_RE.match(data, i):
            if in_array:
                pass  # kerning adjustment: no characters
            else:
                stack.append(float(mnum.group(0)))
            i = mnum.end()
            continue
        mop = _OP_RE.match(data, i)
        if not mop:
            i += 1  # stray byte: skip (lenient)
            continue
        op = mop.group(0)
        i = mop.end()
        if op == b"Tm" and len(stack) >= 6:
            x, y = float(stack[-2]), float(stack[-1])
        elif op == b"Td" and len(stack) >= 2:
            x += float(stack[-2])
            y += float(stack[-1])
        elif op == b"TD" and len(stack) >= 2:
            leading = -float(stack[-1])
            x += float(stack[-2])
            y += float(stack[-1])
        elif op == b"TL" and stack:
            leading = float(stack[-1])
        elif op == b"T*":
            y -= leading
        elif op == b"BT":
            x = y = 0.0
        elif op == b"Tj" and stack and isinstance(stack[-1], str):
            runs.append((page, x, y, stack[-1]))
        elif op == b"'" and stack and isinstance(stack[-1], str):
            y -= leading
            runs.append((page, x, y, stack[-1]))
        elif op == b"TJ" and stack and isinstance(stack[-1], list):
            txt = "".join(stack[-1])
            if txt:
                runs.append((page, x, y, txt))
        stack = []
    # any dangling state is simply dropped: one broken stream never
    # poisons other pages


def parse_runs(pdf: bytes) -> list:
    """All positioned text runs of a PDF, in document order; one
    content stream = one page (pdfgen layout; a general reader would
    map /Contents refs — document-order streams are the tolerant
    equivalent and survive a broken xref)."""
    runs: list = []
    page = 0
    pos = 0
    while True:
        m = _STREAM_RE.search(pdf, pos)
        if not m:
            break
        # honest boundary: the declared /Length of the enclosing stream
        # dict (a show string may legitimately CONTAIN "endstream");
        # tolerant fallback to the keyword scan when the dict is absent
        # or lies (truncated/corrupt file)
        end = -1
        lm = None
        for lm_ in _LENGTH_RE.finditer(pdf, max(0, m.start() - 256),
                                       m.start()):
            lm = lm_  # last /Length before 'stream'
        if lm is not None:
            cand = m.end() + int(lm.group(1))
            if pdf[cand:cand + 32].lstrip().startswith(b"endstream"):
                end = cand
        if end < 0:
            end = pdf.find(b"endstream", m.end())
        if end < 0:
            end = len(pdf)  # truncated: salvage the tail
        _parse_content(pdf[m.end():end], page, runs)
        page += 1
        pos = end + 9
    return runs


def classify_line(x: float, y: float) -> str:
    """Geometry cascade: top band -> header, bottom band -> footer,
    right column -> margin, else content."""
    if y >= _HEADER_MIN_Y:
        return "header"
    if y <= _FOOTER_MAX_Y:
        return "footer"
    if x >= _MARGIN_MIN_X:
        return "margin"
    return "content"


def analyze_layout(runs: list) -> list:
    """Group runs into lines (shared page+baseline, x order), lines
    into blocks (consecutive baselines within _BLOCK_GAP), classify
    each block by its first line's geometry. Returns blocks as dicts
    {page, kind, x, y_top, lines: [str]} in reading order."""
    by_line: dict = {}
    for page, x, y, txt in runs:
        key = (page, round(y, 3))
        by_line.setdefault(key, []).append((x, txt))
    lines = []
    for (page, y), frags in by_line.items():
        frags.sort(key=lambda t: t[0])
        lines.append((page, -y, frags[0][0],
                      "".join(t for _, t in frags)))
    lines.sort()  # page asc, y desc (stored negated), x asc
    blocks: list = []
    cur = None
    for page, neg_y, x, txt in lines:
        y = -neg_y
        kind = classify_line(x, y)
        if (
            cur is None
            or cur["page"] != page
            or cur["kind"] != kind
            or (cur["_last_y"] - y) > _BLOCK_GAP
        ):
            cur = {"page": page, "kind": kind, "x": x, "y_top": y,
                   "lines": [], "_last_y": y}
            blocks.append(cur)
        cur["lines"].append(txt)
        cur["_last_y"] = y
    for b in blocks:
        del b["_last_y"]
    return blocks


def extract_pdf(pdf: bytes | None) -> dict:
    """Fused PDF pipeline: bytes -> {text, blocks, n_pages, error}.

    ``text`` is the space-joined content lines in reading order —
    byte-identical to the source text for pdfgen documents
    (reconstruction law). Never raises."""
    try:
        if pdf is None:
            return {"text": "", "blocks": [], "n_pages": 0, "error": None}
        runs = parse_runs(bytes(pdf))
        blocks = analyze_layout(runs)
        n_pages = 1 + max((b["page"] for b in blocks), default=-1)
        content: list = []
        for b in blocks:
            if b["kind"] == "content":
                content.extend(b["lines"])
        return {
            "text": " ".join(content),
            "blocks": blocks,
            "n_pages": n_pages,
            "error": None,
        }
    except Exception as exc:  # pragma: no cover — defensive outer guard
        return {"text": "", "blocks": [], "n_pages": 0,
                "error": f"{type(exc).__name__}: {exc}"}
