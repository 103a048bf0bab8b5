"""Deterministic PDF synthesis for the layout-extraction path.

The north-star scope includes "PDF/layout parse" next to HTML
boilerplate strip. No PDF library exists in this environment, so this
module emits a real, minimal, fully self-contained subset of PDF 1.4 —
uncompressed content streams, absolute/relative text positioning
operators (Tm/Td/TD/TL/T*/Tj/TJ/'), a correct xref table — and
:mod:`octospark.pdfextract` parses it back with genuine layout
analysis. The pair plays the same role pdf-wise that
:mod:`octospark.htmlgen` / :mod:`octospark.extractor` play html-wise:
the generator plants the golden text plus per-page boilerplate
(running header, page footer, margin note), and the extractor must
recover the golden text byte-identically by *geometry*, not by magic
(analog of the reference's page-image synthesis role in its fixtures;
segmentation regions analog: /root/reference/src/octopy/segment.py:149-156).

Reconstruction law (the oracle contract, tested in tests/test_pdf.py):
every content line is an exact substring of the source text, and line
breaks consume exactly one U+0020 — so
``" ".join(content_lines) == text`` for arbitrary input, including
multi-space runs (never broken), parens/backslashes (escaped), and
non-ASCII (octal-escaped UTF-8 bytes).
"""

from __future__ import annotations

# --- page geometry (US Letter, points) --------------------------------------
PAGE_W = 612
PAGE_H = 792
CONTENT_X = 72          # left margin of the content column
CONTENT_Y_TOP = 712     # first baseline
LINE_H = 16             # baseline step
LINES_PER_PAGE = 38     # last baseline at 712 - 37*16 = 120
HEADER_Y = 756          # classifier: y >= 740 -> header
FOOTER_Y = 36           # classifier: y <= 60  -> footer
MARGIN_X = 500          # classifier: x >= 400 -> margin note
MARGIN_Y = 400
MAX_LINE_CHARS = 72


def wrap_text(text: str, max_chars: int = MAX_LINE_CHARS) -> list:
    """Split ``text`` into exact-substring lines at single-space breaks.

    A break position i satisfies ``text[i] == ' '`` with non-space
    neighbors, and the break consumes that one space; runs of 2+ spaces
    are never split, so ``" ".join(lines) == text`` for any input. A
    segment with no eligible break within ``max_chars`` extends past the
    limit rather than hard-breaking (a long word stays whole — layout
    overflow, never data corruption).
    """
    n = len(text)
    if n == 0:
        return []
    lines = []
    start = 0
    while start < n:
        if n - start <= max_chars:
            lines.append(text[start:])
            break
        b = -1
        i = min(start + max_chars, n - 2)
        while i > start:  # latest eligible break inside the limit
            if text[i] == " " and text[i - 1] != " " and text[i + 1] != " ":
                b = i
                break
            i -= 1
        if b < 0:  # none inside: first eligible break beyond the limit
            i = start + max_chars + 1
            while i < n - 1:
                if text[i] == " " and text[i - 1] != " " and text[i + 1] != " ":
                    b = i
                    break
                i += 1
        if b < 0:  # no break anywhere: the rest is one line
            lines.append(text[start:])
            break
        lines.append(text[start:b])
        start = b + 1
    return lines


def esc_string(s: str) -> bytes:
    """PDF literal-string escape of the UTF-8 bytes of ``s``:
    ``(``/``)``/``\\`` backslash-escaped, bytes outside 32..126 as
    3-digit octal. Inverse of pdfextract's unescape, byte-exact."""
    out = bytearray()
    for b in s.encode("utf-8"):
        if b in (0x28, 0x29, 0x5C):  # ( ) \
            out.append(0x5C)
            out.append(b)
        elif 32 <= b <= 126:
            out.append(b)
        else:
            out += b"\\%03o" % b
    return bytes(out)


def _show(line: str, idx: int) -> bytes:
    """One show op for a content line, rotating through the operator
    vocabulary so the parser's whole Tj/TJ surface is exercised: every
    3rd line is a TJ array split into two kerned pieces (their
    concatenation IS the line — TJ numbers adjust glyph spacing, never
    inject characters), the rest are plain Tj."""
    if idx % 3 == 2 and len(line) >= 2:
        mid = len(line) // 2
        return (b"[(" + esc_string(line[:mid]) + b") -120 ("
                + esc_string(line[mid:]) + b")] TJ")
    return b"(" + esc_string(line) + b") Tj"


def _content_stream(doc_id: int, source: str, lang: str,
                    page_no: int, n_pages: int, lines: list) -> bytes:
    """Uncompressed content stream for one page: header, content block
    (absolute Tm start, then relative Td / TD / T* / ' line advances),
    margin note, footer."""
    header = f"{source}.example.org — preprint {doc_id}"
    footer = f"page {page_no} of {n_pages}"
    margin = f"DRAFT {lang} rev{doc_id % 7}"
    ops = [
        b"BT",
        b"/F1 9 Tf",
        b"1 0 0 1 %d %d Tm" % (CONTENT_X, HEADER_Y),
        b"(" + esc_string(header) + b") Tj",
        b"ET",
        b"BT",
        b"/F1 10 Tf",
        b"%d TL" % LINE_H,
        b"1 0 0 1 %d %d Tm" % (CONTENT_X, CONTENT_Y_TOP),
    ]
    for i, line in enumerate(lines):
        if i > 0:
            if i % 4 == 0:
                ops.append(b"T*")            # advance by TL
            elif i % 7 == 0:
                ops.append(b"0 -%d TD" % LINE_H)  # Td + sets TL
            else:
                ops.append(b"0 -%d Td" % LINE_H)
        if i % 5 == 4 and i > 0 and i % 3 != 2:
            # quote op: next-line + show fused; replaces the Td above
            ops.pop()
            ops.append(b"(" + esc_string(line) + b") '")
        else:
            ops.append(_show(line, i))
    ops += [
        b"ET",
        b"BT",
        b"/F1 8 Tf",
        b"1 0 0 1 %d %d Tm" % (MARGIN_X, MARGIN_Y),
        b"(" + esc_string(margin) + b") Tj",
        b"ET",
        b"BT",
        b"/F1 8 Tf",
        b"1 0 0 1 %d %d Tm" % (CONTENT_X, FOOTER_Y),
        b"(" + esc_string(footer) + b") Tj",
        b"ET",
    ]
    return b"\n".join(ops) + b"\n"


def build_pdf(doc_id: int, text: str, lang: str, source: str) -> bytes:
    """Deterministic multi-page PDF whose content lines carry ``text``
    under the reconstruction law, plus per-page header/footer/margin
    boilerplate the extractor must strip. Correct xref/trailer (offsets
    computed, not guessed) so the file is a structurally honest PDF,
    not just a stream soup."""
    lines = wrap_text(text)
    pages = [lines[i:i + LINES_PER_PAGE]
             for i in range(0, len(lines), LINES_PER_PAGE)] or [[]]
    n_pages = len(pages)

    # object numbering: 1 catalog, 2 pages tree, 3 font,
    # 4+2i page dict, 5+2i its content stream
    objs: list = [None]  # 1-indexed
    kids = b" ".join(b"%d 0 R" % (4 + 2 * i) for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(b"<< /Type /Pages /Kids [" + kids
                + b"] /Count %d >>" % n_pages)
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for i, page_lines in enumerate(pages):
        stream = _content_stream(doc_id, source, lang, i + 1, n_pages,
                                 page_lines)
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>"
            % (PAGE_W, PAGE_H, 5 + 2 * i)
        )
        objs.append(b"<< /Length %d >>\nstream\n" % len(stream)
                    + stream + b"endstream")

    buf = bytearray(b"%PDF-1.4\n%\xc2\xa5\xc2\xb1\xc3\xab\n")
    offsets = [0]
    for num, body in enumerate(objs[1:], start=1):
        offsets.append(len(buf))
        buf += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    xref_at = len(buf)
    n_objs = len(objs)
    buf += b"xref\n0 %d\n" % n_objs
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += b"%010d 00000 n \n" % off
    buf += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (n_objs, xref_at))
    return bytes(buf)
