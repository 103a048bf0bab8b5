"""Deterministic WARC/1.0 synthesis (the container format of the
Common-Crawl-style corpus named by BASELINE.json.north_rule).

Every record is its own gzip member and files are plain member
concatenations — the Common Crawl convention, which makes a .warc.gz
streamable record-by-record but NOT splittable mid-file, so at corpus
scale parallelism comes from the file count (a real crawl ships tens of
thousands of ~1 GB files per snapshot), not from byte-range splits.

Synthesis is a pure function of (doc_id, text, lang, source) rows —
same determinism law as :mod:`octospark.htmlgen` (the analog of the
reference's ``seed_everything(42)`` discipline, reference
src/octopy/train.py:56-60): fixed gzip mtime, record IDs derived from
the url, so staged files are byte-identical across runs and hosts.

No Spark dependency here; :mod:`octospark.warcops` wraps this for
DataFrame use.
"""

from __future__ import annotations

import gzip
import hashlib

from octospark.htmlgen import build_html, build_url, build_warc_ts

WARC_VERSION = b"WARC/1.0"


def record_id(url: str) -> str:
    """Deterministic RFC-4122-shaped record id from the target url."""
    h = hashlib.md5(url.encode("utf-8")).hexdigest()
    return (
        f"<urn:uuid:{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"
    )


def build_record(doc_id: int, text: str, lang: str, source: str) -> bytes:
    """One uncompressed WARC response record wrapping the page html in
    a full HTTP/1.1 response (header block + payload), exactly the
    layout a crawler captures."""
    url = build_url(doc_id, source)
    html = build_html(doc_id, text, source)
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        + f"Content-Length: {len(html)}\r\n\r\n".encode("ascii")
        + html
    )
    ts = build_warc_ts(doc_id).strftime("%Y-%m-%dT%H:%M:%SZ")
    head = (
        WARC_VERSION + b"\r\n"
        b"WARC-Type: response\r\n"
        + f"WARC-Record-ID: {record_id(url)}\r\n".encode("ascii")
        + f"WARC-Date: {ts}\r\n".encode("ascii")
        + f"WARC-Target-URI: {url}\r\n".encode("ascii")
        + b"Content-Type: application/http; msgtype=response\r\n"
        + f"Content-Length: {len(http)}\r\n".encode("ascii")
        + b"\r\n"
    )
    return head + http + b"\r\n\r\n"


def compress_record(rec: bytes) -> bytes:
    """One gzip member per record, fixed mtime=0 for byte determinism."""
    return gzip.compress(rec, mtime=0)


def build_warc_file(rows: list) -> bytes:
    """Concatenate per-record gzip members: rows are
    (doc_id, text, lang, source) tuples, emitted in given order."""
    return b"".join(
        compress_record(build_record(int(d), t, lg, s))
        for d, t, lg, s in rows
    )
