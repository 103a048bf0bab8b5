"""WARC container source: generator/parser inverse laws, tolerance,
Spark scan correctness, and end-to-end warc -> extraction parity.

Reference analogs: file source (cli/util.py:52-65), per-document error
tolerance (cli/segment.py:137-145), determinism (train.py:56-60) — all
cited from /root/reference/src/octopy/.
"""

from __future__ import annotations

import duckdb
import gzip
import pytest

from octospark.htmlgen import build_html, build_page, build_url
from octospark.warcgen import build_record, build_warc_file, compress_record
from octospark.warcops import (
    _parse_record,
    parse_warc_file,
    read_warc_pages,
    stage_warc_files,
)

SF = "/root/testdata/sf0.001"


def _doc_rows(limit=None):
    q = f"SELECT doc_id, text, lang, source FROM '{SF}/documents.parquet' ORDER BY doc_id"
    if limit:
        q += f" LIMIT {limit}"
    return duckdb.sql(q).fetchall()


# ---------------------------------------------------------------- pure laws

def test_record_roundtrip_byte_identical_html():
    for d, t, lg, s in _doc_rows(30):
        rec = _parse_record(build_record(int(d), t, lg, s))
        assert rec["url"] == build_url(int(d), s)
        assert rec["rec_type"] == "response"
        assert rec["http_status"] == 200
        # reconstruction law: the payload IS the page html, byte-exact
        assert rec["html"] == build_html(int(d), t, s)


def test_warc_file_members_and_order():
    rows = _doc_rows(20)
    blob = build_warc_file(rows)
    records, errors = parse_warc_file(blob)
    assert errors == []
    assert [r["url"] for r in records] == [
        build_url(int(d), s) for d, _, _, s in rows
    ]


def test_warc_build_is_deterministic():
    rows = _doc_rows(10)
    assert build_warc_file(rows) == build_warc_file(rows)


# ---------------------------------------------------------------- tolerance

def test_truncated_member_keeps_earlier_records():
    rows = _doc_rows(5)
    blob = build_warc_file(rows)
    records, errors = parse_warc_file(blob[:-40])  # cut into last member
    assert len(records) == 4
    assert len(errors) == 1 and "truncated" in errors[0]


def test_garbage_between_members_reports_error():
    rows = _doc_rows(3)
    good = build_warc_file(rows[:2])
    blob = good + b"\x00\xff NOT GZIP" + build_warc_file(rows[2:])
    records, errors = parse_warc_file(blob)
    # members before the corruption survive; the rest of the file aborts
    assert len(records) == 2
    assert len(errors) == 1 and "gzip error" in errors[0]


def test_bad_record_in_good_member_is_skipped_not_fatal():
    rows = _doc_rows(3)
    bad = compress_record(b"NOT A WARC RECORD\r\n\r\n")
    blob = (
        compress_record(build_record(int(rows[0][0]), rows[0][1], rows[0][2], rows[0][3]))
        + bad
        + compress_record(build_record(int(rows[2][0]), rows[2][1], rows[2][2], rows[2][3]))
    )
    records, errors = parse_warc_file(blob)
    assert len(records) == 2  # the record AFTER the bad one is recovered
    assert len(errors) == 1 and "bad record" in errors[0]


def test_parse_never_raises_on_junk():
    for junk in [b"", b"\x1f\x8b", b"\x00" * 64, gzip.compress(b"x")]:
        records, errors = parse_warc_file(junk)
        assert isinstance(records, list) and isinstance(errors, list)


# ---------------------------------------------------------------- Spark scan

@pytest.fixture(scope="module")
def warc_dir():
    return stage_warc_files(SF)


def test_stage_is_idempotent(warc_dir):
    assert stage_warc_files(SF) == warc_dir


def test_scan_recovers_every_page_byte_identical(spark, warc_dir):
    got = {
        r["url"]: bytes(r["html"])
        for r in read_warc_pages(spark, warc_dir).collect()
    }
    rows = _doc_rows()
    assert len(got) == len(rows)
    for d, t, lg, s in rows:
        assert got[build_url(int(d), s)] == build_html(int(d), t, s)


def test_scan_plan_is_one_python_stage_no_shuffle(spark, warc_dir):
    plan = read_warc_pages(spark, warc_dir)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Exchange" not in plan


def test_warc_to_extraction_matches_golden(spark, warc_dir):
    """Full crawl-native path: .warc.gz -> parse -> extract must equal
    the golden text for every url (north-rule byte-identity law)."""
    from pyspark.sql import functions as F

    from octospark.pipeline import extract_pages

    pages = read_warc_pages(spark, warc_dir).select(
        "url", "warc_ts", "html",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )
    extracted = {
        r["url"]: r["text"]
        for r in extract_pages(pages, salted=True, num_partitions=8)
        .select("url", "text").collect()
    }
    golden = {
        p["url"]: p["text"]
        for p in (build_page(int(d), t, lg, s) for d, t, lg, s in _doc_rows())
    }
    assert extracted == golden


def test_warc_ingest_through_lineage_commit(spark, warc_dir, tmp_path):
    """Crawl-native input through the production commit protocol: every
    record lands exactly once with full lineage (jobs/extract.py
    --warc-dir path, exercised at the library level)."""
    from pyspark.sql import functions as F

    from octospark.lineage import read_extracted, read_manifest, run_extract

    pages = (
        read_warc_pages(spark, warc_dir)
        .where(F.col("http_status") == 200)
        .select(
            "url", "warc_ts", "html",
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("string").alias("lang"),
        )
    )
    out = str(tmp_path / "warc_out")
    run_extract(spark, pages, out, n_buckets=16)
    m = read_manifest(out)
    assert sum(b["input_count"] for b in m["buckets"].values()) == 500
    got = read_extracted(spark, out).select("url", "text").collect()
    golden = {
        p["url"]: p["text"]
        for p in (build_page(int(d), t, lg, s) for d, t, lg, s in _doc_rows())
    }
    assert {r["url"]: r["text"] for r in got} == golden
