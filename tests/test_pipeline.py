"""Spark pipeline tests: byte-identity (the north-rule gate), staged vs
fused equivalence, partitioning invariance, never-drop law, size guard,
skew plumbing. FIXTURES.md §D."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from octospark.pipeline import (
    classify,
    extract_pages,
    find_skewed_hosts,
    merge,
    salted_repartition,
    segment,
    split_size_guard,
)
from tests.fixtures.adversarial import CASES


def _mismatches(pages, extracted):
    j = pages.select("url", F.col("text").alias("golden")).join(
        extracted.select("url", "text"), "url"
    )
    return j.filter(~F.col("golden").eqNullSafe(F.col("text"))).count()


def test_fused_byte_identity(spark, pages):
    ext = extract_pages(pages)
    assert ext.count() == pages.count()
    assert _mismatches(pages, ext) == 0


def test_staged_equals_fused_and_golden(spark, pages):
    staged = merge(classify(segment(pages)), pages)
    assert _mismatches(pages, staged) == 0


@pytest.mark.parametrize("n", [1, 4, 32])
def test_partitioning_invariance(spark, pages, n):
    ext = extract_pages(pages.repartition(n)).select("url", "text")
    assert _mismatches(pages, ext) == 0


def test_never_drop_every_url_once(spark, pages):
    ext = extract_pages(pages)
    assert ext.groupBy("url").count().filter("count != 1").count() == 0
    assert ext.count() == pages.count()


def test_adversarial_pages_through_spark(spark):
    import json
    import pathlib

    golden = json.loads(
        (pathlib.Path(__file__).parent / "fixtures/golden.json").read_text()
    )
    rows = [(name, html) for name, html in CASES]
    df = spark.createDataFrame(rows, "url string, html binary").select(
        "url",
        F.lit(None).cast("timestamp").alias("warc_ts"),
        "html",
        F.lit(None).cast("string").alias("text"),
        F.lit("en").alias("lang"),
    )
    out = {
        r["url"]: r["text"]
        for r in extract_pages(df).select("url", "text").collect()
    }
    assert len(out) == len(CASES)
    for name, _ in CASES:
        assert out[name] == golden[name]["text"], name


def test_size_guard_filters_but_never_drops(spark, pages):
    # tiny cap so a real fraction of pages trips the guard
    ext = extract_pages(pages, max_bytes=1100)
    assert ext.count() == pages.count()
    guarded = ext.filter(F.col("error") == "size_guard")
    assert guarded.count() > 0
    assert guarded.filter(F.length("text") > 0).count() == 0
    ok, oversized = split_size_guard(pages, max_bytes=1100)
    assert ok.count() + oversized.count() == pages.count()


def test_null_html_goes_to_guard_branch(spark):
    df = spark.createDataFrame(
        [("u1", None), ("u2", b"<p>twenty words of content padding the block "
                              b"so it is long enough to clear the threshold "
                              b"rule set</p>")],
        "url string, html binary",
    ).select(
        "url", F.lit(None).cast("timestamp").alias("warc_ts"), "html",
        F.lit(None).cast("string").alias("text"), F.lit("en").alias("lang"),
    )
    ext = extract_pages(df)
    rows = {r["url"]: r for r in ext.collect()}
    assert rows["u1"]["error"] == "size_guard" and rows["u1"]["text"] == ""
    assert rows["u2"]["text"] != ""


def test_span_laws_on_dataframe(spark, pages):
    ext = extract_pages(pages).select("url", "text", "spans")
    checked = ext.select(
        "url",
        F.forall(
            "spans",
            lambda s: (s["start"] >= 0)
            & (s["start"] <= s["end"])
            & (s["end"] <= F.length("text")),
        ).alias("bounds_ok"),
        # reconstruct text from span slices (substring is 1-indexed)
        F.aggregate(
            "spans",
            F.lit(""),
            lambda acc, s: F.concat(
                acc,
                F.when(F.length(acc) > 0, F.lit("\n")).otherwise(F.lit("")),
                F.expr("text").substr(
                    s["start"].cast("int") + 1, (s["end"] - s["start"]).cast("int")
                ),
            ),
        ).alias("rebuilt"),
    )
    assert checked.filter(~F.col("bounds_ok")).count() == 0
    bad = ext.join(checked, "url").filter(F.col("rebuilt") != F.col("text"))
    assert bad.count() == 0


def test_skewed_host_branch_spreads_giant_host(spark, pages):
    """E2E skew drill (VERDICT r3 #6): a giant host holding ~30% of all
    pages as replicas of ONE url (a re-crawl dump, the worst real crawl
    skew). Uniform url-hash repartitioning funnels every replica into a
    single partition (straggler = the whole job at 100 TB); the
    detect-then-salt branch must (a) find the host, (b) spread its rows
    so max/median partition size < 2, and (c) leave extraction output
    untouched (same rows, same checksum — placement is load balance,
    not semantics)."""
    import statistics

    base = pages.select("url", "warc_ts", "html", "text", "lang")
    n_base = base.count()
    giant_n = int(n_base * 0.43)  # ~30% of the combined table
    one = base.limit(1)
    giant = one.crossJoin(
        spark.range(giant_n).select(F.col("id").alias("_r"))
    ).select(
        F.lit("https://giant.example.org/hot").alias("url"),
        "warc_ts", "html", "text", "lang",
    )
    allp = base.unionByName(giant)

    hosts = find_skewed_hosts(allp, threshold_fraction=0.05, min_pages=10)
    assert hosts == ["giant.example.org"]

    def part_sizes(df):
        return sorted(
            df.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()
        )

    # branch OFF: url-hash keying puts all giant rows in ONE partition
    off = part_sizes(salted_repartition(allp, num_partitions=16))
    assert max(off) >= giant_n
    assert max(off) / statistics.median(off) > 2

    # branch ON: spread bounded
    on = part_sizes(
        salted_repartition(
            allp, num_partitions=16, skewed_hosts=hosts, salt_buckets=32
        )
    )
    assert sum(on) == n_base + giant_n
    assert max(on) / statistics.median(on) < 2

    # extraction results identical with the branch on (placement only)
    def sig(df):
        r = df.agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("url", "text")).alias("ck"),
        ).collect()[0]
        return (r["n"], r["ck"])

    plain = sig(extract_pages(allp))
    salted = sig(
        extract_pages(
            allp, salted=True, num_partitions=16, skewed_hosts=hosts
        )
    )
    assert plain == salted


def test_salted_repartition_preserves_rows(spark, pages):
    hosts = find_skewed_hosts(pages, threshold_fraction=0.04, min_pages=10)
    assert hosts, "synthetic corpus has 20 hosts of ~25 pages each"
    out = salted_repartition(
        pages, num_partitions=16, skewed_hosts=hosts, salt_buckets=4
    )
    assert out.count() == pages.count()
    assert out.rdd.getNumPartitions() == 16
    # salted extraction still byte-identical
    ext = extract_pages(pages, salted=True, num_partitions=16)
    assert _mismatches(pages, ext) == 0


def test_blocks_schema_and_order(spark, pages):
    blocks = segment(pages.limit(20))
    w_ok = blocks.groupBy("url").agg(
        F.count("*").alias("n"),
        F.max("block_id").alias("max_id"),
        F.countDistinct("block_id").alias("d"),
    )
    # block_id is 0..n-1 per url (DOM order, dense)
    assert w_ok.filter(
        (F.col("max_id") != F.col("n") - 1) | (F.col("d") != F.col("n"))
    ).count() == 0
