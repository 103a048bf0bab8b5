"""Label merge-rule tests (R10 analog: chain following, cycle detection,
None=drop — reference /root/reference/src/octopy/train.py:199-240)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from octospark.labelmap import (
    apply_merges,
    label_stats,
    merge_expr,
    resolve_merges,
)


def test_resolve_chain():
    assert resolve_merges({"a": "b", "b": "c"}) == {"a": "c", "b": "c"}


def test_resolve_drop_target():
    assert resolve_merges({"x": None, "y": "x"}) == {"x": None, "y": None}


def test_resolve_cycle_detected():
    with pytest.raises(ValueError, match="cycle"):
        resolve_merges({"a": "b", "b": "a"})
    with pytest.raises(ValueError, match="cycle"):
        resolve_merges({"a": "a"})


def test_merge_expr_on_dataframe(spark):
    df = spark.createDataFrame(
        [("heading",), ("caption",), ("advert",), ("content",)],
        "label string",
    )
    merges = {"caption": "heading", "advert": None}
    out = {
        r["label"]
        for r in apply_merges(df, merges).collect()
    }
    assert out == {"heading", "content"}
    kept = apply_merges(df, merges, drop=False).collect()
    assert len(kept) == 4  # no-drop mode keeps the None rows


def test_passthrough_unmapped(spark):
    df = spark.createDataFrame([("weird",)], "label string")
    row = df.select(
        merge_expr(F.col("label"), {"caption": "heading"}).alias("m")
    ).collect()[0]
    assert row["m"] == "weird"


def test_label_stats_rollup(spark, pages):
    from octospark.pipeline import classify, segment

    labeled = classify(segment(pages.limit(50)))
    merges = {"boilerplate-header": "boilerplate-nav",
              "boilerplate-footer": "boilerplate-nav"}
    stats = {
        r["canonical"]: r for r in label_stats(labeled, merges).collect()
    }
    assert "boilerplate-header" not in stats
    nav = stats["boilerplate-nav"]
    assert set(nav["source_labels"]) >= {"boilerplate-nav",
                                         "boilerplate-header"}


def test_dedup_latest(spark, pages):
    from octospark.pipeline import dedup_latest

    dup = pages.limit(30).withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 HOUR")
    )
    merged = pages.unionByName(dup)
    out = dedup_latest(merged)
    assert out.count() == pages.count()
    # the kept row is the newer one for duplicated urls
    newest = out.join(dup.select("url", F.col("warc_ts").alias("dup_ts")),
                      "url")
    assert newest.filter(F.col("warc_ts") != F.col("dup_ts")).count() == 0
