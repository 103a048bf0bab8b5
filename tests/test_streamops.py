"""Structured Streaming smoke tests: file-source extraction stream with
availableNow drain; rate-source windowed agg. Batch-equivalents of the
window semantics are oracle-checked in octospark.relational."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def pages_dir(spark, pages, tmp_path):
    p = str(tmp_path / "pages_in")
    pages.orderBy("url").limit(100).write.parquet(p)
    return p


def test_stream_extract_matches_batch(spark, pages, pages_dir, tmp_path):
    from octospark.streamops import run_stream_to_parquet

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = run_stream_to_parquet(spark, pages_dir, out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    n = got.count()
    assert n == 100
    # byte-identity also holds on the streaming path (same UDF)
    j = (
        spark.read.parquet(pages_dir)
        .select("url", F.col("text").alias("golden"))
        .join(got.select("url", "text"), "url")
    )
    assert j.filter(F.col("golden") != F.col("text")).count() == 0


def test_stream_resume_processes_only_new_files(spark, pages, pages_dir,
                                                tmp_path):
    from octospark.streamops import run_stream_to_parquet

    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    run_stream_to_parquet(spark, pages_dir, out, ckpt,
                          watermark="3650 days").awaitTermination(120)
    # land new files (write elsewhere first: writing a frame derived from
    # pages_dir back into pages_dir would re-read it mid-write), then
    # restart from the checkpoint
    import glob
    import shutil

    staging = str(tmp_path / "staging")
    existing = spark.read.parquet(pages_dir).select("url")
    pages.orderBy("url").limit(150).join(
        existing, "url", "left_anti"
    ).write.parquet(staging)
    for i, f in enumerate(glob.glob(f"{staging}/part-*.parquet")):
        shutil.copy(f, f"{pages_dir}/landed-{i}.parquet")
    # huge watermark delay: landed rows have older warc_ts than the first
    # batch, and a realistic 10-minute watermark would (correctly) drop
    # them as late — this test is about file-offset resume, not lateness
    run_stream_to_parquet(spark, pages_dir, out, ckpt,
                          watermark="3650 days").awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 150
    assert got.groupBy("url").count().filter("count != 1").count() == 0


def test_rate_source_windowed_agg(spark):
    from octospark.streamops import throughput_metrics

    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 500)
        .load()
        .select(
            F.concat(F.lit("https://h/"), "value").alias("url"),
            F.col("timestamp").alias("warc_ts"),
            F.lit("x").alias("text"),
            F.lit("en").alias("lang"),
        )
    )
    agg = throughput_metrics(rate, window="10 seconds")
    q = (
        agg.writeStream.format("memory")
        .queryName("rate_agg")
        .outputMode("update")
        .trigger(processingTime="1 second")
        .start()
    )
    import time

    deadline = time.time() + 60
    rows = 0
    while time.time() < deadline:
        rows = spark.sql("SELECT count(*) c FROM rate_agg").collect()[0]["c"]
        if rows > 0:
            break
        time.sleep(1)
    q.stop()
    assert rows > 0
