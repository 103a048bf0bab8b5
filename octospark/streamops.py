"""Structured Streaming surface — the same extraction pipeline over an
unbounded pages stream.

The reference is strictly batch (its "streaming" is a progress loop,
/root/reference/src/octopy/cli/segment.py:134-145); this module is the
Spark-native extension: the SAME ``mapInPandas`` extraction stage runs
unchanged on a streaming DataFrame, because mapInPandas is stateless
per-row — octopy's per-document independence is what makes the pipeline
streamable for free.

Patterns covered (SURVEY.md §2.2 streaming extras):
- file-source streaming ingest (`readStream.schema(...).parquet`)
- watermarked late-data handling (`withWatermark`)
- in-stream url dedup (`dropDuplicatesWithinWatermark`)
- tumbling-window throughput metrics (the batch-equivalent twins are
  oracle-checked in octospark.relational)
- `Trigger.AvailableNow` batch-drain for testable runs
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from octospark.pipeline import EXTRACTED_SCHEMA, _make_extract_batches
from octospark.sources import PAGES_SCHEMA

from octospark import MAX_HTML_BYTES


def read_pages_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """Unbounded pages source: each new parquet file in ``input_dir`` is
    one micro-batch (the file-arrival pattern of a crawl landing zone)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def extract_stream(
    pages: DataFrame,
    watermark: str = "10 minutes",
    dedup_urls: bool = True,
    max_bytes: int = MAX_HTML_BYTES,
) -> DataFrame:
    """Streaming extraction: watermark late crawls, drop duplicate urls
    within the watermark (latest-crawl-wins happens downstream in batch
    compaction), then the identical extraction UDF."""
    src = pages.withWatermark("warc_ts", watermark)
    if dedup_urls:
        src = src.dropDuplicatesWithinWatermark(["url"])
    src = src.select("url", "warc_ts", "html", "lang")
    return src.mapInPandas(_make_extract_batches(max_bytes), EXTRACTED_SCHEMA)


def throughput_metrics(extracted: DataFrame, window: str = "1 hour") -> DataFrame:
    """Windowed pages/window metric over the stream (append-mode safe:
    aggregation keyed on the watermarked event-time window)."""
    return (
        extracted.groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .select(F.col("w.start").alias("win_start"), "lang", "n_pages",
                "n_chars")
    )


def run_stream_to_parquet(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    watermark: str = "10 minutes",
):
    """End-to-end streaming job: ingest -> extract -> parquet sink with
    exactly-once file-sink semantics (Spark's transactional file sink +
    checkpointed offsets — the streaming twin of octospark.lineage)."""
    pages = read_pages_stream(spark, input_dir)
    extracted = extract_stream(pages, watermark=watermark)
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
