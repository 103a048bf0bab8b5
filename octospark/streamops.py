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


def throughput_metrics(
    pages: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Windowed pages/window metric (append-mode safe: aggregation
    keyed on a watermarked event-time window).

    Feed this the RAW pages stream (or extracted output re-streamed
    from its sink), NOT ``extract_stream``'s in-flight output: Spark
    allows exactly ONE ``withWatermark`` per query lineage, and the
    mapInPandas extraction both consumes the upstream mark (for url
    dedup) and strips the event-time metadata from its output — so an
    aggregation over the in-flight extracted stream can neither reuse
    nor redefine a watermark (tests pin the working composition).
    Metrics over raw pages are equivalent for this corpus contract:
    extracted text is byte-identical per url to the golden ``text``
    column. The watermark is applied here only when the input does not
    already carry one (batch DataFrames pass through untouched)."""
    field = pages.schema["warc_ts"]
    if (
        pages.isStreaming
        and "spark.watermarkDelayMs" not in (field.metadata or {})
    ):
        pages = pages.withWatermark("warc_ts", watermark)
    return (
        pages.groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .select(F.col("w.start").alias("win_start"), "lang", "n_pages",
                "n_chars")
    )


SESSION_SCHEMA = (
    "host string, session_start timestamp, session_end timestamp, "
    "n_pages long"
)
_SESSION_STATE_SCHEMA = "start long, last long, n long"  # epoch micros


def sessionize_stream(
    pages: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Custom stateful operator: per-host crawl sessions via
    ``applyInPandasWithState`` — the arbitrary-state API that
    ``session_window`` (octospark.relational stream_session_window)
    cannot replace when per-group logic goes beyond a gap split (here:
    exact page counts per session and event-time-timeout flushes).

    Semantics: pages for one host belong to one session while
    consecutive warc_ts gaps stay below ``gap``; a session is emitted
    when a larger gap splits it in-batch, or when the event-time
    watermark passes ``last_ts + gap`` (timeout flush). State per host
    is three longs — at 10^12 pages the state store holds one row per
    *active* host, not per page."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if pd.Timedelta(watermark) > pd.Timedelta(gap):
        # the late-event merge branch assumes any admitted late event
        # falls inside the still-open session; that only holds when
        # late-ness is bounded by the gap itself
        raise ValueError(
            f"sessionize_stream requires watermark <= gap "
            f"({watermark!r} > {gap!r}): a late event older than the "
            f"gap would be merged into a session it does not belong to"
        )
    gap_us = int(pd.Timedelta(gap).total_seconds() * 1_000_000)

    def fn(key, pdfs, state: GroupState):
        host = key[0]

        def session_row(start_us: int, last_us: int, n: int):
            return pd.DataFrame(
                {
                    "host": [host],
                    "session_start": [pd.to_datetime(start_us, unit="us")],
                    "session_end": [pd.to_datetime(last_us, unit="us")],
                    "n_pages": [n],
                }
            )

        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield session_row(start, last, n)
            return

        ts: list[int] = []
        for pdf in pdfs:
            col = pdf["warc_ts"].astype("datetime64[us]")
            # null event times would become NaT -> INT64_MIN garbage
            ts.extend(col.dropna().astype("int64"))
        ts.sort()
        start, last, n = state.get if state.exists else (None, None, 0)
        out = []
        for t in ts:
            if last is not None and t <= last:
                # late-but-within-watermark event from an earlier batch:
                # it belongs to the CURRENT session (true gap vs its
                # neighbors is <= the gap we already accepted) — extend
                # bounds, never regress `last` (that would fabricate
                # splits against the next on-time event)
                n += 1
                if t < start:
                    start = t
                continue
            if last is not None and t - last > gap_us:
                out.append(session_row(start, last, n))
                start, n = t, 0
            if start is None:
                start = t
            last = t
            n += 1
        if last is None:
            # batch carried only null timestamps and no prior state
            # exists — nothing to track, leave state untouched
            return
        state.update((start, last, n))
        # event-time timeout must stay ahead of the current watermark
        timeout_ms = max(
            (last + gap_us) // 1000, state.getCurrentWatermarkMs() + 1
        )
        state.setTimeoutTimestamp(timeout_ms)
        for df in out:
            yield df

    from octospark.pipeline import host_of

    return (
        pages.withWatermark("warc_ts", watermark)
        .select(host_of(F.col("url")).alias("host"), "warc_ts")
        .groupBy("host")
        .applyInPandasWithState(
            fn,
            SESSION_SCHEMA,
            _SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
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


def windowed_page_counts(
    pages: DataFrame,
    watermark: str = "5 minutes",
    window: str = "5 minutes",
) -> DataFrame:
    """Watermarked tumbling-window page counts in APPEND mode — the
    real late-data contract (the oracle-checked batch twin is
    ``stream_tumbling_window``): a window row is emitted exactly once,
    when the event-time watermark passes its end, and rows arriving
    behind the watermark are DROPPED rather than mutating an
    already-final window. tests/test_streamops.py drives three
    micro-batches through this and pins both halves of the contract.

    Scale shape: the streaming agg state is per-window partial counts
    (the same partial-aggregable sum as batch); the watermark bounds
    state size — without it the window store grows forever on a
    10^12-page crawl stream."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"))
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "n_pages",
        )
    )
