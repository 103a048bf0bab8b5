"""Sources: parquet test tables + distributed synthesis of the ``pages``
table (Common-Crawl-style, per BASELINE.json.input_hint).

The pages table is synthesized FROM the driver-provided ``documents``
parquet via an Arrow-batched ``mapInPandas`` — a pure per-row function of
(doc_id, text, lang, source), so the result is deterministic at any
parallelism. At real scale this stage is replaced by an Iceberg table
scan; the schema is identical.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one driver parquet table (Catalyst FileSourceScanExec — the
    analog of the reference's glob file source,
    /root/reference/src/octopy/cli/util.py:52-65)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _gen_pages(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # import inside the worker fn (lazy heavy-import discipline, analog of
    # /root/reference/src/octopy/cli/segment.py:128-130)
    from octospark.htmlgen import build_page

    for pdf in batches:
        rows = [
            build_page(int(d), t, lg, s)
            for d, t, lg, s in zip(
                pdf["doc_id"], pdf["text"], pdf["lang"], pdf["source"]
            )
        ]
        yield pd.DataFrame(
            rows, columns=["url", "warc_ts", "html", "text", "lang"]
        )


def build_pages(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """documents.parquet -> pages(url, warc_ts, html, text, lang).

    Only the four needed columns are read (column pruning reaches the
    parquet scan); synthesis runs distributed in Arrow batches."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    return docs.mapInPandas(_gen_pages, PAGES_SCHEMA)


def stage_format_copy(
    spark: SparkSession, sf_dir: str, name: str, fmt: str
) -> str:
    """Materialize one table as CSV or JSON-lines under /tmp (once per
    (sf, table, format) — idempotent via _SUCCESS marker) so the format
    readers have real files to scan. Production analog: the engine
    ingests whatever landed in the lake; here the landing step is
    simulated from the parquet source of truth."""
    src = os.path.join(sf_dir, f"{name}.parquet")
    # key the staged copy on the source mtime so a regenerated testdata
    # dir can never be shadowed by a stale staging from an earlier run
    mt = int(os.path.getmtime(src)) if os.path.exists(src) else 0
    tag = f"{os.path.basename(sf_dir.rstrip('/'))}_{mt}"
    dest = f"/tmp/octospark_src_{tag}_{name}.{fmt}"
    if not os.path.exists(os.path.join(dest, "_SUCCESS")):
        df = load_table(spark, sf_dir, name).coalesce(1)
        if fmt == "csv":
            df.write.mode("overwrite").option("header", True).csv(dest)
        else:
            df.write.mode("overwrite").json(dest)
    return dest


def read_csv_table(
    spark: SparkSession, sf_dir: str, name: str, schema: str
) -> DataFrame:
    """CSV source with an EXPLICIT schema — never inferSchema at scale
    (inference is a full extra pass over 100 TB)."""
    dest = stage_format_copy(spark, sf_dir, name, "csv")
    return spark.read.schema(schema).option("header", True).csv(dest)


def read_json_table(
    spark: SparkSession, sf_dir: str, name: str, schema: str
) -> DataFrame:
    """JSON-lines source with an explicit schema (same rationale)."""
    dest = stage_format_copy(spark, sf_dir, name, "json")
    return spark.read.schema(schema).json(dest)
