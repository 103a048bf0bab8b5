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
        # columnar assembly (VERDICT r2 #6): per-column lists beat a
        # list-of-dicts DataFrame build; the per-row page synthesis
        # (extract() for the golden text) is the irreducible part
        cols: dict = {
            "url": [], "warc_ts": [], "html": [], "text": [], "lang": []
        }
        for d, t, lg, s in zip(
            pdf["doc_id"], pdf["text"], pdf["lang"], pdf["source"]
        ):
            row = build_page(int(d), t, lg, s)
            for k, v in cols.items():
                v.append(row[k])
        yield pd.DataFrame(cols)


def build_pages(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """documents.parquet -> pages(url, warc_ts, html, text, lang).

    Only the four needed columns are read (column pruning reaches the
    parquet scan); synthesis runs distributed in Arrow batches."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    return docs.mapInPandas(_gen_pages, PAGES_SCHEMA)


def _staged_dir(
    sf_dir: str,
    src_table: str,
    prefix: str,
    suffix: str,
    marker: str,
    write_fn,
) -> str:
    """Shared staging contract for every simulated lake landing:
    destination keyed on the source parquet's (mtime_ns, size)
    fingerprint so a regenerated testdata dir can never be shadowed by
    a stale copy (whole-second mtime can collide within one second);
    idempotent via the marker file; older fingerprints of the same
    (sf, table, suffix) evicted so superseded stagings don't accumulate
    in /tmp indefinitely. ``write_fn(dest)`` materializes the copy."""
    src = os.path.join(sf_dir, f"{src_table}.parquet")
    try:
        st = os.stat(src)
        fingerprint = f"{st.st_mtime_ns}_{st.st_size}"
    except OSError:
        fingerprint = "0_0"
    base = os.path.basename(sf_dir.rstrip("/"))
    dest = f"/tmp/{prefix}_{base}_{fingerprint}_{suffix}"
    if not os.path.exists(os.path.join(dest, marker)):
        import glob
        import shutil

        for old in glob.glob(f"/tmp/{prefix}_{base}_*_{suffix}"):
            if old != dest:
                shutil.rmtree(old, ignore_errors=True)
        write_fn(dest)
    return dest


def stage_format_copy(
    spark: SparkSession, sf_dir: str, name: str, fmt: str
) -> str:
    """Materialize one table as CSV or JSON-lines under /tmp (once per
    (sf, table, format) — idempotent via _SUCCESS marker) so the format
    readers have real files to scan. Production analog: the engine
    ingests whatever landed in the lake; here the landing step is
    simulated from the parquet source of truth."""

    def write(dest: str) -> None:
        df = load_table(spark, sf_dir, name).coalesce(1)
        if fmt == "csv":
            df.write.mode("overwrite").option("header", True).csv(dest)
        elif fmt == "orc":
            df.write.mode("overwrite").orc(dest)
        else:
            df.write.mode("overwrite").json(dest)

    return _staged_dir(
        sf_dir, name, "octospark_src", f"{name}.{fmt}", "_SUCCESS", write
    )


def read_csv_table(
    spark: SparkSession, sf_dir: str, name: str, schema: str
) -> DataFrame:
    """CSV source with an EXPLICIT schema — never inferSchema at scale
    (inference is a full extra pass over 100 TB).

    Spark applies an explicit CSV schema POSITIONALLY (default
    enforceSchema ignores header names), so a partial schema would bind
    to whatever the first k file columns happen to be. Binding here is
    by NAME instead: the reader gets the full source column list in file
    order (requested types for requested fields, string passthrough for
    the rest), with enforceSchema=false so any header/schema name drift
    fails loudly, and the requested columns are then selected by name.
    A column reorder or a new leading column in the landed files thus
    yields correct data or a loud error — never silent misbinding."""
    dest = stage_format_copy(spark, sf_dir, name, "csv")
    wanted = T.StructType.fromDDL(schema)
    src_fields = load_table(spark, sf_dir, name).schema.fields
    src_names = {f.name for f in src_fields}
    missing = [f.name for f in wanted.fields if f.name not in src_names]
    if missing:
        raise ValueError(f"columns not in {name} source: {missing}")
    types = {f.name: f.dataType for f in wanted.fields}
    full = T.StructType(
        [
            T.StructField(f.name, types.get(f.name, T.StringType()), True)
            for f in src_fields
        ]
    )
    df = (
        spark.read.schema(full)
        .option("header", True)
        .option("enforceSchema", False)
        .csv(dest)
    )
    return df.select(*[f.name for f in wanted.fields])


def read_json_table(
    spark: SparkSession, sf_dir: str, name: str, schema: str
) -> DataFrame:
    """JSON-lines source with an explicit schema (same rationale)."""
    dest = stage_format_copy(spark, sf_dir, name, "json")
    return spark.read.schema(schema).json(dest)


def read_orc_table(
    spark: SparkSession, sf_dir: str, name: str, cols: list
) -> DataFrame:
    """ORC source — the second columnar lake format Spark reads
    natively. ORC files embed their schema (no inference pass, unlike
    CSV/JSON), and the DSv2 reader supports the same column pruning and
    predicate pushdown as parquet, so scan-heavy plans are
    format-portable. Columns are selected by NAME after the read."""
    dest = stage_format_copy(spark, sf_dir, name, "orc")
    return spark.read.orc(dest).select(*cols)


def stage_partitioned_copy(
    spark: SparkSession, sf_dir: str, name: str, part_col: str
) -> str:
    """Materialize one table as a hive-partitioned parquet layout
    (dir/<part_col>=value/...) so partition-pruned scans have a real
    partitioned dataset to hit. Same staging contract as
    stage_format_copy (see _staged_dir). Production analog: the pages
    lake is partitioned by crawl date / host bucket, and queries that
    filter on the partition key must never touch the other
    directories."""

    def write(dest: str) -> None:
        load_table(spark, sf_dir, name).write.mode(
            "overwrite"
        ).partitionBy(part_col).parquet(dest)

    return _staged_dir(
        sf_dir, name, "octospark_part", f"{name}_{part_col}",
        "_SUCCESS", write,
    )


def stage_corrupt_jsonl(sf_dir: str) -> str:
    """Materialize documents as a JSONL landing where every 17th row
    (doc_id % 17 == 0) is TRUNCATED mid-object — the malformed-line
    reality of third-party crawl dumps. Deterministic, so the tolerant
    scan's recovered/corrupt split is oracle-reconstructable. Same
    staging contract as stage_format_copy (see _staged_dir); one file
    here, many files at scale (the corruption is per-line either way)."""
    import json

    def write(dest: str) -> None:
        import duckdb

        os.makedirs(dest, exist_ok=True)
        rows = duckdb.sql(
            "SELECT doc_id, lang FROM "
            f"'{os.path.join(sf_dir, 'documents.parquet')}' ORDER BY doc_id"
        ).fetchall()
        with open(os.path.join(dest, "part-0.jsonl"), "w") as f:
            for doc_id, lang in rows:
                line = json.dumps({"doc_id": doc_id, "lang": lang})
                if doc_id % 17 == 0:
                    line = line[: max(len(line) - 7, 1)]  # truncate
                f.write(line + "\n")
        with open(os.path.join(dest, "_STAGED"), "w") as f:
            f.write("ok")

    return _staged_dir(
        sf_dir, "documents", "octospark_badjson", "corrupt", "_STAGED",
        write,
    )


def stage_evolved_copy(spark: SparkSession, sf_dir: str) -> str:
    """Materialize a parquet dataset whose files carry TWO schema
    versions — batch=1 was written before the c_acctbal column existed
    (even custkeys), batch=2 after (odd custkeys) — the add-a-column
    schema evolution every long-lived lake table goes through. Readers
    must mergeSchema across file footers and null-fill the old files.
    Same staging contract as stage_format_copy (see _staged_dir)."""

    def write(dest: str) -> None:
        from pyspark.sql import functions as F

        cust = load_table(spark, sf_dir, "customer")
        cust.filter(F.col("c_custkey") % 2 == 0).select(
            "c_custkey", "c_name"
        ).write.mode("overwrite").parquet(os.path.join(dest, "batch=1"))
        cust.filter(F.col("c_custkey") % 2 == 1).select(
            "c_custkey", "c_name", "c_acctbal"
        ).write.mode("overwrite").parquet(os.path.join(dest, "batch=2"))
        with open(os.path.join(dest, "_STAGED"), "w") as f:
            f.write("ok")

    return _staged_dir(
        sf_dir, "customer", "octospark_evo", "customer", "_STAGED", write
    )


def stage_malformed_csv(sf_dir: str) -> str:
    """Materialize documents as a CSV landing where every 13th row
    (doc_id % 13 == 0) carries an unparseable n_chars field — the
    mangled-numeric reality of third-party exports. Deterministic, so
    the permissive scan's partial-parse split (good columns kept, bad
    column nulled, raw line preserved) is oracle-reconstructable.
    Same staging contract as stage_corrupt_jsonl (see _staged_dir)."""

    def write(dest: str) -> None:
        import duckdb

        os.makedirs(dest, exist_ok=True)
        rows = duckdb.sql(
            "SELECT doc_id, lang, n_chars FROM "
            f"'{os.path.join(sf_dir, 'documents.parquet')}' "
            "ORDER BY doc_id"
        ).fetchall()
        with open(os.path.join(dest, "part-0.csv"), "w") as f:
            for doc_id, lang, n_chars in rows:
                bad = doc_id % 13 == 0
                val = f"#{n_chars}#" if bad else str(n_chars)
                f.write(f"{doc_id},{lang},{val}\n")
        with open(os.path.join(dest, "_STAGED"), "w") as f:
            f.write("ok")

    return _staged_dir(
        sf_dir, "documents", "octospark_badcsv", "corrupt", "_STAGED",
        write,
    )
