"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction at sf0.001;
``queries()``/``oracle_sql()`` expose the operator surface from
SURVEY.md §2.2 plus the training-data-pipeline extras (dedup,
similarity, text analysis), each checked against a DuckDB oracle
where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthesize pages from sf0.001 documents, run the fused
    two-stage extraction, return extracted(url, warc_ts, text, spans,
    lang, n_blocks, error)."""
    from octospark.pipeline import extract_pages
    from octospark.sources import build_pages

    pages = build_pages(spark, "/root/testdata/sf0.001")
    return extract_pages(pages, salted=True, num_partitions=8)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2.2 + extras)."""
    import octospark.pdfops as pdfops
    import octospark.relational as rel
    import octospark.sketchops as sketchops
    import octospark.textops as textops
    import octospark.warcops as warcops
    import octospark.webops as webops

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(rel.QUERIES)
    out.update(sketchops.QUERIES)
    out.update(textops.QUERIES)
    out.update(pdfops.QUERIES)
    out.update(warcops.QUERIES)
    out.update(webops.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query key (omitted => rows-only)."""
    import octospark.pdfops as pdfops
    import octospark.relational as rel
    import octospark.sketchops as sketchops
    import octospark.textops as textops
    import octospark.warcops as warcops
    import octospark.webops as webops

    out: dict[str, str] = {}
    out.update(rel.ORACLE)
    out.update(sketchops.ORACLE)
    out.update(textops.ORACLE)
    out.update(pdfops.ORACLE)
    out.update(warcops.ORACLE)
    out.update(webops.ORACLE)
    return out
