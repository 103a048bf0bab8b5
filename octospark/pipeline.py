"""The Spark extraction pipeline — three DataFrame transformations.

Two equivalent paths over the same semantics (both import the SAME
pure functions from :mod:`octospark.extractor`, so extracted text is
byte-identical per url between them and to the pure-Python oracle):

1. **Fused fast path** :func:`extract_pages` — one ``mapInPandas`` doing
   segment+classify+merge per page. Zero shuffles after the (optional)
   salted repartition; this is the production 100 TB path. Python cost is
   one Arrow round-trip per page batch.

2. **Staged declarative path** :func:`segment` -> :func:`classify` ->
   :func:`merge` — stage 1 is the only Python stage (DOM walk must be);
   stage 2 classification is PURE Spark column expressions + window
   lag/lead (JVM, whole-stage codegen), stage 3 merge is
   window/array_sort/aggregate built-ins. Used for analysis queries
   (label stats, span tables) and to keep the classifier declarative.

Scale notes (SURVEY.md §4):
- Catalyst does NOT push predicates through ``mapInPandas`` — the size
  guard and null filter are placed before the UDF here, by hand.
- ``html`` is pruned from every projection after the UDF stage.
- Skew: one giant host must not pin a single task — see
  :func:`salted_repartition` (north_rule requirement).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from octospark import MAX_HTML_BYTES

SPAN_TYPE = T.StructType(
    [
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("start", T.LongType(), False),
        T.StructField("end", T.LongType(), False),
        T.StructField("label", T.StringType(), False),
    ]
)

EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("spans", T.ArrayType(SPAN_TYPE), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("n_blocks", T.IntegerType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)

BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("tag_path", T.StringType(), True),
        T.StructField("depth", T.IntegerType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("n_chars", T.IntegerType(), True),
        T.StructField("n_words", T.IntegerType(), True),
        T.StructField("n_link_chars", T.IntegerType(), True),
        T.StructField("link_density", T.DoubleType(), True),
        T.StructField("text_density", T.DoubleType(), True),
        T.StructField("char_hist", T.ArrayType(T.IntegerType()), True),
    ]
)


# --------------------------------------------------------------------------
# size guard (reference analog: MAX_IMAGE_PIXELS,
# /root/reference/src/octopy/__init__.py:25) — filtered BEFORE the UDF but
# never dropped from the output (never-drop law, FIXTURES.md §D).
# --------------------------------------------------------------------------

def split_size_guard(pages: DataFrame, max_bytes: int = MAX_HTML_BYTES):
    """Return (ok, oversized_as_extracted). The oversized branch becomes
    empty-text extracted rows without ever shipping the huge html to
    Python."""
    cond = F.col("html").isNotNull() & (F.length("html") <= F.lit(max_bytes))
    ok = pages.filter(cond)
    oversized = (
        pages.filter(~F.coalesce(cond, F.lit(False)))
        .select(
            "url",
            "warc_ts",
            F.lit("").alias("text"),
            F.array().cast(T.ArrayType(SPAN_TYPE)).alias("spans"),
            "lang",
            F.lit(0).alias("n_blocks"),
            F.lit("size_guard").alias("error"),
        )
    )
    return ok, oversized


# --------------------------------------------------------------------------
# fused fast path
# --------------------------------------------------------------------------

def _make_extract_batches(max_bytes: int):
    def _extract_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        from octospark.extractor import extract  # lazy import in worker

        guard_row = ("", [], 0, "size_guard")

        def one(h):
            # inline size guard: oversized/null html is never parsed but
            # still yields a row (never-drop; reference analog
            # MAX_IMAGE_PIXELS, src/octopy/__init__.py:25)
            if h is None or len(h) > max_bytes:
                return guard_row
            r = extract(h)
            # spans as tuples: ~2x cheaper than dicts through Arrow
            return (
                r["text"],
                [(s["block_id"], s["start"], s["end"], s["label"])
                 for s in r["spans"]],
                r["n_blocks"],
                r["error"],
            )

        for pdf in batches:
            # columnar assembly: fill the four output columns directly
            # instead of a row-tuple list re-traversed per column
            texts: list = []
            spans: list = []
            n_blocks: list = []
            errors: list = []
            for h in pdf["html"]:
                r = one(h)
                texts.append(r[0])
                spans.append(r[1])
                n_blocks.append(r[2])
                errors.append(r[3])
            yield pd.DataFrame(
                {
                    "url": pdf["url"].values,
                    "warc_ts": pdf["warc_ts"].values,
                    "text": texts,
                    "spans": spans,
                    "lang": pdf["lang"].values,
                    "n_blocks": n_blocks,
                    "error": errors,
                }
            )

    return _extract_batches


def extract_pages(
    pages: DataFrame,
    max_bytes: int = MAX_HTML_BYTES,
    salted: bool = False,
    num_partitions: int | None = None,
    guard_mode: str = "inline",
    skewed_hosts: list | None = None,
) -> DataFrame:
    """pages -> extracted(url, warc_ts, text, spans, lang, n_blocks, error).

    One output row per input row, always (never-drop). Pure per-row UDF
    ⇒ result is invariant under any partitioning.

    ``guard_mode``:
    - ``'inline'`` (default): size guard enforced inside the UDF — ONE
      scan of the pages table (an oversized blob still crosses Arrow
      once, but is never parsed). Right when no scan-level pruning of
      html length is available (plain parquet).
    - ``'split'``: two-branch plan where oversized rows never reach
      Python at all — right when the source can prune cheaply (e.g. an
      Iceberg table with a length metadata column).
    """
    src = pages.select("url", "warc_ts", "html", "lang")  # prune golden text
    if guard_mode == "split":
        ok, oversized = split_size_guard(src, max_bytes)
        if salted:
            ok = salted_repartition(
                ok, num_partitions=num_partitions, skewed_hosts=skewed_hosts
            )
        extracted = ok.mapInPandas(
            _make_extract_batches(max_bytes), EXTRACTED_SCHEMA
        )
        return extracted.unionByName(oversized)
    if salted:
        src = salted_repartition(
            src, num_partitions=num_partitions, skewed_hosts=skewed_hosts
        )
    return src.mapInPandas(_make_extract_batches(max_bytes), EXTRACTED_SCHEMA)


# --------------------------------------------------------------------------
# staged path — stage 1: segment (the only Python stage)
# --------------------------------------------------------------------------

def _segment_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from octospark.extractor import segment_blocks  # lazy import in worker

    for pdf in batches:
        # columnar assembly: per-column lists, not row tuples — pandas
        # builds each column in one shot instead of transposing rows,
        # and the numeric columns land as real numpy arrays (VERDICT r2
        # #6; the per-page DOM walk itself is the irreducible part)
        cols: dict = {f.name: [] for f in BLOCKS_SCHEMA.fields}
        ap = {k: v.append for k, v in cols.items()}
        for url, html in zip(pdf["url"], pdf["html"]):
            for b in segment_blocks(html):
                ap["url"](url)
                ap["block_id"](b.block_id)
                ap["tag_path"](b.tag_path)
                ap["depth"](b.depth)
                ap["text"](b.text)
                ap["n_chars"](b.n_chars)
                ap["n_words"](b.n_words)
                ap["n_link_chars"](b.n_link_chars)
                ap["link_density"](b.link_density)
                ap["text_density"](b.text_density)
                ap["char_hist"](b.char_hist)
        yield pd.DataFrame(cols)


def segment(pages: DataFrame, max_bytes: int = MAX_HTML_BYTES) -> DataFrame:
    """Stage 1: pages -> blocks (DOM order = block_id order per url)."""
    ok, _ = split_size_guard(pages, max_bytes)
    return ok.select("url", "html").mapInPandas(_segment_batches, BLOCKS_SCHEMA)


# --------------------------------------------------------------------------
# staged path — stage 2: classify, as pure Spark expressions
# --------------------------------------------------------------------------

# These literals mirror octospark.extractor exactly; the floats compare
# bit-identically because both sides compute IEEE-754 float64 from the
# same integers.
_ANCESTOR_LABEL_MAP = {
    "nav": "boilerplate-nav",
    "header": "boilerplate-header",
    "footer": "boilerplate-footer",
    "aside": "advert",
    "form": "noise",
}
_HEADINGS = ("h1", "h2", "h3", "h4", "h5", "h6")
_TABLES = ("table", "td", "th", "tr", "thead", "tbody")
_LINK_DENSITY_MAX = 0.333333
_PREV_LINK_DENSITY_HIGH = 0.555555


def _ancestor_label(path_arr: Column) -> Column:
    """Nearest forced-ancestor label via a left fold (later = nearer)."""
    mapping = F.create_map(
        *[F.lit(x) for kv in _ANCESTOR_LABEL_MAP.items() for x in kv]
    )
    return F.aggregate(
        path_arr,
        F.lit(None).cast(T.StringType()),
        lambda acc, t: F.coalesce(mapping[t], acc),
    )


def classify(blocks: DataFrame) -> Column | DataFrame:
    """Stage 2: blocks -> blocks + ``label``, entirely JVM-side.

    The rule cascade is the expression translation of
    :func:`octospark.extractor.classify_block`; neighbor features come
    from ``lag``/``lead`` over (url, block_id) — the Spark analog of
    Boilerpipe's prev/next context."""
    w = Window.partitionBy("url").orderBy("block_id")
    path_arr = F.split(F.col("tag_path"), "/")
    last = F.element_at(path_arr, -1)
    prev_words = F.coalesce(F.lag("n_words", 1).over(w), F.lit(0))
    prev_ld = F.coalesce(F.lag("link_density", 1).over(w), F.lit(0.0))
    next_words = F.coalesce(F.lead("n_words", 1).over(w), F.lit(0))

    numwords_label = F.when(
        F.col("link_density") > F.lit(_LINK_DENSITY_MAX),
        F.lit("boilerplate-nav"),
    ).otherwise(
        F.when(
            prev_ld > F.lit(_PREV_LINK_DENSITY_HIGH),
            F.when(
                (F.col("n_words") > 40) | (next_words > 17), F.lit("content")
            ).otherwise(F.lit("noise")),
        ).otherwise(
            F.when(
                (F.col("n_words") > 16)
                | (next_words > 15)
                | (prev_words > 4),
                F.lit("content"),
            ).otherwise(F.lit("noise"))
        )
    )

    label = F.coalesce(
        _ancestor_label(path_arr),
        F.when(last.isin(*_HEADINGS), F.lit("heading")),
        F.when(last == "figcaption", F.lit("caption")),
        # layout-table carve-out (mirrors extractor.classify_block):
        # long low-link prose in a table falls through to the cascade
        F.when(
            F.exists(path_arr, lambda t: t.isin(*_TABLES))
            & ~(
                (F.col("n_words") > 16)
                & (F.col("link_density") <= F.lit(_LINK_DENSITY_MAX))
            ),
            F.lit("table"),
        ),
        numwords_label,
    )
    # never-drop fallback: any null that slips through becomes 'unknown'
    return blocks.withColumn("label", F.coalesce(label, F.lit("unknown")))


def classify_with(
    blocks: DataFrame, strategy: str = "heuristic", model: dict | None = None
) -> DataFrame:
    """Strategy dispatch for stage 2 — the plugin-override analog
    (reference src/octopy/segment.py:52-57 registers a polygonizer by
    name and monkeypatches it in; here it is plain function dispatch
    chosen by config, no monkeypatch).

    - ``'heuristic'``: the rule cascade (:func:`classify`), pure JVM.
    - ``'scored'``: the learned logistic scorer
      (:func:`octospark.scorer.score_blocks`), also pure JVM at
      inference; forced ancestor/tag labels still win (the scorer only
      arbitrates content-vs-noise), so structural labels stay stable
      across strategies.
    """
    if strategy == "heuristic":
        return classify(blocks)
    if strategy != "scored":
        raise ValueError(f"unknown classify strategy: {strategy!r}")
    if model is None:
        raise ValueError("strategy 'scored' requires a fitted model dict")
    from octospark.scorer import score_blocks

    scored = score_blocks(blocks, model)
    path_arr = F.split(F.col("tag_path"), "/")
    last = F.element_at(path_arr, -1)
    structural = F.coalesce(
        _ancestor_label(path_arr),
        F.when(last.isin(*_HEADINGS), F.lit("heading")),
        F.when(last == "figcaption", F.lit("caption")),
        F.when(
            F.exists(path_arr, lambda t: t.isin(*_TABLES))
            & ~(
                (F.col("n_words") > 16)
                & (F.col("link_density") <= F.lit(_LINK_DENSITY_MAX))
            ),
            F.lit("table"),
        ),
    )
    return scored.withColumn(
        "label",
        F.coalesce(structural, F.col("scored_label"), F.lit("unknown")),
    ).drop("score", "scored_label", "prev_words", "next_words",
           "prev_link_density")


# --------------------------------------------------------------------------
# staged path — merge: spans + text via built-ins only
# --------------------------------------------------------------------------

def merge(labeled_blocks: DataFrame, pages: DataFrame | None = None) -> DataFrame:
    """Stage 3: labeled blocks -> extracted(url, text, spans).

    Offsets computed with a running-sum window (ROWS UNBOUNDED PRECEDING),
    assembly with array_sort + aggregate — no Python, one shuffle on url.
    If ``pages`` is given, urls with zero content blocks are preserved
    with empty text (never-drop law)."""
    content = labeled_blocks.filter(
        F.col("label").isin("content", "heading")
    ).select("url", "block_id", "text", "label", F.length("text").alias("len"))

    w = (
        Window.partitionBy("url")
        .orderBy("block_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_end = content.withColumn(
        "end", F.sum(F.col("len") + F.lit(1)).over(w) - F.lit(1)
    ).withColumn("start", F.greatest(F.lit(0), F.col("end") - F.col("len")))

    merged = (
        with_end.groupBy("url")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("block_id", "start", "end", "label", "text")
                )
            ).alias("ordered")
        )
        .select(
            "url",
            F.aggregate(
                "ordered",
                F.lit(""),
                lambda acc, x: F.concat(
                    acc,
                    F.when(F.length(acc) > 0, F.lit("\n")).otherwise(F.lit("")),
                    x["text"],
                ),
            ).alias("text"),
            F.transform(
                "ordered",
                lambda x: F.struct(
                    x["block_id"].alias("block_id"),
                    x["start"].alias("start"),
                    x["end"].alias("end"),
                    x["label"].alias("label"),
                ),
            ).alias("spans"),
        )
    )
    if pages is not None:
        base = pages.select("url", "warc_ts", "lang")
        merged = (
            base.join(merged, "url", "left")
            .select(
                "url",
                "warc_ts",
                F.coalesce("text", F.lit("")).alias("text"),
                F.coalesce(
                    "spans", F.array().cast(T.ArrayType(SPAN_TYPE))
                ).alias("spans"),
                "lang",
            )
        )
    return merged


# --------------------------------------------------------------------------
# latest-crawl-wins dedup (duplicate url at two warc_ts — FIXTURES.md §C
# case 10; the as-of/DISTINCT ON pattern, oracle-checked as
# join_asof_latest in octospark.relational)
# --------------------------------------------------------------------------

def dedup_latest(pages: DataFrame) -> DataFrame:
    """Keep the newest crawl per url (ties broken by larger html so the
    choice is total and deterministic)."""
    w = Window.partitionBy("url").orderBy(
        F.col("warc_ts").desc_nulls_last(),
        F.length("html").desc_nulls_last(),
    )
    return (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# --------------------------------------------------------------------------
# skew mitigation (north_rule: explicit salt-based handling of giant hosts)
# --------------------------------------------------------------------------

def host_of(url_col: Column) -> Column:
    """Extract the host from a url (pure expression)."""
    return F.regexp_extract(url_col, r"^[a-z]+://([^/]+)/?", 1)


def find_skewed_hosts(
    pages: DataFrame, threshold_fraction: float = 0.05, min_pages: int = 10_000
) -> list:
    """First-pass groupBy(host).count() to find giant hosts (> max(
    threshold_fraction * total, min_pages) pages). At 100 TB this is a
    cheap column-pruned scan of ``url`` only."""
    counts = (
        pages.select(host_of(F.col("url")).alias("host"))
        .groupBy("host")
        .count()
    )
    total = pages.count()
    cutoff = max(int(total * threshold_fraction), min_pages)
    return [r["host"] for r in counts.filter(F.col("count") > cutoff).collect()]


def salted_repartition(
    df: DataFrame,
    num_partitions: int | None = None,
    skewed_hosts: list | None = None,
    salt_buckets: int = 16,
) -> DataFrame:
    """Repartition by url-hash with salt for skewed hosts.

    Base key is ``xxhash64(url)`` (uniform across DISTINCT urls). When
    ``skewed_hosts`` is given, their rows get a ROW-LEVEL salt — not a
    function of url alone — so even a single hot url repeated millions
    of times (a re-crawl dump, the worst real crawl skew) spreads over
    ``salt_buckets`` partitions; a url-keyed salt would send every
    replica of one url back to one partition. The salt uses
    monotonically_increasing_id, deterministic given the input
    partitioning; placement never affects results because extraction
    is a pure per-row UDF (the byte-identity checksum is asserted
    across local[2/8/32]). Safe for extraction because the unit of
    work is one page (spans never split across salts) — SURVEY.md §7.3."""
    key = F.xxhash64(F.col("url"))
    if skewed_hosts:
        salt = F.when(
            host_of(F.col("url")).isin(*skewed_hosts),
            F.pmod(
                F.xxhash64(F.col("url"), F.monotonically_increasing_id()),
                F.lit(salt_buckets),
            ),
        ).otherwise(F.lit(0))
        df = df.withColumn("_salt", salt)
        out = (
            df.repartition(num_partitions, F.col("_salt"), key)
            if num_partitions
            else df.repartition(F.col("_salt"), key)
        )
        return out.drop("_salt")
    return df.repartition(num_partitions, key) if num_partitions else df.repartition(key)
