"""Web-graph and corpus-curation operators, round 4 additions:
anchor-text aggregation, structured table-field extraction, per-host
document quotas, and CCNet-style per-language LM-score bucketing.

Same contract discipline as :mod:`octospark.textops`: hot paths are
JVM built-ins (regexp pulls, windows, exact-int aggregates); every key
carries a DuckDB oracle that reconstructs the expected output from the
deterministic page-template rules (octospark/htmlgen.py — pure
functions of doc_id), so the driver's value-hash comparison is exact.

Reference analog map (for the parity audit): the reference's
segment-merge-classify loop treats repeated page chrome as a learned
prior (reference src/octopy/segment.py regions / train.py class stats);
these keys are the corpus-side tables that prior is computed from.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from octospark.sources import build_pages, load_table
from octospark.textops import _WORD_FREQ_CTES_SQL, word_frequency_scored

QUERIES: dict = {}
ORACLE: dict = {}


def register(name: str, sql: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


# --------------------------------------------------------------------------
# link_anchor_text — per-target anchor-text census
# --------------------------------------------------------------------------

# The synthesized templates (htmlgen.py) put every <a> tag in one of
# four fixed blocks, each a pure function of doc_id % 6 — so the exact
# (href, anchor) multiset per page is reconstructable in SQL. '|' is
# safe as a pair separator: no template anchor or href contains it.
_ANCHOR_PAIRS_SQL = """
    (CASE WHEN doc_id % 6 IN (0, 1, 2, 4, 5) THEN
        ['/|Home', '/news|News', '/about|About us', '/contact|Contact',
         '/login|Log in', '/signup|Sign up']
      ELSE [] END
     || ['/topics|topics', '/privacy|Privacy', '/terms|Terms',
         '/sitemap|Sitemap']
     || CASE WHEN doc_id % 6 = 1 THEN
          ['/deal1|Shop now', '/deal2|Click here', '/deal3|Learn more']
        ELSE [] END
     || CASE WHEN doc_id % 6 IN (1, 4) THEN
          ['/r1|Related story one', '/r2|Related story two',
           '/r3|Related story three', '/r4|Related story four',
           '/r5|Related story five']
        ELSE [] END)
    """

_ANCHOR_SQL = f"""
    WITH pairs AS (
      SELECT doc_id, unnest({_ANCHOR_PAIRS_SQL}) AS p
      FROM documents)
    SELECT string_split(p, '|')[1] AS href,
           string_split(p, '|')[2] AS anchor,
           count(*) AS n_links,
           count(DISTINCT doc_id) AS n_pages
    FROM pairs
    GROUP BY href, anchor
    """


@register("link_anchor_text", _ANCHOR_SQL)
def link_anchor_text(spark, sf):
    """Anchor-text aggregation per link target — the table web corpora
    derive link-context metadata from (anchor text is the classic
    relevance signal for a target page, and aggregated anchor phrases
    feed query/title augmentation for training data). Per (href,
    anchor-text) pair: total link count and distinct linking pages.

    Scale shape: the <a>-tag pull is a single JVM ``regexp_extract_all``
    over the decoded html (group 0 — whole tags), then two per-tag
    ``regexp_extract`` projections split href from anchor — all
    codegen, zero Python. One groupBy shuffle on (href, anchor);
    count/countDistinct(url) partial-aggregate map-side, and at corpus
    scale the hot keys (sitewide footer links, linked from every page)
    are exactly the partial-aggregable ones. Attribute-order-robust
    anchor parsing for adversarial pages lives in the DOM walker
    (pipeline.segment); this is the flat census the walker's features
    calibrate against. Reference analog: R27 class-frequency stats
    (/root/reference/src/octopy/train.py:99-121) over the link graph."""
    pages = build_pages(spark, sf).select("url", "html")
    tags = pages.select(
        "url",
        F.explode(
            F.regexp_extract_all(
                F.decode(F.col("html"), "UTF-8"),
                F.lit('<a href="[^"]*">[^<]*</a>'),
                0,
            )
        ).alias("tag"),
    )
    pairs = tags.select(
        "url",
        F.regexp_extract("tag", '<a href="([^"]*)"', 1).alias("href"),
        F.regexp_extract("tag", ">([^<]*)<", 1).alias("anchor"),
    )
    return pairs.groupBy("href", "anchor").agg(
        F.count("*").alias("n_links"),
        F.countDistinct("url").alias("n_pages"),
    )


# --------------------------------------------------------------------------
# extract_table_fields — structured field extraction (wrapper mining)
# --------------------------------------------------------------------------

_TABLE_FIELDS_SQL = """
    SELECT 'https://' || source || '.example.org/doc/'
             || CAST(doc_id AS VARCHAR) AS url,
           doc_id * 7 % 1000 AS views,
           doc_id * 3 % 100 AS shares
    FROM documents
    WHERE doc_id % 6 = 4
    """


@register("extract_table_fields", _TABLE_FIELDS_SQL)
def extract_table_fields(spark, sf):
    """Structured-field extraction from HTML tables (wrapper mining /
    semi-structured harvesting): pull the integer Views/Shares cells
    out of the stats ``<table>`` that template t=4 pages embed. This is
    the micro-pattern behind infobox/spec-table harvesting at corpus
    scale — locate a labeled cell, capture the typed value next to it.

    Scale shape: one JVM regexp filter (pages without the table are
    dropped before any capture work) + two ``regexp_extract`` captures
    cast to long — single narrow scan stage, no shuffle at all.
    Pushdown: only (url, html) are read. Oracle: the table cells are
    pure functions of doc_id (htmlgen.py:67-71,110), so the expected
    integers are reconstructed exactly in SQL.
    Reference analog: R7 per-unit field resolve
    (/root/reference/src/octopy/segment.py per-region properties)."""
    pages = build_pages(spark, sf).select("url", "html")
    html = F.decode(F.col("html"), "UTF-8")
    views_pat = r"<tr><td>Views</td><td>(\d+)</td></tr>"
    shares_pat = r"<tr><td>Shares</td><td>(\d+)</td></tr>"
    return (
        pages.select(
            "url",
            F.regexp_extract(html, views_pat, 1).alias("v"),
            F.regexp_extract(html, shares_pat, 1).alias("s"),
        )
        .filter((F.col("v") != "") & (F.col("s") != ""))
        .select(
            "url",
            F.col("v").cast("long").alias("views"),
            F.col("s").cast("long").alias("shares"),
        )
    )


# --------------------------------------------------------------------------
# corpus_domain_quota — per-host document cap
# --------------------------------------------------------------------------

_QUOTA_K = 8

_QUOTA_SQL = f"""
    SELECT doc_id, source, n_chars, host_rank,
           host_rank <= {_QUOTA_K} AS keep
    FROM (
      SELECT doc_id, source, n_chars,
             row_number() OVER (
               PARTITION BY source
               ORDER BY n_chars DESC, doc_id ASC) AS host_rank
      FROM documents)
    """


@register("corpus_domain_quota", _QUOTA_SQL)
def corpus_domain_quota(spark, sf):
    """Per-host document quota (the C4/FineWeb-style domain cap): rank
    every document within its host by length (desc, doc_id tiebreak)
    and keep only the top k per host, so no single domain dominates the
    training mix. Emits one row per INPUT doc with its host_rank and
    keep flag — same never-drop reporting contract as the assembly
    funnel, so downstream stages can audit what the cap removed.

    Scale shape: one shuffle on host + per-host sort (row_number
    window). Hosts are ~10^5-10^7x smaller than the corpus so a host
    partition fits an executor; for a DEGENERATE giant host (one domain
    = % of the corpus) the scale path replaces the full window with a
    two-phase threshold: per-partition partial top-k aggregate
    (min-heap in an agg buffer, O(k) state), merge to the k-th-score
    threshold per host, broadcast back, keep = score above threshold —
    no per-host global sort. The window form is used here because it
    is bit-exact against the SQL oracle (ints only, total tiebreak).
    Reference analog: R20's deterministic split discipline applied as
    a per-class cap (/root/reference/src/octopy/train.py:186-204)."""
    docs = load_table(spark, sf, "documents").select(
        "doc_id", "source", "n_chars"
    )
    win = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return docs.withColumn(
        "host_rank", F.row_number().over(win)
    ).withColumn("keep", F.col("host_rank") <= _QUOTA_K)


# --------------------------------------------------------------------------
# text_lm_bucket — CCNet-style per-language head/middle/tail buckets
# --------------------------------------------------------------------------

# Tertile probabilities as exact double literals: repr(1/3) and
# repr(2/3) round-trip to the identical IEEE doubles in both engines,
# and quantile_cont / Spark percentile share the p*(N-1) lerp
# definition (agg_quartile_assign precedent), so the cutoffs match
# bitwise and the > comparisons agree everywhere.
_P1 = "0.3333333333333333"
_P2 = "0.6666666666666666"

_LM_BUCKET_SQL = f"""
    WITH {_WORD_FREQ_CTES_SQL},
    scored AS (
      SELECT doc_id, lang,
             CAST(SUM(cnt) AS DOUBLE) / count(*) AS mean_commonness
      FROM words JOIN counts USING (w)
      GROUP BY doc_id, lang),
    cuts AS (
      SELECT lang,
             quantile_cont(mean_commonness, {_P1}) AS c1,
             quantile_cont(mean_commonness, {_P2}) AS c2
      FROM scored GROUP BY lang)
    SELECT doc_id, lang, mean_commonness,
           CASE WHEN mean_commonness > c2 THEN 'head'
                WHEN mean_commonness > c1 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM scored JOIN cuts USING (lang)
    """


@register("text_lm_bucket", _LM_BUCKET_SQL)
def text_lm_bucket(spark, sf):
    """CCNet-style LM-quality bucketing (Wenzek et al. 2020): score
    every document by its mean token corpus-frequency (the exact-
    arithmetic stand-in for LM perplexity — same substitution as
    text_word_rarity, which documents why true log-prob is rows-only
    territory), then split EACH LANGUAGE into head/middle/tail tertiles
    of that score. CCNet keeps head+middle and drops tail; the bucket
    column is emitted per doc so the assembly funnel can apply any
    policy.

    Scale shape: the rarity sub-plan is text_word_rarity's (vocabulary
    groupBy + frequency join — Zipf-head broadcast split documented
    there); the new work is one tiny per-lang exact-percentile
    aggregate (rows = n_langs) broadcast-joined back, then a pure
    codegen CASE. At true corpus scale swap F.percentile for
    percentile_approx per lang — plan shape unchanged, sketch
    mergeable; exact percentile is used here for bit-reproducibility
    against the oracle (agg_quartile_assign precedent).
    Reference analog: R27 per-class stats driving the keep policy
    (/root/reference/src/octopy/train.py:99-121)."""
    scored = word_frequency_scored(spark, sf, extra_cols=("lang",)).select(
        "doc_id", "lang", "mean_commonness"
    )
    cuts = scored.groupBy("lang").agg(
        F.percentile("mean_commonness", F.lit(1 / 3)).alias("c1"),
        F.percentile("mean_commonness", F.lit(2 / 3)).alias("c2"),
    )
    return scored.join(F.broadcast(cuts), "lang").select(
        "doc_id",
        "lang",
        "mean_commonness",
        F.when(F.col("mean_commonness") > F.col("c2"), "head")
        .when(F.col("mean_commonness") > F.col("c1"), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )
