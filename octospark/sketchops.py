"""DataSketches aggregation surface (theta / HLL) — the 10^12-row
answer to distinct-counting and set-cardinality questions.

At corpus scale, ``COUNT(DISTINCT url)`` per segment is a full shuffle
of every value; a sketch is a fixed-size (kilobytes) mergeable state
that partial-aggregates map-side and ships only the state through the
exchange — the same two-level (partial -> final) shape as a sum, with
accuracy controlled by the sketch size parameter, independent of row
count. Theta sketches additionally support union / intersection /
difference BETWEEN sketches, answering "how many urls do crawl A and
crawl B share" without ever joining the two crawls.

Exactness note exploited by the oracle: a theta sketch stores raw
hashed entries until it holds k (default 4096) and only then starts
sampling — so every estimate over a set with < 4096 distinct items is
EXACT, which makes the driver's value-hash comparison valid at test
scale while the very same plan degrades gracefully (±1.6 % at k=4096)
at 10^12 rows. HLL has no exact regime at these sizes (dense mode
approximates immediately), so the HLL key is rows-only with accuracy
and merge laws pinned in tests/test_sketchops.py.

Pipeline role: R18/R27 metrics (per-class counts, reference
src/octopy/train.py:99-121) at a scale where exact distinct counting
is the bottleneck; cross-snapshot overlap for incremental crawls.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from octospark.sources import load_table

QUERIES: dict = {}
ORACLE: dict = {}


def register(name: str, sql: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


@register(
    "agg_sketch_theta_setops",
    # Exact set algebra over the same shard sets: union via
    # inclusion-exclusion, difference via n - intersection.
    "WITH s AS (SELECT DISTINCT lang, doc_id % 250 AS shard FROM documents), "
    "en AS (SELECT shard FROM s WHERE lang = 'en') "
    "SELECT lang, "
    "COUNT(*) AS n_shards, "
    "(SELECT COUNT(*) FROM en) + COUNT(*) "
    "  - COUNT(CASE WHEN shard IN (SELECT shard FROM en) THEN 1 END) AS n_union_en, "
    "COUNT(CASE WHEN shard IN (SELECT shard FROM en) THEN 1 END) AS n_inter_en, "
    "COUNT(*) - COUNT(CASE WHEN shard IN (SELECT shard FROM en) THEN 1 END) AS n_diff_en "
    "FROM s GROUP BY lang",
)
def agg_sketch_theta_setops(spark, sf):
    """Per-language theta sketch of the document shard set, then
    sketch-level set algebra against the 'en' sketch: cardinality of
    union, intersection, and difference WITHOUT joining the row sets.

    Plan shape: one partial+final sketch aggregation (shuffle carries
    kilobyte sketch states, not values), then a broadcast of ONE
    sketch row — at 10^12 rows this is the only affordable way to ask
    'how much does segment X overlap the English segment'."""
    docs = load_table(spark, sf, "documents").select(
        "lang", (F.col("doc_id") % 250).alias("shard")
    )
    sk = docs.groupBy("lang").agg(F.theta_sketch_agg("shard").alias("sk"))
    en = sk.where(F.col("lang") == "en").select(F.col("sk").alias("sk_en"))
    return sk.crossJoin(F.broadcast(en)).select(
        "lang",
        F.theta_sketch_estimate("sk").alias("n_shards"),
        F.theta_sketch_estimate(F.theta_union("sk", "sk_en")).alias(
            "n_union_en"
        ),
        F.theta_sketch_estimate(F.theta_intersection("sk", "sk_en")).alias(
            "n_inter_en"
        ),
        F.theta_sketch_estimate(F.theta_difference("sk", "sk_en")).alias(
            "n_diff_en"
        ),
    )


@register("agg_sketch_hll_two_level")
def agg_sketch_hll_two_level(spark, sf):
    """Two-level HLL rollup: per-source sketches of doc_id, then a
    sketch-union aggregation to the corpus-wide distinct estimate —
    the map-side-combine shape that makes distinct counting linear-scan
    at 10^12 rows (per-source states are also reusable: any source
    subset rolls up without touching the rows again).

    Rows-only key (HLL approximates even at small n — no exact oracle
    by design, same stance as agg_approx_count_distinct); the ±3σ
    accuracy bound and the one-level == two-level merge law are pinned
    in tests/test_sketchops.py."""
    docs = load_table(spark, sf, "documents").select("source", "doc_id")
    per_source = docs.groupBy("source").agg(
        F.hll_sketch_agg("doc_id", F.lit(14)).alias("hll")
    )
    return per_source.groupBy().agg(
        F.count("source").alias("n_sources"),
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("n_docs_est"),
    )
