"""DataSketches keys: exact-regime theta set algebra, HLL accuracy and
merge laws, and the partial-aggregation plan shape that makes sketches
the 10^12-row distinct-count strategy."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from octospark.sketchops import QUERIES

SF = "/root/testdata/sf0.001"


def test_theta_setops_match_exact_sql(spark):
    got = {
        r["lang"]: r.asDict()
        for r in QUERIES["agg_sketch_theta_setops"](spark, SF).collect()
    }
    exact = duckdb.sql(
        "WITH s AS (SELECT DISTINCT lang, doc_id % 250 AS shard "
        f"FROM '{SF}/documents.parquet'), "
        "en AS (SELECT shard FROM s WHERE lang = 'en') "
        "SELECT lang, COUNT(*) AS n, "
        "COUNT(CASE WHEN shard IN (SELECT shard FROM en) THEN 1 END) AS i, "
        "(SELECT COUNT(*) FROM en) AS ne FROM s GROUP BY lang"
    ).fetchall()
    assert len(got) == len(exact) >= 3
    for lang, n, i, ne in exact:
        g = got[lang]
        assert g["n_shards"] == n
        assert g["n_inter_en"] == i
        assert g["n_union_en"] == ne + n - i
        assert g["n_diff_en"] == n - i
    # the 'en' row degenerates correctly: A op A
    en = got["en"]
    assert en["n_union_en"] == en["n_inter_en"] == en["n_shards"]
    assert en["n_diff_en"] == 0


def test_hll_two_level_accuracy_bound(spark):
    row = QUERIES["agg_sketch_hll_two_level"](spark, SF).collect()[0]
    n_exact = duckdb.sql(
        f"SELECT COUNT(DISTINCT doc_id) FROM '{SF}/documents.parquet'"
    ).fetchone()[0]
    # lgConfigK=14 -> RSE ~ 1.04/sqrt(2^14) ~ 0.8%; assert 3 sigma
    assert abs(row["n_docs_est"] - n_exact) <= max(3, 0.025 * n_exact)
    assert row["n_sources"] >= 3


def test_hll_two_level_equals_one_level(spark):
    """Merge law: union of per-source sketches estimates the same as a
    single corpus-wide sketch (sketches are deterministic — no RNG —
    so the two plans must agree exactly, which is what makes per-
    segment sketch REUSE valid at scale)."""
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("source", "doc_id")
    )
    one = docs.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("doc_id", F.lit(14)))
    ).collect()[0][0]
    two = (
        docs.groupBy("source")
        .agg(F.hll_sketch_agg("doc_id", F.lit(14)).alias("h"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("h")))
        .collect()[0][0]
    )
    assert one == two


def test_theta_partial_aggregation_in_plan(spark):
    """The sketch aggregation must partial-aggregate map-side (two
    ObjectHashAggregate levels around one exchange) — the property that
    makes the shuffle carry sketch states instead of raw values."""
    plan = (
        QUERIES["agg_sketch_theta_setops"](spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("ObjectHashAggregate") >= 2
    assert "partial_theta_sketch_agg" in plan
    assert "CartesianProduct" not in plan  # 1-row side must broadcast


def test_theta_invariant_under_repartition(spark):
    """Determinism law: sketch estimates are partitioning-invariant
    (merge is exact in the sub-k regime)."""
    base = QUERIES["agg_sketch_theta_setops"](spark, SF)
    a = sorted(map(tuple, base.collect()))
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .repartition(13)
        .select("lang", (F.col("doc_id") % 250).alias("shard"))
    )
    sk = docs.groupBy("lang").agg(F.theta_sketch_agg("shard").alias("sk"))
    en = sk.where(F.col("lang") == "en").select(F.col("sk").alias("sk_en"))
    b = sorted(
        map(
            tuple,
            sk.crossJoin(F.broadcast(en)).select(
                "lang",
                F.theta_sketch_estimate("sk").alias("n_shards"),
                F.theta_sketch_estimate(
                    F.theta_union("sk", "sk_en")
                ).alias("n_union_en"),
                F.theta_sketch_estimate(
                    F.theta_intersection("sk", "sk_en")
                ).alias("n_inter_en"),
                F.theta_sketch_estimate(
                    F.theta_difference("sk", "sk_en")
                ).alias("n_diff_en"),
            ).collect(),
        )
    )
    assert a == b
