"""Corpus assembly — the composed training-data funnel.

Library home of :func:`assemble_corpus` (the spark-submit entry point
jobs/corpus.py is a thin CLI around it) so the packaged octospark zip
(scripts/submit.sh ships only octospark/) carries the funnel, and the
contract key ``corpus_assembly_funnel`` never imports the entry-point
directory. Stage semantics and oracles live on the composed operators
in :mod:`octospark.textops`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def assemble_corpus(
    spark: SparkSession,
    sf_dir: str,
    budget: int = 5000,
    contam_max: float = 0.5,
    sample_denom: int = 10,
    classifier_gate: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Return (flags, shards): ``flags`` carries one row per input doc
    with per-stage booleans (the funnel, computable in one agg);
    ``shards`` is the surviving sample packed into token-budget shards.

    ``classifier_gate=True`` adds the model-based quality stage (the
    DCLM/fasttext-style gate): train the distributed classifier on the
    corpus itself (octospark/trainer.py — deterministic at any
    parallelism) and require its acceptance (``clf_ok``) alongside the
    rule gates. Off by default so the rule-only funnel stays the
    oracle-checked contract (`corpus_assembly_funnel`)."""
    from octospark.sources import load_table
    from octospark.textops import (
        QUERIES,
        _words,
    )

    docs = load_table(spark, sf_dir, "documents")

    # -- stage 1: exact dedup — keeper = min doc_id per content hash
    keeper = (
        docs.groupBy(F.sha2(F.col("text"), 256).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", F.lit(True).alias("dedup_keep"))
    )

    # -- stage 2: decontamination — reuse the §2.3 operator verbatim
    contam = QUERIES["text_contamination_check"](spark, sf_dir).select(
        "doc_id", (F.col("contamination") <= contam_max).alias("contam_ok")
    )

    # -- stage 3: Gopher quality gate
    quality = QUERIES["text_gopher_quality"](spark, sf_dir).select(
        "doc_id", F.col("quality_pass").alias("quality_ok")
    )

    flags = (
        docs.select("doc_id", "lang")
        .join(keeper, "doc_id", "left")
        .join(contam, "doc_id", "left")
        .join(quality, "doc_id", "left")
        .select(
            "doc_id", "lang",
            F.coalesce("dedup_keep", F.lit(False)).alias("dedup_keep"),
            # benchmark docs (doc_id % 97 == 0) are HELD OUT: absent
            # from the contamination output and never shipped
            F.coalesce("contam_ok", F.lit(False)).alias("contam_ok"),
            F.coalesce("quality_ok", F.lit(False)).alias("quality_ok"),
        )
    )
    if classifier_gate:
        # stage 3b: trained-model gate — doc kept iff the classifier
        # scores it positive (scoring is a map-side projection; the
        # bounded training passes run once up front)
        clf = QUERIES["corpus_classifier_filter"](spark, sf_dir).select(
            "doc_id", F.lit(True).alias("clf_ok")
        )
        flags = flags.join(clf, "doc_id", "left").withColumn(
            "clf_ok", F.coalesce("clf_ok", F.lit(False))
        )
    flags = flags.withColumn(
        "survives",
        F.col("dedup_keep") & F.col("contam_ok") & F.col("quality_ok")
        & (F.col("clf_ok") if classifier_gate else F.lit(True)),
    )

    # -- stage 4: stratified sample over SURVIVORS (exact quotas)
    surv = flags.filter("survives").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    sampled = (
        surv.select(
            "doc_id", "lang",
            F.row_number().over(w).alias("rk"),
            F.count("*").over(Window.partitionBy("lang")).alias("n_lang"),
        )
        .filter(
            F.col("rk") <= F.expr(f"(n_lang + {sample_denom - 1}) "
                                  f"div {sample_denom}")
        )
        .select("doc_id", "lang")
    )

    # -- stage 5: token-budget shard packing over the sample
    ntok = F.size(_words(F.col("text"))).cast("long")
    wcum = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    shards = (
        sampled.join(docs.select("doc_id", "text"), "doc_id")
        .select(
            "doc_id", "lang", "text",
            ntok.alias("n_tokens"),
            F.sum(ntok).over(wcum).alias("cum"),
        )
        .select(
            "doc_id", "lang", "text", "n_tokens",
            F.expr(f"(cum - n_tokens) div {budget}").alias("shard_id"),
        )
    )
    return flags, shards
