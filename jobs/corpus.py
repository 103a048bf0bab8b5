"""spark-submit entry point: corpus assembly — the training-data job.

    spark-submit --py-files octospark.zip jobs/corpus.py \
        --sf-dir /root/testdata/sf0.001 --out /tmp/corpus \
        [--budget 5000] [--contam-max 0.5] [--sample-denom 10] \
        [--classifier-gate]

Composes the §2.3 operators into the funnel every LLM corpus ships
through before training:

    documents
      -> exact dedup        (sha256 hash-groupBy, keep min doc_id)
      -> decontamination    (word-5-gram overlap vs held-out benchmark
                             docs; drop docs over --contam-max)
      -> quality gate       (Gopher-style rules, Rae et al. 2021 A1.1)
      -> stratified sample  (exact ceil(n/denom) per language)
      -> shard packing      (token-budget cumsum; ~--budget tokens/shard)
      -> parquet shards partitioned by (lang, shard_id)
         + _corpus_manifest.json with per-stage funnel counts

Every stage is the SAME DataFrame lineage — one job, one Catalyst plan
per action, no intermediate materialization except the final write.
Funnel counts are taken in one pass (a single agg over stage flags),
not one count() job per stage. Reference analog: the dataset-prep
chain ahead of training, /root/reference/src/octopy/train.py:33-56.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


from octospark.assembly import assemble_corpus  # noqa: E402


def main(argv: list | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--budget", type=int, default=5000)
    ap.add_argument("--contam-max", type=float, default=0.5)
    ap.add_argument("--sample-denom", type=int, default=10)
    ap.add_argument("--classifier-gate", action="store_true",
                    help="add the trained-model quality gate (clf_ok)")
    args = ap.parse_args(argv)

    from octospark.session import get_spark

    spark = get_spark(app_name="corpus-assembly")
    t0 = time.time()
    flags, shards = assemble_corpus(
        spark, args.sf_dir, budget=args.budget,
        contam_max=args.contam_max, sample_denom=args.sample_denom,
        classifier_gate=args.classifier_gate,
    )
    # funnel in ONE aggregation pass (never a count() job per stage)
    stage_aggs = [
        F.count("*").alias("input"),
        F.sum(F.col("dedup_keep").cast("long")).alias("after_dedup"),
        F.sum((F.col("dedup_keep") & F.col("contam_ok")).cast("long"))
        .alias("after_decontam"),
        F.sum(
            (
                F.col("dedup_keep") & F.col("contam_ok")
                & F.col("quality_ok")
            ).cast("long")
        ).alias("after_quality"),
    ]
    if args.classifier_gate:
        # survives == rule gates AND clf_ok when the gate is on
        stage_aggs.append(
            F.sum(F.col("survives").cast("long")).alias("after_classifier")
        )
    funnel = flags.agg(*stage_aggs).collect()[0]

    data_dir = os.path.join(args.out, "shards")
    shards.write.mode("overwrite").partitionBy("lang", "shard_id").parquet(
        data_dir
    )
    stats = shards.agg(
        F.count("*").alias("sampled_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.countDistinct("lang", "shard_id")).alias("n_shards"),
    ).collect()[0]

    manifest = {
        "sf_dir": args.sf_dir,
        "budget_tokens": args.budget,
        "contam_max": args.contam_max,
        "sample_denom": args.sample_denom,
        "funnel": {
            "input": funnel["input"],
            "after_dedup": funnel["after_dedup"],
            "after_decontam": funnel["after_decontam"],
            "after_quality": funnel["after_quality"],
            **(
                {"after_classifier": funnel["after_classifier"]}
                if args.classifier_gate
                else {}
            ),
            "sampled": stats["sampled_docs"],
        },
        "n_shards": stats["n_shards"],
        "total_tokens": int(stats["total_tokens"] or 0),
        "wall_seconds": round(time.time() - t0, 2),
    }
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "_corpus_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    print(json.dumps(manifest))
    return 0


if __name__ == "__main__":
    sys.exit(main())
