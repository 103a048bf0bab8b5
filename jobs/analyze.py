"""spark-submit entry point: block-level corpus analysis (staged path).

    python jobs/analyze.py --sf-dir /root/testdata/sf0.001 --out /tmp/an
        [--strategy heuristic|scored|scored-distributed] [--merge alias=target ...]
        [--input pages_parquet]

Runs the staged pipeline (segment -> classify -> label stats) and writes
two parquet tables under --out: ``blocks`` (per-block features + label)
and ``label_stats`` (per-class counts with alias rollup, the R27 analog
— reference class summary, /root/reference/src/octopy/train.py:99-121).
``--merge`` applies class-merge rules (R10 analog, chain-resolved
driver-side — reference train.py:199-240); ``--strategy scored`` fits
the logistic scorer on the heuristic labels first (self-training) and
classifies with it (R4 strategy dispatch, reference segment.py:52-57).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="octospark block analysis")
    ap.add_argument("--input", help="pages parquet path")
    ap.add_argument("--sf-dir", help="testdata dir to synthesize pages from")
    ap.add_argument("--out", required=True)
    ap.add_argument("--strategy",
                    choices=("heuristic", "scored", "scored-distributed"),
                    default="heuristic")
    ap.add_argument("--merge", nargs="*", default=[],
                    help="label merge rules alias=target (target '-' drops)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    if not args.input and not args.sf_dir:
        ap.error("one of --input / --sf-dir is required")

    from octospark.labelmap import apply_merges, label_stats
    from octospark.pipeline import classify, classify_with, segment
    from octospark.session import get_spark
    from octospark.sources import build_pages

    merges = {}
    for rule in args.merge:
        alias, _, target = rule.partition("=")
        merges[alias] = None if target == "-" else target

    spark = get_spark(app_name="octospark-analyze", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    pages = (
        spark.read.parquet(args.input) if args.input
        else build_pages(spark, args.sf_dir)
    )
    blocks = segment(pages)
    if args.strategy == "scored":
        from octospark.scorer import fit_scorer

        model = fit_scorer(classify(blocks), epochs=100, max_rows=50_000)
        labeled = classify_with(blocks, "scored", model)
    elif args.strategy == "scored-distributed":
        # the scale path: no driver-side sample, bit-identical at any
        # parallelism (octospark/trainer.py)
        from octospark.scorer import fit_scorer_distributed

        model = fit_scorer_distributed(classify(blocks), steps=60)
        labeled = classify_with(blocks, "scored", model)
    else:
        labeled = classify_with(blocks, "heuristic")
    if merges:
        labeled = apply_merges(labeled, merges)
    labeled.write.mode("overwrite").parquet(
        os.path.join(args.out, "blocks")
    )
    stats = label_stats(labeled)
    stats.write.mode("overwrite").parquet(
        os.path.join(args.out, "label_stats")
    )
    rows = {
        r["canonical"]: int(r["n_blocks"]) for r in stats.collect()
    }
    print(json.dumps(
        {"strategy": args.strategy, "merges": merges, "label_counts": rows},
        indent=1, sort_keys=True,
    ))
    spark.stop()


if __name__ == "__main__":
    main()
