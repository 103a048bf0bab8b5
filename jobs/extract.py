"""spark-submit entry point: the production extraction job.

    spark-submit --py-files octospark.zip jobs/extract.py \
        --input /path/to/pages_parquet --out /path/to/extracted \
        [--sf-dir /root/testdata/sf0.001]  (synthesize pages instead)
        [--n-buckets 64] [--salt-buckets 16] [--max-bytes N] [--resume]

Reads a pages table (or synthesizes one from a testdata sf dir), runs
the fused extraction with per-bucket lineage, commits a manifest
snapshot, prints the inspect JSON. Rerunning with --resume (or at all —
commits are idempotent) processes only missing buckets (reference
analog: --resume, /root/reference/src/octopy/cli/train.py:140-162).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="octospark extraction job")
    ap.add_argument("--input", help="pages parquet path")
    ap.add_argument("--sf-dir", help="testdata dir to synthesize pages from")
    ap.add_argument("--out", required=True, help="output dir (data + manifest)")
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--max-bytes", type=int, default=None)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    if not args.input and not args.sf_dir:
        ap.error("one of --input / --sf-dir is required")

    from octospark.lineage import inspect, run_extract
    from octospark.session import get_spark
    from octospark.sources import build_pages

    spark = get_spark(app_name="octospark-extract", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    if args.input:
        pages = spark.read.parquet(args.input)
    else:
        pages = build_pages(spark, args.sf_dir)
    run_extract(
        spark, pages, args.out, n_buckets=args.n_buckets, run_id=args.run_id
    )
    print(json.dumps(inspect(args.out), indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
