"""Inspect an extraction output: manifest + lineage metadata dump as
JSON (analog of `octopy inspect`,
/root/reference/src/octopy/cli/inspect.py:38-69).

    python jobs/inspect_run.py OUT_DIR [--lineage]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="octospark inspect")
    ap.add_argument("out_dir")
    ap.add_argument("--lineage", action="store_true",
                    help="include per-bucket lineage rows")
    args = ap.parse_args()

    from octospark.lineage import inspect, read_manifest

    meta = inspect(args.out_dir)
    if args.lineage:
        meta["buckets"] = read_manifest(args.out_dir)["buckets"]
    print(json.dumps(meta, indent=1))


if __name__ == "__main__":
    main()
