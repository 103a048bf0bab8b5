"""Large-batch extraction stress probe — one timed end-to-end pass
over OCTOSPARK_PAGES_MULT x sf docs (default 400 x 5000 = 2M pages at
sf0.1, 5x the pinned bench headline) at local[CPUS].

The per-round bench pins 400k pages for comparable history; this
probe answers the complementary scale question — does throughput HOLD
when the batch grows past the executor-memory comfort zone (bigger
shuffle spill surface, 5x the Python-worker batches, same plan)?
Emits ONE JSON line; run it in a quiet window and paste the result
into BENCH/BASELINE.md's stress section.

Usage: OCTOSPARK_PAGES_MULT=400 python scripts/stress_extract.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
os.environ.setdefault("OCTOSPARK_PAGES_MULT", "400")

import bench  # noqa: E402  (reads OCTOSPARK_PAGES_MULT at import)
from octospark.session import get_spark  # noqa: E402


def main() -> int:
    spark = get_spark(
        app_name="stress-extract",
        master=f"local[{bench.CPUS}]",
        shuffle_partitions=4 * bench.CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    path = bench.stage_pages(spark)
    stage_sec = round(time.time() - t0, 1)
    # warmup on a 1/16 subset (JIT + Python workers), then one timed
    # full pass — min-of-2 would double a deliberately LONG run; the
    # point here is sustained throughput, not quiet-window minimum
    bench.run_extraction(spark, path, fraction=(1, 16))
    n, checksum, dt = bench.run_extraction(spark, path)
    print(
        json.dumps(
            {
                "metric": "stress_extraction",
                "pages": n,
                "sec": round(dt, 2),
                "pages_per_sec": round(n / dt, 1),
                "pages_mult": bench.PAGES_MULT,
                "sf_dir": bench.SF_DIR,
                "cpus": bench.CPUS,
                "stage_sec": stage_sec,
                "checksum": checksum,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
