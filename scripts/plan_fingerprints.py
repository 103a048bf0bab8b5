"""Per-key physical-plan fingerprints — the plan REGRESSION gate
(VERDICT r4 next-round #8).

The anti-pattern sweep (tests/test_plans.py) rejects known-bad plan
classes (row-Python, cartesian, single-partition windows); this tool
catches the regressions that sweep can't see: a NEW Exchange appearing
in a previously one-shuffle key, a scan duplicated by a lost
ReusedExchange, a Python stage creeping into a JVM-only key. It counts
plan-node signatures per key and writes PLAN_FINGERPRINTS.json at the
repo root; tests/test_plans.py::test_plan_fingerprints_unchanged
recomputes and diffs on every CI run.

Regenerate (after an INTENDED plan change — review the diff first):
    python scripts/plan_fingerprints.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF = "/root/testdata/sf0.001"

# substring -> fingerprint field; counts of physical-plan node names
FEATURES = {
    "exchanges": "Exchange ",
    "single_partition_exchanges": "Exchange SinglePartition",
    "file_scans": "FileScan ",
    "rdd_scans": "Scan ExistingRDD",
    "python_stages": "InPandas",  # MapInPandas/FlatMapGroupsInPandas
    "arrow_eval": "ArrowEvalPython",
    "row_python": "BatchEvalPython",
    "windows": "Window [",
    "sortmerge_joins": "SortMergeJoin",
    "broadcast_hash_joins": "BroadcastHashJoin",
    "broadcast_nl_joins": "BroadcastNestedLoopJoin",
    "cartesian": "CartesianProduct",
}


def fingerprint_of(plan: str) -> dict:
    return {k: plan.count(sub) for k, sub in FEATURES.items()}


def compute_all(spark, sf: str = SF) -> dict:
    import __spark_entry__ as entrymod

    out = {}
    for name, fn in entrymod.queries().items():
        plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        out[name] = fingerprint_of(plan)
    return out


ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "PLAN_FINGERPRINTS.json",
)


def main() -> int:
    from octospark.session import get_spark

    spark = get_spark(app_name="plan-fingerprints", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    fps = compute_all(spark)
    with open(ARTIFACT, "w") as f:
        json.dump({"sf_dir": SF, "keys": fps}, f, indent=1, sort_keys=True)
    print(f"wrote {ARTIFACT} ({len(fps)} keys)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
