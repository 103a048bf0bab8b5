"""Instrumented 8->32 scaling diagnostic (VERDICT r3 #3).

Runs the SAME fused-extraction workload bench.py times, at local[8] and
local[32], in one process sequentially, with the Spark UI enabled, and
pulls per-stage task metrics from the REST API after each timed run:

- task count per stage (is the 4N level actually getting 4N-wide
  stages, or is a narrow stage serializing it?)
- task-time quantiles (skewed stragglers?)
- executorRunTime vs wall x cores = scheduler occupancy (are cores
  idle waiting for work?)
- JVM GC time (is the bigger thread count GC-bound?)
- python worker time share (Arrow batch sizing shows up here)

Prints ONE JSON line:
  {"levels": {"8": {...}, "32": {...}},
   "throughput_ratio": r, "efficiency": r/4, "hw_ceiling": e,
   "verdict_hint": "..."}

Usage: python scripts/diag_scaling.py [pages_mult]
(defaults mirror bench.py's scaling config; run on a QUIET vm)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("OCTOSPARK_PAGES_MULT", sys.argv[1] if len(sys.argv) > 1 else "80")
# keep the skew census out of the instrumented window: it is untimed
# setup in bench.py, but here it would pollute the stage listing
os.environ["OCTOSPARK_DETECT_SKEW"] = "0"

import bench  # noqa: E402  (reuse staging + extraction exactly)

UI_PORT = 4099


def _api(path: str):
    with urllib.request.urlopen(
        f"http://localhost:{UI_PORT}/api/v1/{path}", timeout=10
    ) as r:
        return json.loads(r.read())


def stage_metrics(since_stage: int) -> list:
    """Completed-stage metrics newer than ``since_stage``."""
    apps = _api("applications")
    app_id = apps[0]["id"]
    stages = _api(f"applications/{app_id}/stages?status=COMPLETE")
    out = []
    for s in stages:
        if s["stageId"] <= since_stage:
            continue
        row = {
            "stage": s["stageId"],
            "name": s["name"].split("\n")[0][:60],
            "tasks": s["numCompleteTasks"],
            "executorRunTime_ms": s["executorRunTime"],
            "jvmGcTime_ms": s.get("jvmGcTime", 0),
            "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
            "shuffle_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
        }
        try:
            q = _api(
                f"applications/{app_id}/stages/{s['stageId']}/"
                f"{s['attemptId']}/taskSummary?quantiles=0.5,0.95,1.0"
            )
            row["task_ms_p50_p95_max"] = [
                round(x, 0) for x in q["executorRunTime"]
            ]
        except Exception:
            pass
        out.append(row)
    return sorted(out, key=lambda r: r["stage"])


def max_completed_stage() -> int:
    try:
        apps = _api("applications")
        stages = _api(f"applications/{apps[0]['id']}/stages")
        return max((s["stageId"] for s in stages), default=-1)
    except Exception:
        return -1


def run_level(n: int, top: int, path: str | None) -> dict:
    from octospark.session import get_spark

    spark = get_spark(
        app_name=f"diag-l{n}",
        master=f"local[{n}]",
        shuffle_partitions=max(2 * n, 8),
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    if path is None:
        path = bench.stage_pages(spark)
    parts = 4 * n
    # warmup (spawns python workers, JIT) on the common 1/16 subset
    bench.run_extraction(spark, path, fraction=(1, 16), num_partitions=parts)
    marker = max_completed_stage()
    n_rows, checksum, dt = bench.run_extraction(
        spark, path, fraction=(n, top), num_partitions=parts
    )
    wall = dt  # run_extraction's own timed window (census excluded)
    stages = stage_metrics(marker)
    total_run = sum(s["executorRunTime_ms"] for s in stages)
    total_gc = sum(s["jvmGcTime_ms"] for s in stages)
    res = {
        "pages": n_rows,
        "sec": round(dt, 3),
        "pages_per_sec": round(n_rows / dt, 1),
        "checksum": checksum,
        "stages": stages,
        # occupancy: how much of (wall x cores) the tasks actually used;
        # low at 4N but not at N = scheduler/straggler problem, low at
        # both = fixed overhead, high at both with bad ratio = the
        # machine itself (memory bandwidth) — compare hw ceiling
        "occupancy": round(total_run / (wall * 1000 * n), 3),
        "gc_share": round(total_gc / max(total_run, 1), 4),
        "path": path,
    }
    spark.stop()
    return res


def main() -> None:
    top = 32
    r8 = run_level(8, top, None)
    r32 = run_level(32, top, r8.pop("path"))
    r32.pop("path", None)
    assert r8["checksum"] is not None
    ratio = r32["pages_per_sec"] / r8["pages_per_sec"]
    # interleaved hardware ceiling in the same window (pure
    # multiprocessing, zero Spark) — what the VM itself grants 8->32
    hw8, hw32 = bench.hw_probe_level(8), bench.hw_probe_level(32)
    hw = {
        "pages_per_sec_8": round(hw8, 1),
        "pages_per_sec_32": round(hw32, 1),
        "granted_efficiency": round(hw32 / hw8 / 4, 3),
    }
    hint = (
        "software problem at 32 (occupancy dropped)"
        if r32["occupancy"] < 0.8 * r8["occupancy"]
        else "machine-granted ceiling (compare hw)"
    )
    print(json.dumps({
        "levels": {"8": r8, "32": r32},
        "throughput_ratio_8_to_32": round(ratio, 3),
        "efficiency": round(ratio / 4, 3),
        "hw_ceiling": hw,
        "verdict_hint": hint,
    }))


if __name__ == "__main__":
    main()
