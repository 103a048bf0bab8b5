"""Interleaved A/B benchmark: same-window old-vs-new timing (VERDICT r2 #2).

This VM's throughput drifts up to 2x minute-to-minute, so cross-window
timings are not comparable. Protocol (BENCH discipline, bench.py:218-232):
each PASS times every side back-to-back (adjacent in time = same machine
state), every timing is taken in a FRESH subprocess (fresh Spark session,
fresh plans), and the reported number per side is the MIN across passes
(contention noise is one-sided). The per-pass RATIO is additionally
reported, because a ratio inside one pass cancels machine state.

Sides are git commits, materialized as detached worktrees under /tmp.

Usage:
  python scripts/ab_bench.py queries  <name,name,...> <label=commit> ... \
      [--passes 3] [--sf /root/testdata/sf0.1]
  python scripts/ab_bench.py extract  <label=commit> ... [--passes 5]

Writes BENCH/ab_results.json (merged by experiment key); bench.py's
write_bench_md surfaces it in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_QUERY_RUNNER = r"""
import json, sys, time
from octospark.session import get_spark
import __spark_entry__ as e
sf, names = sys.argv[1], sys.argv[2].split(",")
spark = get_spark(app_name="ab", master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
qs = e.queries()
out = {}
for name in names:
    fn = qs[name]
    fn(spark, sf).write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    out[name] = round(best, 3)
print("AB_RESULT " + json.dumps(out))
spark.stop()
"""

_EXTRACT_RUNNER = r"""
import json, sys, time
import duckdb
from octospark.htmlgen import build_page
from octospark.extractor import extract
sf = sys.argv[1]
rows = duckdb.sql(
    "SELECT doc_id, text, lang, source FROM '" + sf + "/documents.parquet'"
).fetchall()
pages = [build_page(*r)["html"] for r in rows]
for p in pages:  # warm
    extract(p)
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    for p in pages:
        extract(p)
    best = min(best, time.perf_counter() - t0)
print("AB_RESULT " + json.dumps({"extract_single": round(best, 4)}))
"""


def worktree_for(commit: str) -> str:
    sha = subprocess.run(
        ["git", "rev-parse", "--short", commit],
        capture_output=True, text=True, cwd=REPO, check=True,
    ).stdout.strip()
    path = f"/tmp/octospark_ab_{sha}"
    if not os.path.isdir(path):
        subprocess.run(
            ["git", "worktree", "add", "--detach", path, commit],
            cwd=REPO, check=True, capture_output=True,
        )
    return path


def run_side(repo_path: str, runner: str, args: list) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_path
    p = subprocess.run(
        [sys.executable, "-", *args],
        input=runner, capture_output=True, text=True,
        cwd=repo_path, env=env,
    )
    for ln in p.stdout.splitlines():
        if ln.startswith("AB_RESULT "):
            return json.loads(ln[len("AB_RESULT "):])
    raise RuntimeError(
        f"runner in {repo_path} produced no result:\n{p.stdout[-2000:]}\n"
        f"{p.stderr[-2000:]}"
    )


def merge_results(key: str, payload: dict) -> str:
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "ab_results.json")
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data[key] = payload
    with open(path, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    return path


def summarize(sides: list, passes: list, metric_names: list) -> dict:
    """Per metric: min across passes per side + per-pass new/old speedup
    (sides[0] = old baseline, last side = newest)."""
    out = {}
    base = sides[0][0]
    for m in metric_names:
        entry = {"per_side_min_sec": {}, "per_pass_sec": {}}
        for label, _ in sides:
            vals = [p[label][m] for p in passes if label in p]
            entry["per_side_min_sec"][label] = min(vals)
            entry["per_pass_sec"][label] = vals
        for label, _ in sides[1:]:
            ratios = [
                round(p[base][m] / p[label][m], 3)
                for p in passes
                if base in p and label in p and p[label][m] > 0
            ]
            entry[f"speedup_{label}_vs_{base}"] = {
                "min_ratio_of_mins": round(
                    entry["per_side_min_sec"][base]
                    / entry["per_side_min_sec"][label], 3,
                ),
                "per_pass": ratios,
                "median_per_pass": round(statistics.median(ratios), 3),
            }
        out[m] = entry
    return out


def main() -> None:
    mode = sys.argv[1]
    args = sys.argv[2:]
    passes_n = 3
    sf = "/root/testdata/sf0.1"
    rest = []
    i = 0
    while i < len(args):
        if args[i] == "--passes":
            passes_n = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf = args[i + 1]; i += 2
        else:
            rest.append(args[i]); i += 1

    if mode == "queries":
        names, side_specs = rest[0], rest[1:]
        runner, run_args = _QUERY_RUNNER, [sf, names]
        metrics = names.split(",")
        key = f"queries:{names}"
    elif mode == "extract":
        side_specs = rest
        runner, run_args = _EXTRACT_RUNNER, [sf]
        metrics = ["extract_single"]
        # key carries the side labels so a new extract experiment never
        # clobbers an earlier one in ab_results.json
        key = "extract:" + "+".join(s.split("=", 1)[0] for s in side_specs)
    else:
        raise SystemExit(f"unknown mode {mode!r}")

    sides = []
    for spec in side_specs:
        label, commit = spec.split("=", 1)
        path = REPO if commit in ("HEAD", "WORKING") else worktree_for(commit)
        sides.append((label, path))
        print(f"side {label}: {commit} -> {path}")

    passes = []
    for k in range(passes_n):
        this = {}
        for label, path in sides:
            t0 = time.time()
            this[label] = run_side(path, runner, run_args)
            print(f"pass {k} {label}: {this[label]} "
                  f"[{time.time() - t0:.0f}s total]")
        passes.append(this)

    summary = {
        "protocol": (
            f"{passes_n} interleaved passes, fresh subprocess per timing, "
            "min-of-runs inside each subprocess, min-across-passes per "
            "side; per-pass ratios cancel machine drift"
        ),
        "sf": sf,
        "sides": {lbl: p for lbl, p in sides},
        "metrics": summarize(sides, passes, metrics),
    }
    path = merge_results(key, summary)
    print(json.dumps(summary["metrics"], indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
