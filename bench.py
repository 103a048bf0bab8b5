"""octospark benchmark — extraction throughput + headline query timings.

Prints ONE JSON line:
  {"metric": "...", "value": <extraction wall sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <float>,
   "pages": N, "pages_per_sec": ..., "scaling": {...}}

Default run (driver contract):
  1. stage a pages table to /tmp (documents x PAGES_MULT replicas,
     deterministic) — setup, not timed;
  2. time the fused extraction pipeline (read parquet -> salted
     repartition -> mapInPandas extract -> checksum agg) at
     local[$SPARK_GRAFT_CPUS];
  3. time headline relational/textops queries;
  4. scaling evidence (north_rule: two cluster sizes): re-run the
     extraction in fresh subprocesses at local[N_SMALL] and local[N_BIG]
     and report throughput at both + efficiency; also appended to
     BENCH/BASELINE.md.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), OCTOSPARK_PAGES_MULT (default 10),
     OCTOSPARK_SKIP_SCALING=1 to skip step 4.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PAGES_MULT = int(os.environ.get("OCTOSPARK_PAGES_MULT", "40"))
N_SMALL, N_BIG = 8, 32


def sf_of(path: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else 0.0


def staged_pages_path() -> str:
    tag = f"{sf_of(SF_DIR)}_{PAGES_MULT}".replace(".", "_")
    return f"/tmp/octospark_bench_pages_{tag}.parquet"


def stage_pages(spark) -> str:
    """Materialize the replicated pages table once (setup, untimed)."""
    from pyspark.sql import functions as F

    from octospark.sources import PAGES_SCHEMA, load_table

    path = staged_pages_path()
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    if PAGES_MULT > 1:
        reps = spark.range(PAGES_MULT).select(
            F.col("id").alias("rep")
        )
        docs = docs.crossJoin(reps).select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            "text", "lang", "source",
        )

    import pandas as pd

    def gen(batches):
        from octospark.htmlgen import build_page

        for pdf in batches:
            rows = [
                build_page(int(d), t, lg, s)
                for d, t, lg, s in zip(
                    pdf["doc_id"], pdf["text"], pdf["lang"], pdf["source"]
                )
            ]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    docs.repartition(CPUS * 2).mapInPandas(gen, PAGES_SCHEMA).write.mode(
        "overwrite"
    ).parquet(path)
    return path


def run_extraction(spark, pages_path: str) -> tuple:
    """The timed unit: read -> salted repartition -> extract -> agg."""
    from pyspark.sql import functions as F

    from octospark.pipeline import extract_pages

    pages = spark.read.parquet(pages_path).drop("text")  # no golden leak
    t0 = time.time()
    ext = extract_pages(pages, salted=True, num_partitions=CPUS * 4)
    row = ext.agg(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64("url", "text")).alias("checksum"),
    ).collect()[0]
    dt = time.time() - t0
    return int(row["n"]), int(row["checksum"]), dt


def extract_only(master: str) -> None:
    """Subprocess mode: warm up (JVM JIT + Python worker spawn), then
    report the best of two steady-state runs — the throughput a
    long-running 100 TB job actually sees."""
    from octospark.session import get_spark

    spark = get_spark(app_name=f"bench-{master}", master=master,
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    path = stage_pages(spark)
    run_extraction(spark, path)  # warmup, untimed
    n, checksum, dt1 = run_extraction(spark, path)
    _, checksum2, dt2 = run_extraction(spark, path)
    assert checksum == checksum2
    print(json.dumps({"n": n, "checksum": checksum,
                      "sec": min(dt1, dt2)}))
    spark.stop()


def headline_queries(spark) -> dict:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    picks = [
        "agg_hash_groupby", "join_sortmerge_inner", "window_row_number",
        "dedup_exact", "dedup_minhash_lsh", "sim_ann_topk",
        "text_fingerprint", "stream_tumbling_window",
    ]
    out = {}
    for name in picks:
        t0 = time.time()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
    return out


def scaling_runs() -> dict:
    res = {}
    for n in (N_SMALL, N_BIG):
        env = dict(os.environ)
        env["OCTOSPARK_PAGES_MULT"] = str(PAGES_MULT)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--extract-only",
             f"local[{n}]"],
            capture_output=True, text=True, env=env, cwd=REPO,
        )
        line = p.stdout.strip().splitlines()[-1]
        res[n] = json.loads(line)
    t_small, t_big = res[N_SMALL]["sec"], res[N_BIG]["sec"]
    n_pages = res[N_BIG]["n"]
    thr_small = n_pages / t_small
    thr_big = n_pages / t_big
    eff = (thr_big / thr_small) / (N_BIG / N_SMALL)
    assert res[N_SMALL]["checksum"] == res[N_BIG]["checksum"], (
        "extraction checksum differs across parallelism!"
    )
    return {
        f"local[{N_SMALL}]": {"sec": round(t_small, 2),
                              "pages_per_sec": round(thr_small, 1)},
        f"local[{N_BIG}]": {"sec": round(t_big, 2),
                            "pages_per_sec": round(thr_big, 1)},
        "efficiency": round(eff, 3),
        "checksum_identical": True,
    }


def write_bench_md(result: dict) -> None:
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    lines = [
        "# BENCH — measured results\n",
        f"\n## run at sf={result['sf']} ({result['pages']} pages, "
        f"local[{CPUS}])\n\n",
        f"- extraction wall: {result['value']} s -> "
        f"**{result['pages_per_sec']} pages/sec**\n",
    ]
    if "scaling" in result:
        s = result["scaling"]
        lines += [
            f"- scaling: local[{N_SMALL}] {s[f'local[{N_SMALL}]']['pages_per_sec']} pages/s, "
            f"local[{N_BIG}] {s[f'local[{N_BIG}]']['pages_per_sec']} pages/s -> "
            f"**efficiency {s['efficiency']}** "
            f"(target >= 0.8 at 4x cores; byte-identical checksum across "
            f"both: {s['checksum_identical']})\n",
        ]
    lines.append("- headline queries (sec): "
                 + json.dumps(result["queries"]) + "\n")
    with open(path, "a") as f:
        f.writelines(lines)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--extract-only":
        extract_only(sys.argv[2])
        return

    from octospark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{CPUS}]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    pages_path = stage_pages(spark)
    run_extraction(spark, pages_path)  # warmup
    n, checksum, dt = run_extraction(spark, pages_path)
    queries = headline_queries(spark)
    result = {
        "metric": "extraction_wall_seconds",
        "value": round(dt, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_of(SF_DIR),
        "pages": n,
        "pages_per_sec": round(n / dt, 1),
        "checksum": checksum,
    }
    spark.stop()
    if os.environ.get("OCTOSPARK_SKIP_SCALING") != "1":
        result["scaling"] = scaling_runs()
    write_bench_md(result)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
