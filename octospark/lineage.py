"""Lineage + idempotent commit + resume — the Iceberg-snapshot analog.

No Iceberg/Delta jar exists in this environment (SURVEY.md §7.0), so
snapshot semantics are implemented over plain Parquet with an atomic
JSON manifest commit log (write-tmp + os.replace = atomic rename),
mirroring what an Iceberg table commit gives us. When a Spark catalog
with Iceberg support is configured AND the caller passes
``iceberg_table=``, :func:`choose_writer` flips :func:`run_extract`'s
data append to a real ``writeTo(table).append()`` — same interface
(the branch is unit-tested against a mocked catalog conf; the jar
itself is absent in this sandbox).

Reference analogs:
- per-partition checkpointing  <- ModelCheckpoint top-k
  (/root/reference/src/octopy/train.py:80-87)
- crash-safe commit            <- on-exception checkpoint
  (/root/reference/src/octopy/train.py:76-79)
- resume-from-checkpoint       <- load_from_checkpoint + --resume
  (/root/reference/src/octopy/train.py:89-97,140-162)
- inspect                      <- model metadata dump
  (/root/reference/src/octopy/cli/inspect.py:38-69)

The unit of commit is a **stable bucket**: ``part_key =
pmod(xxhash64(url), n_buckets)``. Task partition ids change with
parallelism; url-hash buckets don't (SURVEY.md §7.3), so a run at
local[8] can resume work committed at local[32].

Checksum note: the design doc asks for sha256 of concatenated sorted
output bytes; at 10^12 rows concatenating a bucket on one node is not
scalable, so the lineage checksum is the order-independent
``bit_xor(xxhash64(url, text))`` per bucket — computable as a streaming
aggregate with map-side partial combine, still detects any changed /
missing / duplicated row.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 64

LINEAGE_COLS = (
    "part_key", "input_count", "output_count", "error_count", "checksum"
)


class GoldenDriftError(RuntimeError):
    """Raised by run_extract's validation cadence when the live extractor
    no longer reproduces the frozen golden fixtures (R25 analog:
    val_check_interval, reference src/octopy/train.py:71-74)."""


def have_iceberg(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is configured (jar present)."""
    try:
        return bool(
            spark.conf.get("spark.sql.catalog.spark_catalog", None)
            and "iceberg" in str(spark.conf.get(
                "spark.sql.catalog.spark_catalog")).lower()
        )
    except Exception:
        return False


def choose_writer(spark: SparkSession, iceberg_table: str | None) -> str:
    """Writer branch selection: 'iceberg' only when the caller named a
    table AND an Iceberg catalog is actually configured; otherwise the
    Parquet+manifest snapshot emulation. Factored out so the branch is
    unit-testable without an Iceberg jar."""
    return "iceberg" if (iceberg_table and have_iceberg(spark)) else "parquet"


def _write_chunk(
    extracted: DataFrame,
    keys: list,
    run_id: str,
    out_dir: str,
    writer: str,
    iceberg_table: str | None,
) -> None:
    """Append one chunk of buckets to the sink. Iceberg appends are
    snapshot-committed by the table itself; the Parquet path relies on
    the JSON manifest committed by the caller afterwards."""
    chunk = extracted.filter(F.col("part_key").isin(keys)).withColumn(
        "run_id", F.lit(run_id)
    )
    if writer == "iceberg":
        # routing unit-tested with a stub frame (tests/test_lineage.py);
        # the real append needs the Iceberg jar, absent in this sandbox
        chunk.writeTo(iceberg_table).append()
    else:
        (
            chunk.write.partitionBy("part_key")
            .mode("append")
            .parquet(os.path.join(out_dir, "data"))
        )


def with_part_key(df: DataFrame, n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    return df.withColumn(
        "part_key", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
    )


# --- manifest (commit log) ---------------------------------------------------

def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest.json")


def read_manifest(out_dir: str) -> dict:
    path = _manifest_path(out_dir)
    if not os.path.exists(path):
        return {"run_ids": [], "buckets": {}, "attempts": []}
    with open(path) as f:
        m = json.load(f)
    m.setdefault("attempts", [])
    return m


def commit_manifest(out_dir: str, manifest: dict) -> None:
    """Atomic manifest replace (tmp write + rename) — the snapshot
    commit. A crash before the rename leaves the previous snapshot
    intact; data files not in the manifest are invisible to readers."""
    tmp = _manifest_path(out_dir) + f".tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(out_dir))


def committed_buckets(out_dir: str) -> list:
    return sorted(int(k) for k in read_manifest(out_dir)["buckets"])


# --- run --------------------------------------------------------------------

def run_extract(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    n_buckets: int = DEFAULT_BUCKETS,
    run_id: str | None = None,
    fail_after_buckets: int | None = None,
    max_bytes: int | None = None,
    salted: bool = False,
    salt_partitions: int | None = None,
    detect_skew: bool = False,
    iceberg_table: str | None = None,
    validate_every_k_buckets: int | None = None,
    validate_fn=None,
) -> dict:
    """Extract with per-bucket lineage + idempotent commit.

    Buckets already in the manifest are skipped (anti-join semantics —
    done with a pushed-down NOT IN filter on the int bucket key, which
    Catalyst evaluates at the scan). ``fail_after_buckets`` simulates a
    crash after committing only k buckets (for resume tests).

    ``iceberg_table``: when set AND an Iceberg catalog is configured
    (:func:`have_iceberg`), data appends go to that table instead of the
    Parquet emulation; lineage manifest semantics are unchanged.

    ``validate_every_k_buckets`` + ``validate_fn`` (R25 validation
    cadence, reference train.py:71-74): commits happen in chunks of k
    buckets, and between chunk commits ``validate_fn()`` is called — it
    returns a list of drift messages (empty = healthy). On drift the run
    aborts with :class:`GoldenDriftError`; chunks committed before the
    drift stay in the manifest, so a fixed engine resumes from there
    instead of re-extracting 10^12 rows. ``validate_fn`` alone (cadence
    None) means one final pre-commit validation.

    Returns the updated manifest dict.
    """
    from octospark import MAX_HTML_BYTES
    from octospark.pipeline import extract_pages

    if max_bytes is None:
        max_bytes = MAX_HTML_BYTES
    os.makedirs(out_dir, exist_ok=True)
    manifest = read_manifest(out_dir)
    done = set(int(k) for k in manifest["buckets"])

    keyed = with_part_key(pages, n_buckets)
    todo_keys = [k for k in range(n_buckets) if k not in done]
    if not todo_keys:
        return manifest

    # Every attempt (even one that later crashes before committing any
    # bucket) is registered in the manifest BEFORE any data file is
    # written. A caller-supplied run_id that was already attempted gets a
    # per-attempt suffix, so orphan parquet files left by an aborted
    # attempt can never share a (part_key, run_id) pair with a later
    # resume — read_extracted's pair filter keeps them invisible.
    base = run_id or uuid.uuid4().hex[:12]
    run_id, attempt = base, 2
    while run_id in manifest["attempts"]:
        run_id = f"{base}.{attempt}"
        attempt += 1
    manifest["attempts"].append(run_id)
    commit_manifest(out_dir, manifest)

    todo = keyed.filter(F.col("part_key").isin(todo_keys))
    input_counts = {
        int(r["part_key"]): int(r["n"])
        for r in todo.groupBy("part_key").agg(F.count("*").alias("n")).collect()
    }

    skewed_hosts = None
    if salted and detect_skew:
        # first-pass giant-host census (url-only column-pruned scan);
        # see tests/test_pipeline.py::test_skewed_host_branch_spreads_
        # giant_host for the partition-spread guarantee it buys
        from octospark.pipeline import find_skewed_hosts

        skewed_hosts = find_skewed_hosts(todo) or None
    extracted = extract_pages(
        todo.drop("part_key"),
        max_bytes=max_bytes,
        salted=salted,
        num_partitions=salt_partitions,
        skewed_hosts=skewed_hosts,
    )
    writer = choose_writer(spark, iceberg_table)
    extracted = with_part_key(extracted, n_buckets).persist()
    total_committed = 0
    try:
        lineage_rows = {
            int(r["part_key"]): r
            for r in extracted.groupBy("part_key")
            .agg(
                F.count("*").alias("output_count"),
                F.sum(
                    F.when(F.col("error").isNotNull(), 1).otherwise(0)
                ).alias("error_count"),
                F.bit_xor(F.xxhash64("url", "text")).alias("checksum"),
            )
            .collect()
        }

        # write data files under bucket=K dirs (partition pruning on read)
        commit_keys = sorted(input_counts)
        if fail_after_buckets is not None:
            commit_keys = commit_keys[:fail_after_buckets]
        chunk_size = validate_every_k_buckets or len(commit_keys) or 1
        for i in range(0, len(commit_keys), chunk_size):
            chunk_keys = commit_keys[i : i + chunk_size]
            _write_chunk(
                extracted, chunk_keys, run_id, out_dir, writer, iceberg_table
            )
            if validate_fn is not None:
                drift = validate_fn()
                if drift:
                    raise GoldenDriftError(
                        f"golden fixture drift after "
                        f"{total_committed} committed buckets: "
                        + "; ".join(str(d) for d in drift[:5])
                    )
            now = time.time()
            for k in chunk_keys:
                r = lineage_rows.get(k)
                manifest["buckets"][str(k)] = {
                    "run_id": run_id,
                    "input_count": input_counts.get(k, 0),
                    "output_count": int(r["output_count"]) if r else 0,
                    "error_count": int(r["error_count"]) if r else 0,
                    "checksum": int(r["checksum"]) if r else 0,
                    "committed_at": now,
                }
            total_committed += len(chunk_keys)
            manifest["run_ids"].append(
                {"run_id": run_id, "committed_buckets": total_committed,
                 "committed_at": now}
            )
            # collapse per-chunk entries of this run into one history row
            manifest["run_ids"] = [
                e for e in manifest["run_ids"]
                if e["run_id"] != run_id
            ] + [manifest["run_ids"][-1]]
            commit_manifest(out_dir, manifest)
    finally:
        extracted.unpersist()

    return manifest


def read_extracted(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read back only committed data (snapshot isolation). The filter is
    on the manifest's (part_key, run_id) PAIRS, not part_key alone: an
    aborted run (crash or validation drift after data write, before
    manifest commit) leaves orphan files in a bucket dir, and that bucket
    may later be committed by a resume run under a different run_id — the
    orphans must stay invisible, exactly like data files absent from an
    Iceberg manifest. part_key isin() additionally prunes bucket dirs at
    the scan; the broadcast semi-join enforces the pair match."""
    m = read_manifest(out_dir)
    pairs = [(int(k), v["run_id"]) for k, v in m["buckets"].items()]
    df = spark.read.parquet(os.path.join(out_dir, "data"))
    committed = spark.createDataFrame(
        pairs, "part_key int, run_id string"
    )
    return df.filter(
        F.col("part_key").isin([p for p, _ in pairs])
    ).join(F.broadcast(committed), ["part_key", "run_id"], "left_semi")


EXPORT_FORMATS = ("parquet", "jsonl")


def export_extracted(
    spark: SparkSession, out_dir: str, dest: str, fmt: str = "parquet"
) -> int:
    """Final-artifact export (R28 analog: safetensors/coreml conversion,
    reference src/octopy/train.py:171-183): rewrite the committed
    snapshot as plain Parquet or JSONL. Spans serialize natively in both
    (JSONL via Spark's json sink). Returns the exported row count."""
    if fmt not in EXPORT_FORMATS:
        raise ValueError(f"fmt must be one of {EXPORT_FORMATS}")
    df = read_extracted(spark, out_dir).drop("part_key", "run_id")
    # count the frame we write, not the sink: re-reading an empty JSONL
    # dataset raises (no data files to infer a schema from)
    df = df.persist()
    try:
        n = df.count()
        if fmt == "jsonl":
            df.write.mode("overwrite").json(dest)
        else:
            df.write.mode("overwrite").parquet(dest)
    finally:
        df.unpersist()
    return n


def lineage_table(spark: SparkSession, out_dir: str) -> DataFrame:
    """Lineage rows as a DataFrame (the `inspect` surface)."""
    m = read_manifest(out_dir)
    rows = [
        (
            int(k), v["run_id"], v["input_count"], v["output_count"],
            v["error_count"], v["checksum"], float(v["committed_at"]),
        )
        for k, v in sorted(m["buckets"].items(), key=lambda kv: int(kv[0]))
    ]
    return spark.createDataFrame(
        rows,
        "part_key int, run_id string, input_count long, output_count long, "
        "error_count long, checksum long, committed_at double",
    )


def compact_run(
    spark: SparkSession, out_dir: str, n_buckets: int | None = None
) -> dict:
    """Snapshot-preserving compaction + orphan GC — the Iceberg
    ``rewrite_data_files`` + ``expire_snapshots`` analog, and the
    maintenance op a resume-heavy 10^12-row table needs: every aborted
    attempt leaves orphan parquet files, every resume run adds another
    file generation per bucket, and at 100 TB the accumulated small
    files dominate scan planning time.

    Protocol (crash-safe at every step):

    1. read the committed snapshot (:func:`read_extracted` pair
       semantics — orphans are invisible by construction);
    2. rewrite it under a fresh ``compact-*`` run_id, one shuffle
       partition per bucket (``repartition(part_key)``) so each bucket
       lands as a single file per generation;
    3. VERIFY the rewrite: per-bucket output_count and the
       order-independent ``bit_xor(xxhash64(url, text))`` checksum of
       the new files must equal the manifest's committed lineage —
       a compaction that changed any row aborts and the old snapshot
       stays live;
    4. atomically commit a manifest pointing every bucket at the
       compaction run_id (crash before this leaves the new files as
       invisible orphans; the next compaction collects them);
    5. GC: delete every data file that predates the rewrite — each is
       now either superseded (was committed, rewritten in step 2) or a
       true orphan from an aborted attempt (crash mid-delete is safe:
       leftover old files stay invisible to the pair filter).

    Returns {"files_before", "files_after", "old_files_removed",
    "run_id"}.
    """
    import glob

    m = read_manifest(out_dir)
    if not m["buckets"]:
        return {"files_before": 0, "files_after": 0,
                "old_files_removed": 0, "run_id": None}
    data_dir = os.path.join(out_dir, "data")
    old_files = set(glob.glob(os.path.join(data_dir, "*", "*.parquet")))

    base = f"compact-{uuid.uuid4().hex[:12]}"
    run_id, attempt = base, 2
    while run_id in m["attempts"]:  # pragma: no cover — uuid collision
        run_id = f"{base}.{attempt}"
        attempt += 1
    m["attempts"].append(run_id)
    commit_manifest(out_dir, m)

    snapshot = read_extracted(spark, out_dir).withColumn(
        "run_id", F.lit(run_id)
    )
    n_active = len(m["buckets"])
    (
        snapshot.repartition(n_active, "part_key")
        .write.partitionBy("part_key")
        .mode("append")
        .parquet(data_dir)
    )

    # verify the rewrite against committed lineage before the swap
    new_files = [
        f for f in glob.glob(os.path.join(data_dir, "*", "*.parquet"))
        if f not in old_files
    ]
    rewritten = spark.read.option("basePath", data_dir).parquet(*new_files)
    got = {
        int(r["part_key"]): r
        for r in rewritten.groupBy("part_key")
        .agg(
            F.count("*").alias("output_count"),
            F.bit_xor(F.xxhash64("url", "text")).alias("checksum"),
        )
        .collect()
    }
    for k, v in m["buckets"].items():
        r = got.get(int(k))
        ok = (
            r is not None
            and int(r["output_count"]) == v["output_count"]
            and int(r["checksum"]) == v["checksum"]
        ) or (r is None and v["output_count"] == 0)
        if not ok:
            for f in new_files:  # abort: old snapshot stays live
                os.remove(f)
            raise RuntimeError(
                f"compaction verify failed for bucket {k}: rewrite does "
                f"not reproduce committed lineage — snapshot unchanged"
            )

    now = time.time()
    for v in m["buckets"].values():
        v["run_id"] = run_id
        v["compacted_at"] = now
    m["run_ids"].append(
        {"run_id": run_id, "committed_buckets": len(m["buckets"]),
         "committed_at": now, "compaction": True}
    )
    commit_manifest(out_dir, m)

    removed = 0
    for f in old_files:
        if os.path.exists(f):
            os.remove(f)
            removed += 1
    return {
        "files_before": len(old_files),
        "files_after": len(new_files),
        "old_files_removed": removed,
        "run_id": run_id,
    }


def inspect(out_dir: str) -> dict:
    """JSON metadata dump (analog of `octopy inspect`)."""
    m = read_manifest(out_dir)
    buckets = m["buckets"]
    return {
        "out_dir": out_dir,
        "n_runs": len(m["run_ids"]),
        "runs": m["run_ids"],
        "n_committed_buckets": len(buckets),
        "input_count": sum(b["input_count"] for b in buckets.values()),
        "output_count": sum(b["output_count"] for b in buckets.values()),
        "error_count": sum(b["error_count"] for b in buckets.values()),
    }
