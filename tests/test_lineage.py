"""Resume/lineage tests (FIXTURES.md §D, SURVEY.md §5.2.4): commit k of
n buckets, rerun, assert only missing buckets recompute and the final
table equals the uninterrupted run."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from octospark.lineage import (
    committed_buckets,
    inspect,
    lineage_table,
    read_extracted,
    read_manifest,
    run_extract,
)

N_BUCKETS = 16


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "extracted")


def _texts(df):
    return {r["url"]: r["text"] for r in df.select("url", "text").collect()}


def test_full_run_commits_all_buckets(spark, pages, out_dir):
    m = run_extract(spark, pages, out_dir, n_buckets=N_BUCKETS)
    assert len(m["buckets"]) == N_BUCKETS
    got = read_extracted(spark, out_dir)
    assert got.count() == pages.count()
    ins = inspect(out_dir)
    assert ins["input_count"] == ins["output_count"] == pages.count()
    assert ins["error_count"] == 0


def test_resume_after_partial_commit(spark, pages, out_dir):
    # uninterrupted reference run
    ref_dir = out_dir + "_ref"
    run_extract(spark, pages, ref_dir, n_buckets=N_BUCKETS, run_id="ref")
    ref = _texts(read_extracted(spark, ref_dir))

    # crash after committing only 5 buckets
    run_extract(
        spark, pages, out_dir, n_buckets=N_BUCKETS, run_id="crashed",
        fail_after_buckets=5,
    )
    assert len(committed_buckets(out_dir)) == 5
    partial = read_extracted(spark, out_dir)
    assert 0 < partial.count() < pages.count()

    # resume: second run commits ONLY the missing 11 buckets
    m2 = run_extract(spark, pages, out_dir, n_buckets=N_BUCKETS,
                     run_id="resumed")
    assert len(m2["buckets"]) == N_BUCKETS
    resumed_buckets = [
        k for k, v in m2["buckets"].items() if v["run_id"] == "resumed"
    ]
    assert len(resumed_buckets) == N_BUCKETS - 5

    # final table equals the uninterrupted run, byte-for-byte
    got = _texts(read_extracted(spark, out_dir))
    assert got == ref

    # lineage checksums per bucket match the reference run exactly
    ref_m = read_manifest(ref_dir)
    for k, v in m2["buckets"].items():
        assert v["checksum"] == ref_m["buckets"][k]["checksum"], k
        assert v["output_count"] == ref_m["buckets"][k]["output_count"], k


def test_rerun_of_complete_output_is_noop(spark, pages, out_dir):
    run_extract(spark, pages, out_dir, n_buckets=N_BUCKETS, run_id="first")
    m = run_extract(spark, pages, out_dir, n_buckets=N_BUCKETS, run_id="again")
    assert all(v["run_id"] == "first" for v in m["buckets"].values())
    # no duplicate rows appended
    assert read_extracted(spark, out_dir).count() == pages.count()


def test_buckets_stable_across_parallelism(spark, pages, out_dir):
    # commit half at one parallelism, resume at another: still exactly-once
    run_extract(spark, pages.repartition(2), out_dir, n_buckets=N_BUCKETS,
                run_id="p2", fail_after_buckets=8)
    run_extract(spark, pages.repartition(13), out_dir, n_buckets=N_BUCKETS,
                run_id="p13")
    got = read_extracted(spark, out_dir)
    assert got.count() == pages.count()
    assert got.groupBy("url").count().filter("count != 1").count() == 0


def test_lineage_table_and_inspect(spark, pages, out_dir):
    run_extract(spark, pages, out_dir, n_buckets=N_BUCKETS, run_id="r1")
    lt = lineage_table(spark, out_dir)
    assert lt.count() == N_BUCKETS
    agg = lt.agg(
        F.sum("input_count").alias("i"), F.sum("output_count").alias("o")
    ).collect()[0]
    assert agg["i"] == agg["o"] == pages.count()
    ins = inspect(out_dir)
    assert ins["n_committed_buckets"] == N_BUCKETS
    assert ins["n_runs"] == 1


def test_manifest_commit_is_atomic(spark, pages, out_dir):
    run_extract(spark, pages, out_dir, n_buckets=N_BUCKETS)
    # no stray tmp files left behind
    leftovers = [f for f in os.listdir(out_dir) if ".tmp." in f]
    assert leftovers == []


def test_export_jsonl_and_parquet_roundtrip(spark, pages, out_dir):
    from octospark.lineage import export_extracted

    run_extract(spark, pages, out_dir, n_buckets=N_BUCKETS, run_id="rx")
    n = pages.count()
    dest_j = out_dir + "_jsonl"
    dest_p = out_dir + "_pq"
    assert export_extracted(spark, out_dir, dest_j, "jsonl") == n
    assert export_extracted(spark, out_dir, dest_p, "parquet") == n
    # text survives both sinks byte-identically
    golden = _texts(read_extracted(spark, out_dir))
    assert _texts(spark.read.json(dest_j)) == golden
    assert _texts(spark.read.parquet(dest_p)) == golden
    import pytest as _pytest

    with _pytest.raises(ValueError):
        export_extracted(spark, out_dir, out_dir + "_bad", "csv")


def test_run_extract_salted_and_max_bytes(spark, pages, out_dir):
    """The wired-through knobs: salted repartition preserves the
    byte-identical result; max_bytes guards rows into error outputs."""
    run_extract(spark, pages, out_dir, n_buckets=N_BUCKETS, run_id="rs",
                salted=True, salt_partitions=8)
    got = read_extracted(spark, out_dir)
    assert got.count() == pages.count()
    tiny = out_dir + "_tiny"
    run_extract(spark, pages, tiny, n_buckets=N_BUCKETS, run_id="rt",
                max_bytes=10)  # everything oversized
    g2 = read_extracted(spark, tiny)
    assert g2.filter("error = 'size_guard'").count() == pages.count()
    assert g2.filter("text != ''").count() == 0


def test_validation_cadence_kill_on_drift(spark, pages, out_dir):
    """R25: drift detected between chunk commits aborts the run; chunks
    committed before the drift survive in the manifest, and a healthy
    rerun resumes from them (never re-extracting committed buckets)."""
    from octospark.lineage import GoldenDriftError

    calls = []

    def drifting_validator():
        calls.append(1)
        return [] if len(calls) <= 2 else ["minimal: field 'text' drifted"]

    with pytest.raises(GoldenDriftError, match="drift"):
        run_extract(
            spark, pages, out_dir, n_buckets=N_BUCKETS,
            validate_every_k_buckets=4, validate_fn=drifting_validator,
        )
    # exactly the two healthy chunks (4 buckets each) were committed
    assert len(committed_buckets(out_dir)) == 8
    # "fixed engine" resumes: healthy validator, completes the rest
    m = run_extract(
        spark, pages, out_dir, n_buckets=N_BUCKETS,
        validate_every_k_buckets=4, validate_fn=lambda: [],
    )
    assert len(m["buckets"]) == N_BUCKETS
    assert read_extracted(spark, out_dir).count() == pages.count()


def test_validation_cadence_healthy_golden(spark, pages, out_dir):
    """The real golden validator passes against the frozen fixtures and
    a full run with cadence enabled commits everything."""
    import pathlib

    from octospark.validation import make_golden_validator
    from tests.fixtures.adversarial import CASES

    golden = str(
        pathlib.Path(__file__).resolve().parent / "fixtures/golden.json"
    )
    fn = make_golden_validator(CASES, golden)
    assert fn() == []
    m = run_extract(
        spark, pages, out_dir, n_buckets=N_BUCKETS,
        validate_every_k_buckets=8, validate_fn=fn,
    )
    assert len(m["buckets"]) == N_BUCKETS


def test_golden_validator_detects_corruption():
    """A tampered frozen expectation is reported as drift."""
    import json
    import pathlib

    from octospark.validation import golden_drift
    from tests.fixtures.adversarial import CASES

    golden = json.loads(
        (pathlib.Path(__file__).resolve().parent / "fixtures/golden.json")
        .read_text()
    )
    golden["minimal"]["text"] = "tampered"
    drift = golden_drift(CASES, golden)
    assert drift and "minimal" in drift[0]


def test_golden_drift_labels_known_loss_as_improvement():
    """Drift on a KNOWN_LOSS fixture is still reported (determinism
    contract: the frozen file must be refrozen) but labeled as a likely
    improvement, not a regression (ADVICE r2)."""
    import json
    import pathlib

    from octospark.validation import golden_drift
    from tests.fixtures.adversarial import CASES, KNOWN_LOSS

    golden = json.loads(
        (pathlib.Path(__file__).resolve().parent / "fixtures/golden.json")
        .read_text()
    )
    # simulate a stale frozen expectation on the known-loss fixture
    golden["content_inside_nav"]["text"] = "stale frozen loss"
    golden["minimal"]["text"] = "tampered"
    drift = golden_drift(CASES, golden, known_loss=KNOWN_LOSS)
    by_name = {d.split(":")[0]: d for d in drift}
    assert "refreeze" in by_name["content_inside_nav"]
    assert "known-loss" in by_name["content_inside_nav"]
    assert "refreeze" not in by_name["minimal"]


def test_run_id_reuse_after_abort_keeps_orphans_invisible(spark, pages,
                                                          out_dir):
    """ADVICE r2 (medium): an operator reruns with the SAME --run-id after
    a drift abort. The aborted attempt's data files (written before the
    drift raised, never manifest-committed) must not become visible as
    duplicates when the resume commits buckets under that run_id — the
    resume must get a per-attempt suffixed id."""
    from octospark.lineage import GoldenDriftError

    # attempt 1: chunk data files hit disk, then drift aborts before the
    # manifest records any bucket -> orphan files tagged run_id="op"
    with pytest.raises(GoldenDriftError):
        run_extract(
            spark, pages, out_dir, n_buckets=N_BUCKETS, run_id="op",
            validate_every_k_buckets=4, validate_fn=lambda: ["drift"],
        )
    assert committed_buckets(out_dir) == []
    data_dir = os.path.join(out_dir, "data")
    assert os.path.isdir(data_dir)  # orphans exist on disk

    # attempt 2: same operator, same run_id
    m = run_extract(spark, pages, out_dir, n_buckets=N_BUCKETS, run_id="op")
    assert len(m["buckets"]) == N_BUCKETS
    # the resume ran under a suffixed id, never the reused literal
    assert all(v["run_id"] == "op.2" for v in m["buckets"].values())
    assert m["attempts"] == ["op", "op.2"]
    # snapshot read sees exactly one row per url — orphans invisible
    got = read_extracted(spark, out_dir)
    assert got.count() == pages.count()
    assert got.groupBy("url").count().filter("count != 1").count() == 0


def test_choose_writer_branch(spark):
    """Iceberg append is selected only when a table is named AND an
    Iceberg catalog is configured; this sandbox has no jar, so the
    Parquet+manifest emulation must win even with a table name."""
    from octospark.lineage import choose_writer, have_iceberg

    assert have_iceberg(spark) is False
    assert choose_writer(spark, "cat.db.extracted") == "parquet"
    assert choose_writer(spark, None) == "parquet"

    class _Conf:
        def get(self, key, default=None):
            return "org.apache.iceberg.spark.SparkCatalog"

    class _FakeSpark:
        conf = _Conf()

    assert have_iceberg(_FakeSpark()) is True
    assert choose_writer(_FakeSpark(), "cat.db.extracted") == "iceberg"
    assert choose_writer(_FakeSpark(), None) == "parquet"


def test_write_chunk_routes_to_iceberg_append(spark):
    """The Iceberg data-append arm (VERDICT r2 #4): _write_chunk must
    route through writeTo(table).append() when the writer is 'iceberg',
    and never touch the Parquet sink. Exercised with a stub frame since
    the sandbox has no Iceberg jar — the branch logic and call chain are
    what this pins."""
    from octospark.lineage import _write_chunk

    calls = []

    class _Writer:
        def __init__(self, table):
            self.table = table

        def append(self):
            calls.append(("append", self.table))

    class _StubFrame:
        def filter(self, _cond):
            return self

        def withColumn(self, _name, _col):
            return self

        def writeTo(self, table):
            calls.append(("writeTo", table))
            return _Writer(table)

        @property
        def write(self):  # the parquet arm must never be reached
            raise AssertionError("parquet sink used on the iceberg arm")

    _write_chunk(
        _StubFrame(), keys=[1, 2], run_id="r", out_dir="/nowhere",
        writer="iceberg", iceberg_table="cat.db.extracted",
    )
    assert calls == [
        ("writeTo", "cat.db.extracted"), ("append", "cat.db.extracted")
    ]


def test_read_extracted_prunes_partitions_at_scan(spark, pages, out_dir):
    """The committed-bucket filter must reach the scan as a partition
    filter (bucket dirs are partitionBy(part_key)), so a resume/export
    over a 10^12-row table reads only committed directories."""
    run_extract(spark, pages, out_dir, n_buckets=N_BUCKETS,
                fail_after_buckets=4)
    df = read_extracted(spark, out_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "part_key" in plan.split("PartitionFilters:")[1][:200]
    # and only the 4 committed buckets' rows come back
    keys = {r.part_key for r in df.select("part_key").distinct().collect()}
    assert keys == set(committed_buckets(out_dir)) and len(keys) == 4


def test_compact_run_collapses_files_and_removes_orphans(spark, pages,
                                                         out_dir):
    """Compaction (Iceberg rewrite_data_files + expire_snapshots analog):
    build a resume-heavy table — aborted attempt (orphan files) + two
    committed generations — then compact and assert (a) the visible
    snapshot is byte-identical, (b) the file count collapses, (c) orphan
    and superseded files are gone, (d) lineage history records the
    compaction."""
    import glob

    from octospark.lineage import compact_run

    from octospark.lineage import GoldenDriftError

    # aborted attempt: drift fires AFTER the first 4-bucket chunk's data
    # files land but BEFORE their manifest commit -> true orphans
    calls = {"n": 0}

    def drift_once():
        calls["n"] += 1
        return ["synthetic drift"] if calls["n"] == 1 else []

    with pytest.raises(GoldenDriftError):
        run_extract(spark, pages, out_dir, n_buckets=N_BUCKETS,
                    run_id="gen", validate_every_k_buckets=4,
                    validate_fn=drift_once)
    # resume with the SAME caller id (auto-suffixed) commits everything
    run_extract(spark, pages, out_dir, n_buckets=N_BUCKETS, run_id="gen")
    before = read_extracted(spark, out_dir)
    want = _texts(before)
    files_before = glob.glob(os.path.join(out_dir, "data", "*", "*.parquet"))
    assert len(files_before) > N_BUCKETS  # multiple generations exist

    res = compact_run(spark, out_dir)
    assert res["run_id"].startswith("compact-")
    assert res["old_files_removed"] == len(files_before)

    files_after = glob.glob(os.path.join(out_dir, "data", "*", "*.parquet"))
    assert set(files_after).isdisjoint(files_before)
    assert len(files_after) <= N_BUCKETS  # one file per bucket generation
    got = read_extracted(spark, out_dir)
    assert _texts(got) == want
    # every committed bucket now points at the compaction run_id and the
    # history records a compaction entry
    m = read_manifest(out_dir)
    assert all(v["run_id"] == res["run_id"] for v in m["buckets"].values())
    assert any(e.get("compaction") for e in m["run_ids"])
    # idempotent: compacting a compacted table keeps the snapshot
    res2 = compact_run(spark, out_dir)
    assert _texts(read_extracted(spark, out_dir)) == want
    assert res2["files_after"] <= N_BUCKETS


def test_compact_run_verify_aborts_on_divergence(spark, pages, out_dir,
                                                 monkeypatch):
    """A rewrite that fails to reproduce the committed lineage must
    abort BEFORE the manifest swap: old snapshot intact, new files
    deleted."""
    import glob

    import octospark.lineage as lin

    run_extract(spark, pages, out_dir, n_buckets=N_BUCKETS)
    want = _texts(read_extracted(spark, out_dir))
    m_before = read_manifest(out_dir)

    real_read = lin.read_extracted

    def corrupted_read(spark_, out_dir_):
        # drop one row: per-bucket count/checksum can no longer match
        df = real_read(spark_, out_dir_)
        victim = df.select("url").limit(1).collect()[0]["url"]
        return df.filter(F.col("url") != victim)

    monkeypatch.setattr(lin, "read_extracted", corrupted_read)
    with pytest.raises(RuntimeError, match="compaction verify failed"):
        lin.compact_run(spark, out_dir)
    monkeypatch.undo()

    # snapshot unchanged, no stray uncommitted generation left behind
    assert _texts(read_extracted(spark, out_dir)) == want
    m_after = read_manifest(out_dir)
    assert m_after["buckets"] == m_before["buckets"]
    files = glob.glob(os.path.join(out_dir, "data", "*", "*.parquet"))
    got = read_extracted(spark, out_dir)
    assert got.count() == len(want)
    assert len(files) >= N_BUCKETS
