"""End-to-end test of the corpus-assembly job (jobs/corpus.py)."""

from __future__ import annotations

import collections
import glob
import json
import os

import duckdb

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_corpus_job_end_to_end(spark, tmp_path):
    from jobs.corpus import assemble_corpus

    budget = 2000
    flags, shards = assemble_corpus(
        spark, SF, budget=budget, contam_max=0.5, sample_denom=10
    )
    frow = flags.agg(
        {"doc_id": "count"}
    ).collect()[0][0]
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/documents.parquet'"
    ).fetchone()[0]
    assert frow == n_docs  # one flag row per input doc, never-drop

    rows = shards.collect()
    assert rows
    # funnel monotone: survivors >= sampled; no held-out benchmark doc
    # (doc_id % 97 == 0) ever ships
    surv = flags.filter("survives").count()
    assert len(rows) <= surv
    assert all(r["doc_id"] % 97 != 0 for r in rows)
    # shard token mass: each (lang, shard) under budget + one doc
    mass: dict = collections.defaultdict(int)
    maxtok: dict = collections.defaultdict(int)
    for r in rows:
        k = (r["lang"], r["shard_id"])
        mass[k] += r["n_tokens"]
        maxtok[k] = max(maxtok[k], r["n_tokens"])
    for k, m in mass.items():
        assert m < budget + maxtok[k], k


def test_corpus_job_cli_writes_manifest_and_shards(spark, tmp_path):
    # drive the real CLI surface (argparse -> write -> manifest)
    from jobs.corpus import main

    out = str(tmp_path / "corpus_out")
    rc = main(["--sf-dir", SF, "--out", out, "--budget", "2000"])
    assert rc == 0
    man = json.load(open(os.path.join(out, "_corpus_manifest.json")))
    f = man["funnel"]
    assert (
        f["input"] >= f["after_dedup"] >= f["after_decontam"]
        >= f["after_quality"] >= f["sampled"] > 0
    )
    files = glob.glob(os.path.join(out, "shards", "**", "*.parquet"),
                      recursive=True)
    assert files
    got = duckdb.sql(
        f"SELECT count(*), count(DISTINCT doc_id) FROM "
        f"read_parquet({files!r}, hive_partitioning=true)"
    ).fetchone()
    assert got[0] == got[1] == f["sampled"]


def test_corpus_job_classifier_gate_tightens_funnel(spark, tmp_path):
    """--classifier-gate adds the trained-model stage: after_classifier
    is monotone inside the funnel, the manifest gains the stage, and
    the shipped docs are exactly the fully-gated survivors."""
    from jobs.corpus import main

    out = str(tmp_path / "corpus_clf")
    rc = main(["--sf-dir", SF, "--out", out, "--classifier-gate"])
    assert rc == 0
    man = json.load(open(os.path.join(out, "_corpus_manifest.json")))
    f = man["funnel"]
    assert (
        f["after_quality"] >= f["after_classifier"] >= f["sampled"] > 0
    )
    # un-gated run for comparison: same rule funnel, no clf stage
    out2 = str(tmp_path / "corpus_plain")
    assert main(["--sf-dir", SF, "--out", out2]) == 0
    man2 = json.load(open(os.path.join(out2, "_corpus_manifest.json")))
    assert "after_classifier" not in man2["funnel"]
    assert man2["funnel"]["after_quality"] == f["after_quality"]
