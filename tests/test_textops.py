"""Tests for the training-data pipeline operators (octospark.textops):
recall guarantees for the dedup family and determinism of signatures.

The MinHash/LSH plan is asserted shuffle-lean: the signature stage must
reuse the up-front repartition(doc_id) for both the window and the
aggregation (exactly one Exchange below the signature aggregate).
"""

from __future__ import annotations

import octospark.textops as T


def test_minhash_lsh_recalls_injected_duplicates(spark, sf_dir):
    df = T.QUERIES["dedup_minhash_lsh"](spark, sf_dir)
    got = {(r.id1, r.id2) for r in df.collect()}
    # injected exact copies (doc_id+100000 of doc_id<50) must all be
    # candidate pairs: identical text -> identical signature -> every
    # band collides.
    missing = [i for i in range(50) if (i, i + 100000) not in got]
    assert not missing, f"missed injected dups: {missing}"


def test_minhash_lsh_deterministic_across_partitioning(spark, sf_dir):
    a = {tuple(r) for r in T.QUERIES["dedup_minhash_lsh"](spark, sf_dir).collect()}
    b = {
        tuple(r)
        for r in T.QUERIES["dedup_minhash_lsh"](spark, sf_dir)
        .repartition(1)
        .collect()
    }
    assert a == b


def test_minhash_signature_stage_single_shuffle(spark, sf_dir):
    df = T.QUERIES["dedup_minhash_lsh"](spark, sf_dir)
    df.count()  # let AQE finalize
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Per join side: exactly one repartition exchange (doc_id), reused
    # by window + aggregation; the band-bucket join must be broadcast.
    # (AQE dedups the two identical sides into a ReusedExchange when
    # stage timing allows — best-effort, so we assert <= 2, not 1.)
    n_shuffle = plan.count("Exchange hashpartitioning")
    assert n_shuffle <= 2, plan
    assert "BroadcastHashJoin" in plan, plan
    # the signature stage must NOT add its own aggregate exchange on
    # top of the repartition (distribution reuse)
    assert "hashpartitioning(doc_id" in plan and "REPARTITION_BY_NUM" in plan


def test_exact_dedup_groups_identical_text(spark, sf_dir):
    rows = T.QUERIES["dedup_exact"](spark, sf_dir).collect()
    # every group keeps its minimum doc_id and counts >= 1
    assert all(r.n_dups >= 1 for r in rows)
    total = sum(r.n_dups for r in rows)
    from octospark.sources import load_table

    assert total == load_table(spark, sf_dir, "documents").count()


def test_embedding_cosine_finds_injected_copies(spark, sf_dir):
    got = {
        (r.id1, r.id2)
        for r in T.QUERIES["dedup_embedding_cosine"](spark, sf_dir).collect()
    }
    missing = [i for i in range(20) if (i, i + 10000) not in got]
    assert not missing, f"missed injected embedding dups: {missing}"


def test_sim_ann_topk_rank1_is_query_vector(spark, sf_dir):
    rows = T.QUERIES["sim_ann_topk"](spark, sf_dir).collect()
    by_rank = {r.rank: r for r in rows}
    assert by_rank[1].vec_id == 0  # self-similarity = 1.0
    assert abs(by_rank[1].sim - 1.0) < 1e-6
    sims = [by_rank[k].sim for k in sorted(by_rank)]
    assert sims == sorted(sims, reverse=True)


def test_simhash_deterministic(spark, sf_dir):
    a = {tuple(r) for r in T.QUERIES["dedup_simhash"](spark, sf_dir).collect()}
    b = {tuple(r) for r in T.QUERIES["dedup_simhash"](spark, sf_dir).collect()}
    assert a == b
    # identical texts must get identical simhash
    sh = {r[0]: r[1] for r in a}
    from octospark.sources import load_table

    texts = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    by_text: dict = {}
    for did, txt in texts.items():
        by_text.setdefault(txt, []).append(did)
    for ids in by_text.values():
        assert len({sh[i] for i in ids}) == 1
