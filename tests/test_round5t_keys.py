"""Laws for the round-5t keys (modularity score, reciprocal-rank
fusion) — recomputed sequentially at sf0.001."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import octospark.textops as T
from octospark.sources import load_table

SF = "/root/testdata/sf0.001"


def _und_edges(docs):
    n = len(docs)
    und = set()
    for d in docs:
        for dst in ((d * 17 + 1) % n, (d * 31 + 7) % n, (d + 1) % n):
            und.add((d, dst))
            und.add((dst, d))
    return und


def test_modularity_matches_sequential_recompute(spark):
    """Per-community rows equal a sequential LPA(2) + modularity-term
    recompute; total contribution stays within the [-(2m)^2, (2m)^2]
    modularity bounds."""
    docs = [
        r.doc_id for r in load_table(spark, SF, "documents").collect()
    ]
    und = _und_edges(docs)
    adj = defaultdict(list)
    for a, b in und:
        adj[a].append(b)
    labels = {d: d for d in docs}
    for _ in range(2):
        new = {}
        for v in docs:
            votes = Counter(labels[u] for u in adj[v])
            best = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
            new[v] = best[0]
        labels = new
    m2 = len(und)
    deg = Counter(a for a, _ in und)
    comm = defaultdict(list)
    for v, l_ in labels.items():
        comm[l_].append(v)
    want = set()
    for l_, members in comm.items():
        ms = set(members)
        in_pairs = sum(
            1 for a, b in und if a in ms and b in ms
        )
        d_c = sum(deg[v] for v in members)
        want.add(
            (l_, len(members), in_pairs, d_c, m2 * in_pairs - d_c * d_c)
        )
    got = {
        tuple(r)
        for r in T.QUERIES["graph_modularity_score"](
            spark, SF
        ).collect()
    }
    assert got == want
    total = sum(r[4] for r in got)
    assert -(m2 * m2) <= total <= m2 * m2


def test_rrf_matches_sequential_fusion(spark):
    """Fused top-5 equals a numpy recompute of cosine + dot rankings
    fused with floored 1e6/(60+rank) units."""
    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_table(spark, SF, "embeddings").collect()
    }

    def fold_dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    want = set()
    for qid in range(8):
        qv = emb[qid]
        q2 = fold_dot(qv, qv)
        rows = []
        for vid, v in emb.items():
            if vid == qid:
                continue
            dot = fold_dot(v, qv)
            n2 = fold_dot(v, v)
            rows.append((vid, dot, dot / math.sqrt(n2 * q2)))
        by_cos = sorted(rows, key=lambda r: (-r[2], r[0]))
        by_dot = sorted(rows, key=lambda r: (-r[1], r[0]))
        fused = defaultdict(lambda: [0, 0])
        for ranking in (by_cos, by_dot):
            for rank, (vid, *_py) in enumerate(ranking[:10], 1):
                fused[vid][0] += 1_000_000 // (60 + rank)
                fused[vid][1] += 1
        top = sorted(
            fused.items(), key=lambda kv: (-kv[1][0], kv[0])
        )[:5]
        for rank, (vid, (score, nl)) in enumerate(top, 1):
            want.add((qid, rank, vid, score, nl))
    got = {
        tuple(r)
        for r in T.QUERIES["sim_reciprocal_rank_fusion"](
            spark, SF
        ).collect()
    }
    assert got == want
    # consensus property: every fused score is one or two RRF terms
    for _, _, _, score, nl in got:
        assert nl in (1, 2)
