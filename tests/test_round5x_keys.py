"""Laws for the round-5x key (two-hop reach) — recomputed
sequentially at sf0.001."""

from __future__ import annotations

from collections import defaultdict

import octospark.textops as T
from octospark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_two_hop_reach_matches_sequential_bfs(spark):
    """n_reach2 equals |ball(v, 2)| - 1 from a sequential adjacency
    expansion, and always >= the node's 1-hop out-neighborhood
    (minus self)."""
    docs = [
        r.doc_id for r in load_table(spark, SF, "documents").collect()
    ]
    n = len(docs)
    adj = defaultdict(set)
    for d in docs:
        for dst in ((d * 17 + 1) % n, (d * 31 + 7) % n, (d + 1) % n):
            adj[d].add(dst)
    want = {}
    for v in docs:
        ball = set(adj[v])
        for u in adj[v]:
            ball |= adj[u]
        ball.discard(v)
        if ball:
            want[v] = len(ball)
    got = {
        r.node: r.n_reach2
        for r in T.QUERIES["graph_two_hop_reach"](spark, SF).collect()
    }
    assert got == want
    for v, nr in got.items():
        assert nr >= len(adj[v] - {v})
