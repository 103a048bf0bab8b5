"""Laws for the round-5d keys (BFS layers, deletion vectors, CUSUM)
— each recomputed sequentially in Python at sf0.001."""

from __future__ import annotations

from collections import defaultdict

import octospark.relational as R
import octospark.textops as T
from octospark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_bfs_matches_sequential_frontier_expansion(spark):
    """Hop distances equal a sequential 4-round BFS over the same
    modular edge list, including NULL (= unreached) rows."""
    docs = [r.doc_id for r in load_table(spark, SF, "documents").collect()]
    n = len(docs)
    adj = defaultdict(set)
    for d in docs:
        for dst in ((d * 17 + 1) % n, (d * 31 + 7) % n, (d + 1) % n):
            adj[d].add(dst)
    dist = {d: 0 for d in docs if d % 97 == 0}
    frontier = set(dist)
    for hop in range(1, 5):
        nxt = {v for u in frontier for v in adj[u]} - set(dist)
        for v in nxt:
            dist[v] = hop
        frontier = nxt
    want = {(d, dist.get(d)) for d in docs}
    got = {
        (r.doc_id, r.hop)
        for r in T.QUERIES["graph_bfs_layers"](spark, SF).collect()
    }
    assert got == want


def test_bfs_hops_are_sound(spark):
    """Every hop-h>0 node has an in-neighbor at hop h-1, and every
    seed is at hop 0 (triangle-inequality soundness of the layers)."""
    rows = T.QUERIES["graph_bfs_layers"](spark, SF).collect()
    n = len(rows)
    hop = {r.doc_id: r.hop for r in rows}
    preds = defaultdict(set)
    for d in hop:
        for dst in ((d * 17 + 1) % n, (d * 31 + 7) % n, (d + 1) % n):
            preds[dst].add(d)
    for d, h in hop.items():
        if d % 97 == 0:
            assert h == 0
        elif h is not None:
            assert h >= 1
            assert any(hop[p] == h - 1 for p in preds[d])


def test_deletion_vectors_match_sequential_replay(spark):
    """Per-file counts, live-key checksum, and the rewrite verdict
    equal a sequential replay of the DV build + positional apply."""
    keys = sorted(
        r.o_orderkey for r in load_table(spark, SF, "orders").collect()
    )
    files = defaultdict(list)
    for k in keys:
        files[k // 1000].append(k)
    want = set()
    for fid, ks in files.items():
        dead = [k for k in ks if k % 13 == 3]
        live = [k for k in ks if k % 13 != 3]
        want.add(
            (fid, len(ks), len(dead), len(live), sum(live),
             5 * len(dead) >= len(ks))
        )
    got = {
        (r.file_id, r.n_rows, r.n_deleted, r.n_live, r.live_key_sum,
         r.rewrite)
        for r in R.QUERIES["table_deletion_vectors"](spark, SF).collect()
    }
    assert got == want


def test_cusum_matches_sequential_fold(spark):
    """Cusum values equal a sequential densified fold per type, and
    alarm fires iff cusum > max(4k, 4)."""
    ev = load_table(spark, SF, "events").collect()
    hourly = defaultdict(int)
    for e in ev:
        hourly[(e.event_type, e.ts.replace(minute=0, second=0,
                                           microsecond=0))] += 1
    by_type = defaultdict(dict)
    for (t, h), c in hourly.items():
        by_type[t][h] = c
    from datetime import timedelta

    want = set()
    for t, hs in by_type.items():
        lo, hi = min(hs), max(hs)
        series, h = [], lo
        while h <= hi:
            series.append((h, hs.get(h, 0)))
            h += timedelta(hours=1)
        k = sum(c for _h, c in series) // len(series)
        s = 0
        for h, c in series:
            s = max(0, s + (c - k))
            want.add(
                (t, h.strftime("%Y-%m-%d %H:%M:%S"), c, k, s,
                 s > max(4 * k, 4))
            )
    got = {
        (r.event_type, r.win_start, r.n, r.k, r.cusum, r.alarm)
        for r in R.QUERIES["events_cusum_changepoint"](spark, SF).collect()
    }
    assert got == want
