"""Laws for the round-5g keys (IVM merge, SCC pivot, spam-farm score)
— each recomputed sequentially in Python at sf0.001."""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import datetime

import octospark.relational as R
import octospark.textops as T
from octospark.sources import load_table

SF = "/root/testdata/sf0.001"


def _adj(docs):
    n = len(docs)
    fwd, bwd = defaultdict(set), defaultdict(set)
    for d in docs:
        for dst in ((d * 17 + 1) % n, (d * 31 + 7) % n, (d + 1) % n):
            fwd[d].add(dst)
            bwd[dst].add(d)
    return fwd, bwd


def _bfs(adj, seeds, iters):
    dist = {s: 0 for s in seeds}
    frontier = set(dist)
    for hop in range(1, iters + 1):
        nxt = {v for u in frontier for v in adj[u]} - set(dist)
        for v in nxt:
            dist[v] = hop
        frontier = nxt
    return dist


def test_ivm_merge_law_and_sequential_cells(spark):
    """base (+) delta = merged per key, and every cell equals the
    sequential recomputation from raw orders."""
    orders = load_table(spark, SF, "orders").collect()
    cut = datetime(1998, 6, 1)
    cells = defaultdict(lambda: [0, 0, 0, 0])
    for o in orders:
        c = cells[o.o_custkey]
        cents = int(math.floor(o.o_totalprice * 100.0))
        if o.o_orderdate < cut:
            c[0] += 1
            c[1] += cents
        else:
            c[2] += 1
            c[3] += cents
    rows = R.QUERIES["table_ivm_merge"](spark, SF).collect()
    assert {r.o_custkey for r in rows} == set(cells)
    for r in rows:
        nb, sb, nd, sd = cells[r.o_custkey]
        assert (r.n_base, r.sum_base_cents) == (nb, sb)
        assert (r.n_delta, r.sum_delta_cents) == (nd, sd)
        # the IVM law: merged is the monoid combine of base and delta
        assert r.n_merged == r.n_base + r.n_delta
        assert r.sum_merged_cents == r.sum_base_cents + r.sum_delta_cents
        want = (
            "delta_only"
            if nb == 0
            else ("base_only" if nd == 0 else "both")
        )
        assert r.ivm_status == want
    # both sides of the cutoff are exercised at this sf
    assert any(r.ivm_status == "both" for r in rows)
    assert any(r.n_delta > 0 for r in rows)


def test_scc_pivot_matches_sequential_fw_bw(spark):
    """fw/bw hops equal sequential BFS over the modular graph and its
    reverse; in_scc iff both reached within the radius."""
    docs = [r.doc_id for r in load_table(spark, SF, "documents").collect()]
    fwd, bwd = _adj(docs)
    fw = _bfs(fwd, {0}, 4)
    bw = _bfs(bwd, {0}, 4)
    want = {
        (d, fw.get(d), bw.get(d), d in fw and d in bw) for d in docs
    }
    got = {
        tuple(r)
        for r in T.QUERIES["graph_scc_pivot"](spark, SF).collect()
    }
    assert got == want


def test_scc_certificate_is_sound(spark):
    """Soundness: every in_scc node is genuinely mutually reachable
    with the pivot under UNBOUNDED BFS (the radius bound can only
    under-approximate, never over-approximate)."""
    docs = [r.doc_id for r in load_table(spark, SF, "documents").collect()]
    fwd, bwd = _adj(docs)
    fw_full = _bfs(fwd, {0}, len(docs))
    bw_full = _bfs(bwd, {0}, len(docs))
    rows = T.QUERIES["graph_scc_pivot"](spark, SF).collect()
    assert any(r.in_scc for r in rows)  # certificate is non-trivial
    for r in rows:
        if r.in_scc:
            assert r.doc_id in fw_full and r.doc_id in bw_full


def test_spam_farm_matches_sequential_rollup(spark):
    """Per-host link masses, shares, and the spam flag equal the
    sequential recomputation over the host-collapsed modular graph."""
    drows = load_table(spark, SF, "documents").collect()
    host = {r.doc_id: r.source for r in drows}
    n = len(drows)
    pairs = defaultdict(int)
    for d in host:
        for dst in {(d * 17 + 1) % n, (d * 31 + 7) % n, (d + 1) % n}:
            pairs[(host[d], host[dst])] += 1
    per = defaultdict(lambda: [0, 0, 0])  # n_out, n_self, top_ext
    for (hs, hd), w in pairs.items():
        per[hs][0] += w
        if hs == hd:
            per[hs][1] += w
        else:
            per[hs][2] = max(per[hs][2], w)
    rows = T.QUERIES["web_spam_farm_score"](spark, SF).collect()
    assert {r.host for r in rows} == set(per)
    for r in rows:
        n_out, n_self, top_ext = per[r.host]
        assert (r.n_out, r.n_self) == (n_out, n_self)
        self_ppm = 1000000 * n_self // n_out
        conc_ppm = 1000000 * top_ext // max(n_out - n_self, 1)
        assert (r.self_ppm, r.conc_ppm) == (self_ppm, conc_ppm)
        assert r.is_spam == (self_ppm > 500000 or conc_ppm > 800000)
