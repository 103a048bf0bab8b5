"""Laws for the round-5k keys (clustering coefficient, GDPR erasure
plan, Q3 flagship) — recomputed sequentially in Python at sf0.001."""

from __future__ import annotations

from collections import defaultdict
from datetime import datetime
from decimal import Decimal
from itertools import combinations

import octospark.relational as R
import octospark.textops as T
from octospark.sources import load_table

SF = "/root/testdata/sf0.001"


def _und(docs):
    n = len(docs)
    und = set()
    for d in docs:
        for dst in (
            (d * 17 + 1) % n,
            (d * 31 + 7) % n,
            (d + 1) % n,
            (d + 2) % n,
        ):
            if d != dst:
                und.add((min(d, dst), max(d, dst)))
    return und


def test_clustering_coefficient_matches_sequential(spark):
    """degree / triangles / local cc equal the sequential
    recomputation over the canonical undirected edge set."""
    docs = [
        r.doc_id for r in load_table(spark, SF, "documents").collect()
    ]
    und = _und(docs)
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    tri = defaultdict(int)
    for v in docs:
        for x, y in combinations(sorted(adj[v]), 2):
            if (x, y) in und:
                tri[v] += 1
    want = set()
    for d in docs:
        deg = len(adj[d])
        cc = (
            1000000 * 2 * tri[d] // (deg * (deg - 1))
            if deg >= 2
            else 0
        )
        want.add((d, deg, tri[d], cc))
    got = {
        tuple(r)
        for r in T.QUERIES["graph_clustering_coefficient"](
            spark, SF
        ).collect()
    }
    assert got == want
    # the ring chord guarantees triangles exist; cc is in [0, 1e6]
    assert any(t > 0 for (_, _, t, _) in got)
    assert all(0 <= c <= 1000000 for (_, _, _, c) in got)


def test_clustering_agrees_with_triangle_key(spark):
    """Cross-key consistency: the coefficient key's triangle counts
    equal graph_triangle_count's (shared kernel law)."""
    a = {
        (r.node, r.n_triangles)
        for r in T.QUERIES["graph_triangle_count"](spark, SF).collect()
    }
    b = {
        (r.node, r.n_triangles)
        for r in T.QUERIES["graph_clustering_coefficient"](
            spark, SF
        ).collect()
    }
    assert a == b


def test_gdpr_plan_covers_exactly_the_cohort(spark):
    """Per-file delete counts equal the sequential cohort scan over
    both tables; files the cohort misses are absent."""
    ev = load_table(spark, SF, "events").collect()
    orders = load_table(spark, SF, "orders").collect()
    want = defaultdict(lambda: [0, set()])
    for r in ev:
        if r.user_id % 50 == 7:
            c = want[("events", r.event_id // 1000)]
            c[0] += 1
            c[1].add(r.user_id)
    for r in orders:
        if r.o_custkey % 50 == 7:
            c = want[("orders", r.o_orderkey // 1000)]
            c[0] += 1
            c[1].add(r.o_custkey)
    rows = R.QUERIES["table_gdpr_erasure_plan"](spark, SF).collect()
    got = {
        (r.table_name, r.file_id): (r.n_delete, r.n_subjects)
        for r in rows
    }
    assert got == {
        k: (v[0], len(v[1])) for k, v in want.items()
    }
    assert all(r.n_delete > 0 for r in rows)  # untouched files absent


def test_q3_matches_sequential_join(spark):
    """Top-10 revenue rows equal the sequential three-table join with
    exact Decimal accumulation and the deterministic tie-break."""
    cut = datetime(1998, 6, 1)
    seg = {
        c.c_custkey
        for c in load_table(spark, SF, "customer").collect()
        if c.c_mktsegment == "BUILDING"
    }
    orders = {
        o.o_orderkey: o
        for o in load_table(spark, SF, "orders").collect()
        if o.o_custkey in seg and o.o_orderdate < cut
    }
    rev = defaultdict(Decimal)
    meta = {}
    for li in load_table(spark, SF, "lineitem").collect():
        o = orders.get(li.l_orderkey)
        if o is None or li.l_shipdate <= cut:
            continue
        price = Decimal(str(round(li.l_extendedprice, 2)))
        disc = Decimal(str(round(1 - li.l_discount, 4)))
        rev[li.l_orderkey] += price * disc
        meta[li.l_orderkey] = (
            o.o_orderdate.strftime("%Y-%m-%d"),
            o.o_orderpriority,
        )
    ranked = sorted(
        rev.items(), key=lambda kv: (-kv[1], kv[0])
    )[:10]
    want = [
        (k, float(v), meta[k][0], meta[k][1]) for k, v in ranked
    ]
    got = [
        (r.l_orderkey, r.revenue, r.o_orderdate, r.o_orderpriority)
        for r in R.QUERIES["sql_tpch_q3_like"](spark, SF).collect()
    ]
    assert got == want
    assert len(got) == 10
