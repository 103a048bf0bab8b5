"""Laws for the round-5m keys (Pearson correlation, walk sampling) —
recomputed sequentially in Python at sf0.001."""

from __future__ import annotations

import math
from collections import defaultdict
from decimal import Decimal

import octospark.relational as R
import octospark.textops as T
from octospark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_pearson_matches_decimal_sequential(spark):
    """Per-flag r equals the sequential Decimal-sum closed form, and
    quantity-revenue correlation is strongly positive (price scales
    with quantity by construction of the table)."""
    li = load_table(spark, SF, "lineitem").collect()
    cells = defaultdict(list)
    for r in li:
        cells[r.l_returnflag].append(r)
    rows = R.QUERIES["agg_correlation_pearson"](spark, SF).collect()
    assert {r.l_returnflag for r in rows} == set(cells)
    for r in rows:
        rs = cells[r.l_returnflag]
        n = len(rs)
        q = lambda v, p: Decimal(str(round(v, p)))  # noqa: E731
        sx = float(sum(q(x.l_quantity, 6) for x in rs))
        sy = float(sum(q(x.l_extendedprice, 6) for x in rs))
        sxx = float(sum(q(x.l_quantity, 2) ** 2 for x in rs))
        syy = float(sum(q(x.l_extendedprice, 2) ** 2 for x in rs))
        sxy = float(
            sum(
                q(x.l_quantity, 2) * q(x.l_extendedprice, 2)
                for x in rs
            )
        )
        want_r = (n * sxy - sx * sy) / (
            math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
        )
        assert r.n == n
        assert abs(r.pearson_r - want_r) < 1e-9
        assert -1.0 <= r.pearson_r <= 1.0
        # this synthetic table draws price independent of quantity,
        # so the statistic should sit near zero — a strong |r| here
        # would mean the accumulation itself is broken
        assert abs(r.pearson_r) < 0.2


def test_walk_matches_sequential_prng(spark):
    """Every walk equals the sequential keyed-hash walk over the
    sorted adjacency; walks only traverse real edges."""
    docs = [
        r.doc_id for r in load_table(spark, SF, "documents").collect()
    ]
    n = len(docs)
    adj = defaultdict(set)
    for d in docs:
        for dst in ((d * 17 + 1) % n, (d * 31 + 7) % n, (d + 1) % n):
            adj[d].add(dst)
    nbr = {d: sorted(v) for d, v in adj.items()}
    want = set()
    for start in docs:
        pos = start
        want.add((start, 0, pos))
        for t in range(1, 5):
            d = len(nbr[pos])
            idx = (start * 2654435761 + t * 40503) % 1000003 % d
            pos = nbr[pos][idx]
            want.add((start, t, pos))
    got = {
        tuple(r)
        for r in T.QUERIES["graph_walk_sample"](spark, SF).collect()
    }
    assert got == want
    # structural law: each consecutive pair in a walk is an edge
    by_walk = defaultdict(dict)
    for s, t, node in got:
        by_walk[s][t] = node
    for s, steps in by_walk.items():
        assert set(steps) == {0, 1, 2, 3, 4}
        for t in range(1, 5):
            assert steps[t] in adj[steps[t - 1]]
    # the sampler explores: walks are not all lazy self-loops
    assert any(len(set(steps.values())) > 2 for steps in by_walk.values())
