"""Laws for the round-5u keys (split leakage audit, degree
assortativity) — recomputed sequentially at sf0.001."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import octospark.textops as T
from octospark.sources import load_table
from tests.test_round5t_keys import _und_edges

SF = "/root/testdata/sf0.001"

_MULT, _RED = 2654435761, 100000007


def _split(doc_id):
    b = ((doc_id % _RED) * _MULT) % 100
    return "train" if b < 80 else ("val" if b < 90 else "test")


def test_leakage_audit_matches_sequential_census(spark):
    """Census rows equal a sequential shingle-set + split recompute
    with the df cap and integer thresholds."""
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, SF, "documents").collect()
        if r.doc_id < 150
    }
    sh = {}
    for d, text in docs.items():
        w = text.split(" ")
        sh[d] = (
            {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
            if len(w) >= 3
            else set()
        )
    df = Counter(s for v in sh.values() for s in v)
    hot = {s for s, c in df.items() if c > 1024}
    census = Counter()
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len((sh[a] & sh[b]) - hot)
            if inter == 0:
                continue
            union = len(sh[a]) + len(sh[b]) - inter
            if 20 * inter < union:
                continue
            sa, sb = sorted((_split(a), _split(b)))
            census[(sa, sb, 10 * inter // union)] += 1
    want = {
        (sa, sb, jb, n, sa != sb)
        for (sa, sb, jb), n in census.items()
    }
    got = {
        tuple(r)
        for r in T.QUERIES["corpus_split_leakage_audit"](
            spark, SF
        ).collect()
    }
    assert got == want


def test_assortativity_matches_sequential_moments(spark):
    """The six moment sums and r equal a sequential recompute over
    the symmetrized edge list; r is within [-1, 1]."""
    docs = [
        r.doc_id for r in load_table(spark, SF, "documents").collect()
    ]
    und = _und_edges(docs)
    deg = Counter(a for a, _ in und)
    n = len(und)
    sx = sy = sxx = syy = sxy = 0
    for a, b in und:
        dx, dy = deg[a], deg[b]
        sx += dx
        sy += dy
        sxx += dx * dx
        syy += dy * dy
        sxy += dx * dy
    r = float(n * sxy - sx * sy) / (
        math.sqrt(float(n * sxx - sx * sx))
        * math.sqrt(float(n * syy - sy * sy))
    )
    rows = T.QUERIES["graph_assortativity"](spark, SF).collect()
    assert len(rows) == 1
    row = rows[0]
    assert (
        row.n,
        row.sx,
        row.sy,
        row.sxx,
        row.syy,
        row.sxy,
    ) == (n, sx, sy, sxx, syy, sxy)
    assert row.assortativity_r == r
    assert -1.0 <= row.assortativity_r <= 1.0
    # symmetry law: the symmetrized pair list makes x/y exchangeable
    assert row.sx == row.sy and row.sxx == row.syy
