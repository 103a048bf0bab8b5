"""Laws for the round-5h keys (nearest as-of join, weighted median,
bow-tie census) — each recomputed sequentially in Python at sf0.001."""

from __future__ import annotations

from collections import defaultdict

import octospark.relational as R
import octospark.textops as T
from octospark.sources import load_table
from tests.test_round5g_keys import _adj, _bfs

SF = "/root/testdata/sf0.001"


def _us(ts):
    from datetime import timezone

    return int(ts.replace(tzinfo=timezone.utc).timestamp() * 1e6)


def test_asof_nearest_matches_sequential_scan(spark):
    """nearest/direction/gap equal a sequential per-user scan with
    the backward tie-break."""
    ev = load_table(spark, SF, "events").collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)
    want = set()
    for rows in by_user.values():
        rows.sort(key=lambda r: (_us(r.ts), r.event_id))
        for i, r in enumerate(rows):
            if r.event_type != "view":
                continue
            us = _us(r.ts)
            prevs = [
                _us(p.ts)
                for p in rows[:i]
                if p.event_type == "purchase"
            ]
            nexts = [
                _us(p.ts)
                for p in rows[i + 1 :]
                if p.event_type == "purchase"
            ]
            pu = max(prevs) if prevs else None
            nu = min(nexts) if nexts else None
            if pu is None and nu is None:
                pick, d, gap = None, "none", None
            elif nu is None or (
                pu is not None and us - pu <= nu - us
            ):
                pick, d, gap = pu, "prev", us - pu
            else:
                pick, d, gap = nu, "next", nu - us
            want.add((r.event_id, r.user_id, us, pick, d, gap))
    got = {
        tuple(r)
        for r in R.QUERIES["join_asof_nearest"](spark, SF).collect()
    }
    assert got == want
    # the bidirectional pick is non-trivial: both directions occur
    assert {d for (_, _, _, _, d, _) in got} >= {"prev", "next"}


def test_weighted_median_crosses_half_the_mass(spark):
    """The weighted median is the smallest length whose cumulative
    byte mass reaches half the language's total — recomputed
    sequentially, plus the defining mass inequalities."""
    docs = load_table(spark, SF, "documents").collect()
    by_lang = defaultdict(list)
    for d in docs:
        by_lang[d.lang].append(d)
    rows = R.QUERIES["agg_weighted_median"](spark, SF).collect()
    assert {r.lang for r in rows} == set(by_lang)
    for r in rows:
        ds = sorted(
            by_lang[r.lang], key=lambda d: (d.n_chars, d.doc_id)
        )
        total = sum(d.n_chars for d in ds)
        assert (r.n_docs, r.total_chars) == (len(ds), total)
        cum = 0
        for d in ds:
            cum += d.n_chars
            if 2 * cum >= total:
                assert r.wmedian_chars == d.n_chars
                break
        # defining property: mass at or below the weighted median is
        # >= half; mass strictly below is < half
        below_eq = sum(
            d.n_chars for d in ds if d.n_chars <= r.wmedian_chars
        )
        strictly_below = sum(
            d.n_chars for d in ds if d.n_chars < r.wmedian_chars
        )
        assert 2 * below_eq >= total
        assert 2 * strictly_below < total


def test_bowtie_census_matches_scc_pivot_rollup(spark):
    """Census counts equal the sequential FW/BW classification, and
    the four classes partition the corpus."""
    docs = [
        r.doc_id for r in load_table(spark, SF, "documents").collect()
    ]
    fwd, bwd = _adj(docs)
    fw = _bfs(fwd, {0}, 4)
    bw = _bfs(bwd, {0}, 4)
    want = defaultdict(lambda: [0, None])
    for d in docs:
        c = (
            "core"
            if d in fw and d in bw
            else ("in" if d in bw else ("out" if d in fw else "disc"))
        )
        want[c][0] += 1
        want[c][1] = (
            d if want[c][1] is None else min(want[c][1], d)
        )
    rows = T.QUERIES["graph_bowtie_census"](spark, SF).collect()
    assert {r.component for r in rows} == set(want)
    for r in rows:
        assert (r.n_nodes, r.min_doc_id) == tuple(want[r.component])
    assert sum(r.n_nodes for r in rows) == len(docs)
