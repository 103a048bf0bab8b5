"""Laws for the round-5j keys (TTR diversity, audience overlap) —
recomputed sequentially in Python at sf0.001."""

from __future__ import annotations

from collections import defaultdict
from itertools import combinations

import octospark.relational as R
import octospark.textops as T
from octospark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_ttr_matches_sequential_split(spark):
    """n_words / distinct / ttr / keep equal the per-doc whitespace
    split recomputation."""
    docs = load_table(spark, SF, "documents").collect()
    want = set()
    for d in docs:
        ws = d.text.split(" ")
        n, nd = len(ws), len(set(ws))
        ttr = 1000000 * nd // n
        want.add((d.doc_id, n, nd, ttr, ttr > 450000))
    got = {
        tuple(r)
        for r in T.QUERIES["text_ttr_diversity"](spark, SF).collect()
    }
    assert got == want
    # the gate is non-trivial on this corpus: both verdicts occur
    assert {k for (_, _, _, _, k) in got} == {True, False}


def test_ttr_repetition_collapses_the_ratio():
    """Law of the statistic itself: repeating a vocabulary drops TTR
    toward vocab/len while fresh words hold it at 1e6."""
    rep = ["spam"] * 99 + ["ham"]
    fresh = [f"w{i}" for i in range(100)]
    assert 1000000 * len(set(rep)) // len(rep) == 20000
    assert 1000000 * len(set(fresh)) // len(fresh) == 1000000


def test_overlap_matches_sequential_sets(spark):
    """Pair intersections, audience sizes, and Jaccard equal the
    sequential set recomputation; only co-occurring pairs appear."""
    ev = load_table(spark, SF, "events").collect()
    members = defaultdict(set)
    for r in ev:
        members[r.event_type].add(r.user_id)
    want = set()
    for a, b in combinations(sorted(members), 2):
        inter = len(members[a] & members[b])
        if inter == 0:
            continue
        na, nb = len(members[a]), len(members[b])
        want.add(
            (
                a,
                b,
                inter,
                na,
                nb,
                1000000 * inter // (na + nb - inter),
            )
        )
    rows = R.QUERIES["events_user_overlap_jaccard"](
        spark, SF
    ).collect()
    got = {
        (r.type_a, r.type_b, r.n_inter, r.n_a, r.n_b, r.jaccard_ppm)
        for r in rows
    }
    assert got == want
    for r in rows:
        # inclusion-exclusion sanity: Jaccard in (0, 1e6]
        assert 0 < r.jaccard_ppm <= 1000000
        assert r.n_inter <= min(r.n_a, r.n_b)
