"""Laws for the round-5i keys (permissive CSV scan, Gini
concentration) — recomputed sequentially in Python at sf0.001."""

from __future__ import annotations

from collections import defaultdict

import octospark.relational as R
from octospark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_permissive_csv_never_drops_a_row(spark):
    """Every document survives the malformed landing: good rows keep
    all fields, corrupt rows keep ids and lose exactly n_chars."""
    docs = load_table(spark, SF, "documents").collect()
    want = {
        (
            d.doc_id,
            d.lang,
            None if d.doc_id % 13 == 0 else d.n_chars,
            d.doc_id % 13 == 0,
        )
        for d in docs
    }
    got = {
        tuple(r)
        for r in R.QUERIES["scan_csv_malformed_permissive"](
            spark, SF
        ).collect()
    }
    assert got == want
    assert any(c for (_, _, _, c) in got)  # corruption is exercised
    # partial parse, not line drop: corrupt rows still carry doc_id
    assert all(d is not None for (d, _, _, _) in got)


def test_gini_matches_sequential_rank_formula(spark):
    """Per-type Gini equals the exact rank-formula recomputation and
    sits in [0, 1e6)."""
    ev = load_table(spark, SF, "events").collect()
    counts = defaultdict(lambda: defaultdict(int))
    for r in ev:
        counts[r.event_type][r.user_id] += 1
    rows = R.QUERIES["events_gini_user_concentration"](
        spark, SF
    ).collect()
    assert {r.event_type for r in rows} == set(counts)
    for r in rows:
        xs = sorted(counts[r.event_type].items(), key=lambda kv: (kv[1], kv[0]))
        n = len(xs)
        tot = sum(x for _, x in xs)
        six = sum(i * x for i, (_, x) in enumerate(xs, start=1))
        gini = 1000000 * (2 * six - (n + 1) * tot) // (n * tot)
        assert (r.n_users, r.total_events) == (n, tot)
        assert r.gini_ppm == gini
        assert 0 <= r.gini_ppm < 1000000


def test_gini_extremes():
    """Law check of the formula itself: uniform counts -> 0; one user
    owning everything -> (n-1)/n of 1e6."""

    def gini(xs):
        xs = sorted(xs)
        n, tot = len(xs), sum(xs)
        six = sum(i * x for i, x in enumerate(xs, start=1))
        return 1000000 * (2 * six - (n + 1) * tot) // (n * tot)

    assert gini([5] * 10) == 0
    assert gini([0] * 9 + [100]) == 900000  # (n-1)/n * 1e6
    assert gini([1, 1, 1, 97]) > gini([20, 20, 30, 30])
