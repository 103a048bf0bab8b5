"""Laws for the events-table behavioral analytics keys (funnel,
cohort retention) — recomputed directly in Python."""

from __future__ import annotations

from collections import defaultdict

import octospark.relational as R

SF = "/root/testdata/sf0.001"


def _events(spark):
    from octospark.sources import load_table

    return load_table(spark, SF, "events").collect()


def test_funnel_stages_match_sequential_recount(spark):
    """Each user's stage timestamps equal the Python sequential scan
    (earliest view, earliest later click, earliest later purchase) and
    stage_reached is consistent with the NULL pattern."""
    ev = _events(spark)
    by_user = defaultdict(list)
    for e in ev:
        by_user[e.user_id].append((e.ts, e.event_type))
    want = {}
    for u, rows in by_user.items():
        views = [t for t, k in rows if k == "view"]
        if not views:
            continue
        t_view = min(views)
        clicks = [t for t, k in rows if k == "click" and t > t_view]
        t_click = min(clicks) if clicks else None
        t_purchase = None
        if t_click is not None:
            buys = [t for t, k in rows if k == "purchase" and t > t_click]
            t_purchase = min(buys) if buys else None
        want[u] = (t_view, t_click, t_purchase)
    out = R.QUERIES["events_funnel_conversion"](spark, SF).collect()
    assert {r.user_id for r in out} == set(want)
    for r in out:
        tv, tc, tp = want[r.user_id]
        assert (r.t_view, r.t_click, r.t_purchase) == (tv, tc, tp)
        assert r.stage_reached == (3 if tp else 2 if tc else 1)
        # funnel ordering invariant
        if r.t_click:
            assert r.t_click > r.t_view
        if r.t_purchase:
            assert r.t_purchase > r.t_click


def test_cohort_matrix_laws(spark):
    """Cell counts match a Python recount; offset 0 exists for every
    cohort (the first event itself); counts never exceed cohort size;
    offsets are non-negative."""
    ev = _events(spark)
    first = {}
    for e in ev:
        d = e.ts.date()
        if e.user_id not in first or d < first[e.user_id]:
            first[e.user_id] = d
    cells = defaultdict(set)
    for e in ev:
        c = first[e.user_id]
        cells[(c, (e.ts.date() - c).days)].add(e.user_id)
    out = R.QUERIES["events_retention_cohorts"](spark, SF).collect()
    got = {(r.cohort, r.day_offset): r.n_users for r in out}
    assert got == {k: len(v) for k, v in cells.items()}
    sizes = defaultdict(set)
    for u, c in first.items():
        sizes[c].add(u)
    for (c, off), n in got.items():
        assert off >= 0
        assert n <= len(sizes[c])
    for c in sizes:
        assert (c, 0) in got
