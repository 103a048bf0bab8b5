"""Laws for the round-5n keys (dow/hod heatmap, interval-overlap
join) — recomputed sequentially in Python at sf0.001."""

from __future__ import annotations

from collections import defaultdict
from datetime import datetime, timezone

import octospark.relational as R
from octospark.sources import load_table

SF = "/root/testdata/sf0.001"


def _us(ts):
    return int(ts.replace(tzinfo=timezone.utc).timestamp() * 1e6)


def test_heatmap_matches_sequential_cells(spark):
    """Cell counts and shares equal the sequential recomputation; the
    arithmetic dow matches Python's calendar (0 = Sunday)."""
    ev = load_table(spark, SF, "events").collect()
    cells = defaultdict(int)
    totals = defaultdict(int)
    for r in ev:
        dow = (_us(r.ts) // 86400000000 + 4) % 7
        # cross-check the arithmetic dow against the calendar:
        # Python weekday() has Monday=0, so Sunday-0 = (weekday+1)%7
        assert dow == (r.ts.weekday() + 1) % 7
        cells[(r.event_type, dow, r.ts.hour)] += 1
        totals[r.event_type] += 1
    want = {
        (t, d, h, n, 1000000 * n // totals[t])
        for (t, d, h), n in cells.items()
    }
    got = {
        tuple(r)
        for r in R.QUERIES["events_dow_hod_heatmap"](
            spark, SF
        ).collect()
    }
    assert got == want
    # shares per type sum to ~1e6 (floor loss < number of cells)
    by_type = defaultdict(int)
    n_cells = defaultdict(int)
    for t, _, _, _, s in got:
        by_type[t] += s
        n_cells[t] += 1
    for t, s in by_type.items():
        assert 1000000 - n_cells[t] <= s <= 1000000


def test_interval_overlap_matches_sequential_sweep(spark):
    """The binned join finds EXACTLY the truly-overlapping
    (order, promo) pairs with exact day overlaps — no pair missed
    (the at-most-2-bins completeness law), none invented."""
    orders = load_table(spark, SF, "orders").collect()
    epoch = _us(datetime(1995, 1, 1)) // 86400000000
    promos = [
        (i, epoch + i * 30, epoch + i * 30 + 14) for i in range(81)
    ]
    want = set()
    for o in orders:
        lo = _us(o.o_orderdate) // 86400000000
        hi = lo + 7
        for pid, plo, phi in promos:
            if lo < phi and plo < hi:
                want.add(
                    (
                        o.o_orderkey,
                        pid,
                        min(hi, phi) - max(lo, plo),
                    )
                )
    got = {
        tuple(r)
        for r in R.QUERIES["join_interval_overlap"](
            spark, SF
        ).collect()
    }
    assert got == want
    assert all(1 <= d <= 7 for (_, _, d) in got)
    # partial overlaps are exercised, not just containments
    assert any(d < 7 for (_, _, d) in got)
