"""Laws for the round-5w keys (activity streaks, null-safe join) —
recomputed sequentially at sf0.001."""

from __future__ import annotations

import datetime
from collections import defaultdict

import octospark.relational as R
from octospark.sources import load_table

SF = "/root/testdata/sf0.001"

_DAY_US = 86400 * 1_000_000


def test_streaks_match_sequential_islands(spark):
    """Per-user rollups equal a sequential consecutive-day run-length
    scan; latest streak ends on the user's last active day."""
    ev = load_table(spark, SF, "events").collect()
    days = defaultdict(set)
    for r in ev:
        us = int(
            r.ts.replace(tzinfo=datetime.timezone.utc).timestamp()
            * 1_000_000
        )
        days[r.user_id].add(us // _DAY_US)
    want = set()
    for u, ds in days.items():
        ds = sorted(ds)
        runs = []
        start = prev = ds[0]
        for d in ds[1:]:
            if d == prev + 1:
                prev = d
                continue
            runs.append((start, prev))
            start = prev = d
        runs.append((start, prev))
        lens = [b - a + 1 for a, b in runs]
        want.add(
            (
                u,
                len(runs),
                sum(lens),
                max(lens),
                lens[-1],  # runs are in day order; last = latest
            )
        )
    got = {
        tuple(r)
        for r in R.QUERIES["events_activity_streaks"](
            spark, SF
        ).collect()
    }
    assert got == want


def test_null_safe_join_keeps_null_bucket(spark):
    """The null-keyed (urgent) orders survive the join into the
    urgent-null tier — exactly the rows a plain equi-join drops —
    and per-tier counts match a sequential recompute."""
    orders = load_table(spark, SF, "orders").collect()
    per = defaultdict(lambda: [0, None])
    for r in orders:
        urgent = r.o_orderpriority.startswith("1-")
        key = None if urgent else r.o_orderpriority
        tier = "urgent-null" if urgent else "normal"
        cell = per[(key, tier)]
        cell[0] += 1
        cell[1] = (
            r.o_orderkey
            if cell[1] is None
            else min(cell[1], r.o_orderkey)
        )
    want = {
        (k, t, n, mn) for (k, t), (n, mn) in per.items()
    }
    got = {
        tuple(r)
        for r in R.QUERIES["join_null_safe"](spark, SF).collect()
    }
    assert got == want
    assert any(k is None and t == "urgent-null" for k, t, *_ in got)
    # the plain-equality control: an equi-join on the same key drops
    # every null-keyed row
    n_urgent = sum(
        n for (k, t), (n, _) in per.items() if k is None
    )
    assert n_urgent > 0
    total = sum(n for (_, _), (n, _) in per.items())
    kept = sum(n for (k, _), (n, _) in per.items() if k is not None)
    assert kept == total - n_urgent
