"""Laws for the round-5o keys (feature backfill, expectations
report) — recomputed sequentially in Python at sf0.001."""

from __future__ import annotations

from collections import defaultdict
from datetime import datetime, timezone

import octospark.relational as R
from octospark.sources import load_table

SF = "/root/testdata/sf0.001"


def _day(ts):
    return int(
        ts.replace(tzinfo=timezone.utc).timestamp() * 1e6
    ) // 86400000000


def test_feature_backfill_matches_sequential_windows(spark):
    """n_1d/n_7d/n_28d equal the sequential per-user day-range sums;
    RANGE semantics hold across activity gaps."""
    ev = load_table(spark, SF, "events").collect()
    per = defaultdict(int)
    for r in ev:
        per[(r.user_id, _day(r.ts))] += 1
    days = defaultdict(list)
    for (u, d), n in per.items():
        days[u].append((d, n))
    want = set()
    for u, seq in days.items():
        for d, n in seq:
            n7 = sum(m for (e, m) in seq if d - 6 <= e <= d)
            n28 = sum(m for (e, m) in seq if d - 27 <= e <= d)
            want.add((u, d, n, n7, n28))
    got = {
        tuple(r)
        for r in R.QUERIES["events_feature_backfill"](
            spark, SF
        ).collect()
    }
    assert got == want
    # horizons nest: n_1d <= n_7d <= n_28d
    assert all(n <= n7 <= n28 for (_, _, n, n7, n28) in got)


def test_expectations_report_matches_sequential_checks(spark):
    """Each expectation's violation count equals the sequential scan;
    this clean synthetic table passes every expectation (the report
    proves absence, not vacuity — n_checked is the full table)."""
    orders = load_table(spark, SF, "orders").collect()
    custs = {
        c.c_custkey
        for c in load_table(spark, SF, "customer").collect()
    }
    n = len(orders)
    want = {
        "orderkey_not_null": sum(
            1 for o in orders if o.o_orderkey is None
        ),
        "totalprice_in_range": sum(
            1
            for o in orders
            if o.o_totalprice <= 0 or o.o_totalprice > 1000000
        ),
        "orderdate_in_bounds": sum(
            1
            for o in orders
            if not (
                datetime(1990, 1, 1)
                <= o.o_orderdate
                < datetime(2030, 1, 1)
            )
        ),
        "status_in_domain": sum(
            1 for o in orders if o.o_orderstatus not in ("O", "F", "P")
        ),
        "custkey_ref_integrity": sum(
            1 for o in orders if o.o_custkey not in custs
        ),
    }
    rows = R.QUERIES["table_expectations_report"](spark, SF).collect()
    assert {r.name for r in rows} == set(want)
    for r in rows:
        assert r.n_checked == n
        assert r.n_violations == want[r.name]
        assert r["pass"] == (r.n_violations == 0)
        assert r.viol_ppm == 1000000 * r.n_violations // n
