"""Laws for the round-5c keys (SRM gate, CUPED lift, tolerance as-of)
— each recomputed sequentially in Python at sf0.001."""

from __future__ import annotations

from collections import defaultdict

import octospark.relational as R
from octospark.sources import load_table

SF = "/root/testdata/sf0.001"


def _us(ts):
    import calendar

    return calendar.timegm(ts.timetuple()) * 1_000_000 + ts.microsecond


def test_srm_matches_sequential_counts(spark):
    """Per-type variant user counts equal a sequential distinct census,
    chi2 is exactly (n_a-n_b)^2/(n_a+n_b), and the flag equals the
    integer cross-multiplied 5%-threshold test."""
    ev = load_table(spark, SF, "events").collect()
    users = defaultdict(set)
    for e in ev:
        users[(e.event_type, e.user_id % 2)].add(e.user_id)
    types = {t for (t, _g) in users}
    want = set()
    for t in types:
        n_a, n_b = len(users[(t, 0)]), len(users[(t, 1)])
        want.add(
            (
                t,
                n_a,
                n_b,
                (n_a - n_b) ** 2 / (n_a + n_b),
                100 * (n_a - n_b) ** 2 > 384 * (n_a + n_b),
            )
        )
    got = {
        (r.event_type, r.n_a, r.n_b, r.chi2, r.srm)
        for r in R.QUERIES["events_srm_check"](spark, SF).collect()
    }
    assert got == want


def test_cuped_matches_sequential_regression(spark):
    """Pooled theta and both deltas equal the sequential replay: exact
    integer moments, then the identical IEEE expression order."""
    ev = load_table(spark, SF, "events").collect()
    all_us = [_us(e.ts) for e in ev]
    mid = (min(all_us) + max(all_us)) // 2
    per_user = defaultdict(lambda: [0, 0])
    for e in ev:
        per_user[e.user_id][0 if _us(e.ts) < mid else 1] += 1
    n = len(per_user)
    sx = sum(x for x, _y in per_user.values())
    sy = sum(y for _x, y in per_user.values())
    sxx = sum(x * x for x, _y in per_user.values())
    sxy = sum(x * y for x, y in per_user.values())
    theta = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    grp = defaultdict(lambda: [0, 0, 0])
    for uid, (x, y) in per_user.items():
        g = grp[uid % 2]
        g[0] += 1
        g[1] += x
        g[2] += y
    (n_a, sx_a, sy_a), (n_b, sx_b, sy_b) = grp[0], grp[1]
    d_raw = sy_a / n_a - sy_b / n_b
    d_cuped = d_raw - theta * (sx_a / n_a - sx_b / n_b)
    [r] = R.QUERIES["events_cuped_lift"](spark, SF).collect()
    assert (
        r.n_a, r.sx_a, r.sy_a, r.n_b, r.sx_b, r.sy_b,
    ) == (n_a, sx_a, sy_a, n_b, sx_b, sy_b)
    assert r.theta == theta
    assert r.delta_raw == d_raw
    assert r.delta_cuped == d_cuped
    # variance-reduction sanity: pre-period counts correlate with post
    # (same synthetic users), so theta is a real, nonzero coefficient
    assert theta != 0.0


def test_asof_tolerance_matches_sequential_scan(spark):
    """Each event's asof_purchase_us equals the strictly-prior latest
    purchase within tolerance of a per-user sequential scan — and a
    purchase row never sees itself (point-in-time law)."""
    tol = 3_600_000_000
    ev = load_table(spark, SF, "events").collect()
    by_user = defaultdict(list)
    for e in ev:
        by_user[e.user_id].append(e)
    want = {}
    for uid, rows in by_user.items():
        rows.sort(key=lambda e: (e.ts, e.event_id))
        last_p = None
        for e in rows:
            t = _us(e.ts)
            ok = last_p is not None and t - last_p <= tol
            want[e.event_id] = (uid, t, last_p if ok else None, ok)
            if e.event_type == "purchase":
                last_p = t
    got = {
        r.event_id: (r.user_id, r.ts_us, r.asof_purchase_us, r.fresh)
        for r in R.QUERIES["join_asof_tolerance"](spark, SF).collect()
    }
    assert got == want
    # at least one fresh and one stale/absent row, else the law is vacuous
    flags = {v[3] for v in got.values()}
    assert flags == {True, False}
