"""Laws for the round-5q keys (survival curve, gap-fill LOCF,
ColBERT MaxSim) — recomputed sequentially at sf0.001."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import octospark.relational as R
import octospark.textops as T
from octospark.sources import load_table

SF = "/root/testdata/sf0.001"

_HOUR_US = 3600 * 1_000_000


def _epoch_us(ts):
    import datetime

    return int(
        ts.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000
    )


def test_survival_curve_matches_sequential_km(spark):
    """The curve equals the empirical survival function computed
    sequentially: per-user lifetime histogram, descending at-risk
    cumsum, integer ppm ratios."""
    ev = load_table(spark, SF, "events").collect()
    span = defaultdict(lambda: [None, None])
    for r in ev:
        us = _epoch_us(r.ts)
        lo, hi = span[r.user_id]
        span[r.user_id] = [
            us if lo is None else min(lo, us),
            us if hi is None else max(hi, us),
        ]
    lts = Counter((hi - lo) // _HOUR_US for lo, hi in span.values())
    n_total = sum(lts.values())
    want = set()
    at_risk = 0
    for lt in sorted(lts, reverse=True):
        d = lts[lt]
        at_risk += d
        want.add(
            (
                lt,
                d,
                at_risk,
                1_000_000 * d // at_risk,
                1_000_000 * (at_risk - d) // n_total,
            )
        )
    got = {
        tuple(r)
        for r in R.QUERIES["events_survival_curve"](spark, SF).collect()
    }
    assert got == want


def test_survival_curve_laws(spark):
    """surv_ppm is non-increasing in lifetime; the longest lifetime
    has hazard 1e6 (everyone at risk churns) and surv of the tail
    beyond max is 0; at-risk at the minimum lifetime is N."""
    rows = sorted(
        R.QUERIES["events_survival_curve"](spark, SF).collect(),
        key=lambda r: r.lt_hours,
    )
    survs = [r.surv_ppm for r in rows]
    assert survs == sorted(survs, reverse=True)
    assert rows[-1].hazard_ppm == 1_000_000
    assert rows[-1].surv_ppm == 0
    assert rows[0].n_at_risk == sum(r.n_churned for r in rows)


def test_gap_fill_matches_sequential_locf(spark):
    """Every (type, hour) in the dense range appears exactly once,
    with the sequential carry-forward value and staleness."""
    ev = load_table(spark, SF, "events").collect()
    hourly = defaultdict(lambda: [0, None])
    for r in ev:
        hr = _epoch_us(r.ts) // _HOUR_US
        cell = hourly[(r.event_type, hr)]
        cell[0] += 1
        cell[1] = r.value if cell[1] is None else max(cell[1], r.value)
    series = defaultdict(dict)
    for (t, hr), (n, mx) in hourly.items():
        series[t][hr] = (n, mx)
    want = set()
    for t, obs in series.items():
        last_hr = last_mx = None
        for hr in range(min(obs), max(obs) + 1):
            if hr in obs:
                n, mx = obs[hr]
                last_hr, last_mx = hr, mx
            else:
                n = 0
            want.add((t, hr, n, last_mx, hr - last_hr))
    got = {
        tuple(r)
        for r in R.QUERIES["events_gap_fill_locf"](spark, SF).collect()
    }
    assert got == want
    # staleness is 0 exactly on active hours
    for t, hr, n, _, stale in got:
        assert (stale == 0) == (n > 0) or (n == 0 and stale > 0)


def test_maxsim_matches_numpy_recompute(spark):
    """Top-5 per query equals a numpy recompute of the quantized
    chunked MaxSim score."""
    emb = {
        r.vec_id: r.embedding
        for r in load_table(spark, SF, "embeddings").collect()
    }
    Q, TOKS, DIM, SCALE, K = 4, 4, 16, 1024, 5

    def toks(v):
        return [
            [int(math.floor(float(x) * SCALE)) for x in v[c * DIM:(c + 1) * DIM]]
            for c in range(TOKS)
        ]

    qt = {i: toks(emb[i]) for i in emb if i < Q}
    dt = {i: toks(emb[i]) for i in emb if i >= Q}
    want = set()
    for qid, qtoks in qt.items():
        scored = []
        for did, dtoks in dt.items():
            s = sum(
                max(
                    sum(a * b for a, b in zip(qv, dv)) for dv in dtoks
                )
                for qv in qtoks
            )
            scored.append((-s, did))
        scored.sort()
        for rank, (neg, did) in enumerate(scored[:K], 1):
            want.add((qid, rank, did, -neg))
    got = {
        tuple(r)
        for r in T.QUERIES["sim_maxsim_colbert"](spark, SF).collect()
    }
    assert got == want
