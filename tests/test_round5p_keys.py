"""Laws for the round-5p keys (forecast-residual alarm, equi-height
histogram, degree histogram) — recomputed sequentially at sf0.001."""

from __future__ import annotations

from collections import defaultdict

import octospark.relational as R
import octospark.textops as T
from octospark.sources import load_table
from tests.test_round5e_keys import _dense_hourly
from tests.test_round5k_keys import _und

SF = "/root/testdata/sf0.001"


def test_residual_alarm_matches_sequential_composition(spark):
    """pred/resid/alarm equal the sequential Holt forecast lagged one
    hour with the integer guard band; the first hour is unjudged."""
    dense = _dense_hourly(spark)
    series = defaultdict(list)
    for (t, ws), n in sorted(dense.items()):
        series[t].append((ws, n))
    want = set()
    for t, seq in series.items():
        k = sum(n for _, n in seq) // len(seq)
        guard = 3 * max(2 * k, 4)
        s1 = s2 = 0
        pred = None
        for ws, n in seq:
            if pred is None:
                want.add((t, ws, n, None, None, False))
            else:
                resid = abs(3 * n - pred)
                want.add((t, ws, n, pred, resid, resid > guard))
            s1 = (n + 3 * s1) // 4
            s2 = (s1 + 3 * s2) // 4
            pred = 7 * s1 - 4 * s2
    got = {
        tuple(r)
        for r in R.QUERIES["events_forecast_residual_alarm"](
            spark, SF
        ).collect()
    }
    assert got == want


def test_equiheight_tiles_are_balanced_and_ordered(spark):
    """Tile stats equal the sequential ntile over the total order:
    balanced counts (±1), non-overlapping increasing boundaries."""
    ev = sorted(
        load_table(spark, SF, "events").collect(),
        key=lambda r: (r.value, r.event_id),
    )
    n = len(ev)
    base, extra = divmod(n, 20)
    want = {}
    i = 0
    for tile in range(1, 21):
        size = base + (1 if tile <= extra else 0)
        chunk = ev[i : i + size]
        i += size
        want[tile] = (
            size,
            len({r.user_id for r in chunk}),
            min(r.value for r in chunk),
            max(r.value for r in chunk),
        )
    rows = R.QUERIES["table_analyze_equiheight"](spark, SF).collect()
    got = {
        r.tile: (r.n_rows, r.n_users, r.min_value, r.max_value)
        for r in rows
    }
    assert got == want
    bounds = [got[t] for t in range(1, 21)]
    for a, b in zip(bounds, bounds[1:]):
        assert a[3] <= b[2]  # boundaries increase


def test_degree_histogram_matches_sequential_census(spark):
    """Bucket counts equal the sequential bit-length census over the
    canonical edge list; buckets partition the nodes."""
    docs = [
        r.doc_id for r in load_table(spark, SF, "documents").collect()
    ]
    und = _und(docs)
    deg = defaultdict(int)
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    cells = defaultdict(list)
    for _, d in deg.items():
        cells[d.bit_length()].append(d)
    want = {
        (b, len(v), min(v), max(v)) for b, v in cells.items()
    }
    got = {
        tuple(r)
        for r in T.QUERIES["graph_degree_histogram"](
            spark, SF
        ).collect()
    }
    assert got == want
    assert sum(x[1] for x in got) == len(deg)
