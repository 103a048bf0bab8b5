"""Laws for the round-5f keys (alert debounce, column histogram,
ingest drift, shard skew) — each recomputed sequentially in Python at
sf0.001."""

from __future__ import annotations

import math
from collections import defaultdict

import octospark.relational as R
import octospark.textops as T
from octospark.sources import load_table
from tests.test_round5e_keys import _dense_hourly

SF = "/root/testdata/sf0.001"


def test_debounce_matches_sequential_streaks(spark):
    """raw/streak/alert equal a sequential pass over the densified
    series: streak = consecutive raw hours, alert at >= 3."""
    dense = _dense_hourly(spark)
    series = defaultdict(list)
    for (t, ws), n in sorted(dense.items()):
        series[t].append((ws, n))
    want = set()
    for t, seq in series.items():
        k = sum(n for _, n in seq) // len(seq)
        streak = 0
        for ws, n in seq:
            raw = n > 2 * k
            streak = streak + 1 if raw else 0
            want.add((t, ws, n, k, raw, streak, streak >= 3))
    got = {
        tuple(r)
        for r in R.QUERIES["events_alert_debounce"](
            spark, SF
        ).collect()
    }
    assert got == want


def test_debounce_alert_implies_three_raw_hours(spark):
    """Every alert row closes >= 3 consecutive raw hours; every raw
    single surrounded by quiet stays suppressed."""
    rows = R.QUERIES["events_alert_debounce"](spark, SF).collect()
    by_type = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append(r)
    for seq in by_type.values():
        seq.sort(key=lambda r: r.win_start)
        for i, r in enumerate(seq):
            if r.alert:
                assert all(p.raw for p in seq[i - 2 : i + 1])
            if r.raw and not r.alert:
                assert r.streak < 3


def test_histogram_partitions_the_table(spark):
    """Bucket stats recompute sequentially; buckets partition the
    rows exactly and min/max stay inside the bucket bounds."""
    ev = load_table(spark, SF, "events").collect()
    cells = defaultdict(list)
    for r in ev:
        cells[int(math.floor(r.value / 10.0))].append(r)
    rows = R.QUERIES["table_analyze_histogram"](spark, SF).collect()
    assert {r.bucket for r in rows} == set(cells)
    assert sum(r.n_rows for r in rows) == len(ev)
    for r in rows:
        got = cells[r.bucket]
        assert r.n_rows == len(got)
        assert r.n_users == len({g.user_id for g in got})
        assert r.min_value == min(g.value for g in got)
        assert r.max_value == max(g.value for g in got)
        assert r.bucket_lo == r.bucket * 10.0
        assert r.bucket_lo <= r.min_value <= r.max_value
        assert r.max_value < r.bucket_lo + 10.0


def test_ingest_drift_matches_sequential_tv(spark):
    """o/o_ppm/ref_ppm/dev_ppm/tv_ppm equal the sequential grid
    recomputation, and tv_ppm is bounded by 2e6 (it is 2x a total
    variation distance in ppm)."""
    docs = load_table(spark, SF, "documents").collect()
    per = defaultdict(int)
    tot = defaultdict(int)
    ref = defaultdict(int)
    for d in docs:
        b = d.n_chars // 64
        per[(d.source, b)] += 1
        tot[d.source] += 1
        ref[b] += 1
    n = len(docs)
    want = set()
    tv = {}
    for s in tot:
        tv[s] = sum(
            abs(
                1000000 * per.get((s, b), 0) // tot[s]
                - 1000000 * ref[b] // n
            )
            for b in ref
        )
    for s in tot:
        for b in ref:
            o = per.get((s, b), 0)
            want.add(
                (
                    s,
                    b,
                    o,
                    1000000 * o // tot[s],
                    1000000 * ref[b] // n,
                    1000000 * o // tot[s] - 1000000 * ref[b] // n,
                    tv[s],
                    tv[s] > 300000,
                )
            )
    got = {
        tuple(r)
        for r in T.QUERIES["corpus_ingest_drift"](spark, SF).collect()
    }
    assert got == want
    assert all(v <= 2000000 for v in tv.values())


def test_ingest_drift_grid_is_dense(spark):
    """Every (source, corpus-bucket) pair gets a row, including the
    zero-observed ones — missing a bucket IS drift."""
    rows = T.QUERIES["corpus_ingest_drift"](spark, SF).collect()
    sources = {r.source for r in rows}
    buckets = {r.bucket for r in rows}
    assert len(rows) == len(sources) * len(buckets)
    assert any(r.o == 0 for r in rows) or len(buckets) == 1


def test_shard_skew_matches_sequential_loads(spark):
    """Per-shard loads and the hot flag recompute sequentially; doc
    counts partition the corpus."""
    docs = load_table(spark, SF, "documents").collect()
    nd = defaultdict(int)
    nb = defaultdict(int)
    for d in docs:
        s = (d.doc_id * 2654435761) % 4294967296 % 64
        nd[s] += 1
        nb[s] += d.n_chars
    total = sum(nb.values())
    mx = max(nb.values())
    rows = T.QUERIES["corpus_shard_skew_audit"](spark, SF).collect()
    assert {r.shard for r in rows} == set(nd)
    assert sum(r.n_docs for r in rows) == len(docs)
    for r in rows:
        assert r.n_docs == nd[r.shard]
        assert r.n_bytes == nb[r.shard]
        assert r.load_ppm == 1000000 * nb[r.shard] * 64 // total
        assert r.max_load_ppm == 1000000 * mx * 64 // total
        assert r.is_hot == (nb[r.shard] * 64 > 2 * total)
    # a Knuth-hash sharding of uniform docs should not be hot anywhere
    assert not any(r.is_hot for r in rows)
