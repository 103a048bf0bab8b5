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


def test_windowed_topk_rank_law(spark):
    """Per window: ranks are 1..k dense, counts non-increasing with
    rank, tie broken on event_type, and every (win, type) kept is
    truly among the window's top-k by (n desc, type asc)."""
    from collections import defaultdict

    ev = _events(spark)
    counts = defaultdict(lambda: defaultdict(int))
    for e in ev:
        win = e.ts.replace(minute=0, second=0, microsecond=0)
        counts[win.strftime("%Y-%m-%d %H:%M:%S")][e.event_type] += 1
    out = R.QUERIES["stream_windowed_topk"](spark, SF).collect()
    by_win = defaultdict(list)
    for r in out:
        by_win[r.win_start].append(r)
    assert set(by_win) <= set(counts)
    for win, rs in by_win.items():
        rs.sort(key=lambda r: r.rnk)
        want = sorted(
            counts[win].items(), key=lambda kv: (-kv[1], kv[0])
        )[: R._WIN_TOPK]
        assert [(r.event_type, r.n) for r in rs] == want
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))


def test_split_assign_stable_proportions_and_determinism(spark):
    """Assignment is a pure function of doc_id (stable across runs and
    subsets), proportions approximate 80/10/10, and every doc appears
    exactly once."""
    from octospark.sources import load_table

    out = {
        r.doc_id: (r.bucket, r.split)
        for r in R.QUERIES["corpus_split_assign"](spark, SF).collect()
    }
    n = load_table(spark, SF, "documents").count()
    assert len(out) == n
    for doc_id, (bucket, split) in out.items():
        want_bucket = ((doc_id % R._SPLIT_REDUCE) * R._SPLIT_MULT) % 100
        assert bucket == want_bucket
        assert split == (
            "train" if bucket < 80 else "val" if bucket < 90 else "test"
        )
    from collections import Counter

    shares = Counter(s for _, s in out.values())
    assert 0.7 < shares["train"] / n < 0.9
    assert 0.03 < shares["val"] / n < 0.2
    assert 0.03 < shares["test"] / n < 0.2


def test_mode_most_frequent_matches_recount(spark):
    """Mode per lang equals the Python recount with lexicographic
    tie-break."""
    from collections import Counter, defaultdict

    from octospark.sources import load_table

    docs = load_table(spark, SF, "documents").collect()
    per_lang = defaultdict(Counter)
    for d in docs:
        per_lang[d.lang][d.source] += 1
    out = {
        r.lang: (r.mode_source, r.mode_count)
        for r in R.QUERIES["agg_mode_most_frequent"](spark, SF).collect()
    }
    assert set(out) == set(per_lang)
    for lang, c in per_lang.items():
        m = max(c.values())
        src = min(s for s, k in c.items() if k == m)
        assert out[lang] == (src, m)


def test_bitwise_funcs_match_python(spark):
    """Every bitwise column equals the Python operator result."""
    for r in R.QUERIES["scalar_bitwise_funcs"](spark, SF).collect():
        d = r.doc_id
        assert r.band == d & 255
        assert r.bor == d | 4096
        assert r.bxor == d ^ 21845
        assert r.shl == (d & (2**60 - 1)) << 3
        assert r.shr == d >> 2
        assert r.popcount == bin(d).count("1")


def test_asof_next_matches_sequential_scan(spark):
    """next_purchase_ts equals the earliest purchase strictly later in
    (ts, event_id) order, per view event; the 24h label follows."""
    import datetime as dt

    ev = _events(spark)
    from collections import defaultdict

    by_user = defaultdict(list)
    for e in ev:
        by_user[e.user_id].append(e)
    out = {
        r.event_id: r
        for r in R.QUERIES["join_asof_next"](spark, SF).collect()
    }
    n_views = sum(1 for e in ev if e.event_type == "view")
    assert len(out) == n_views
    for u, rows in by_user.items():
        rows.sort(key=lambda e: (e.ts, e.event_id))
        for i, e in enumerate(rows):
            if e.event_type != "view":
                continue
            nxt = min(
                (
                    x.ts
                    for x in rows[i + 1 :]
                    if x.event_type == "purchase"
                ),
                default=None,
            )
            r = out[e.event_id]
            assert r.next_purchase_ts == nxt
            want_label = (
                nxt is not None and nxt <= e.ts + dt.timedelta(days=1)
            )
            assert r.converted_24h == want_label


def test_anomaly_flag_is_exact_and_matches_z(spark):
    """The integer flag agrees with the float z at the threshold
    (flag <=> |z| > 2 given nonzero variance), counts recount
    correctly, and per-type flags are a strict minority."""
    from collections import defaultdict

    ev = _events(spark)
    counts = defaultdict(lambda: defaultdict(int))
    for e in ev:
        w = e.ts.replace(minute=0, second=0, microsecond=0)
        counts[e.event_type][w.strftime("%Y-%m-%d %H:%M:%S")] += 1
    rows = R.QUERIES["events_anomaly_hours"](spark, SF).collect()
    per_type = defaultdict(list)
    for r in rows:
        assert r.n == counts[r.event_type][r.win_start]
        c = counts[r.event_type]
        cnt, sn = len(c), sum(c.values())
        sq = sum(v * v for v in c.values())
        num = r.n * cnt - sn
        varn = cnt * sq - sn * sn
        assert r.is_anomaly == (num * num > 4 * varn)
        if varn > 0:
            assert abs(r.z) > 2 if r.is_anomaly else abs(r.z) <= 2
        per_type[r.event_type].append(r.is_anomaly)
    for t, flags in per_type.items():
        assert sum(flags) < len(flags) / 2, t


def test_corrupt_jsonl_scan_recovers_and_surfaces(spark):
    """The PERMISSIVE scan emits one row per input line: recovered
    rows carry intact values, corrupt rows (every 17th doc) carry NULL
    fields and is_corrupt=true — never dropped, never a task failure."""
    from octospark.sources import load_table

    docs = {
        d.doc_id: d.lang
        for d in load_table(spark, SF, "documents").collect()
    }
    rows = R.QUERIES["scan_jsonl_corrupt_tolerant"](spark, SF).collect()
    assert len(rows) == len(docs)
    n_corrupt_want = sum(1 for d in docs if d % 17 == 0)
    good = [r for r in rows if not r.is_corrupt]
    bad = [r for r in rows if r.is_corrupt]
    assert len(bad) == n_corrupt_want
    assert all(r.doc_id is None and r.lang is None for r in bad)
    assert {r.doc_id: r.lang for r in good} == {
        d: lg for d, lg in docs.items() if d % 17 != 0
    }


def test_markov_transitions_match_sequential_recount(spark):
    """Transition counts equal a Python recount over per-user
    (ts, event_id)-ordered sequences; probabilities are the single
    divisions and each row of the matrix sums to 1."""
    from collections import Counter, defaultdict

    ev = _events(spark)
    by_user = defaultdict(list)
    for e in ev:
        by_user[e.user_id].append(e)
    want: Counter = Counter()
    for rows_ in by_user.values():
        rows_.sort(key=lambda e: (e.ts, e.event_id))
        for a, b in zip(rows_, rows_[1:]):
            want[(a.event_type, b.event_type)] += 1
    out = R.QUERIES["events_markov_transitions"](spark, SF).collect()
    assert {(r.cur, r.nxt): r.n for r in out} == dict(want)
    row_mass: dict = defaultdict(float)
    row_tot: dict = defaultdict(int)
    for (c, _), n in want.items():
        row_tot[c] += n
    for r in out:
        assert r.p == r.n / row_tot[r.cur]
        row_mass[r.cur] += r.p
    assert all(abs(m - 1.0) < 1e-9 for m in row_mass.values())


def test_edit_distance_matches_known_noise_distances(spark):
    """Each noise style has a known exact distance: substitution -> 1,
    deletion -> 1, append ' extra' -> 6."""
    rows = R.QUERIES["scalar_edit_distance"](spark, SF).collect()
    assert rows
    for r in rows:
        want = {0: 1, 1: 1, 2: 6}[r.doc_id % 3]
        assert r.dist == want, (r.doc_id, r.dist)


def test_ab_lift_test_matches_integer_decision(spark):
    """Counts recount from the stream; z matches the pooled formula on
    the exact integers; the integer decision agrees with |z| > 2."""
    import math

    ev = _events(spark)
    n_a = sum(1 for e in ev if e.user_id % 2 == 0)
    x_a = sum(
        1 for e in ev if e.user_id % 2 == 0 and e.event_type == "purchase"
    )
    n_b = len(ev) - n_a
    x_b = sum(
        1 for e in ev if e.user_id % 2 == 1 and e.event_type == "purchase"
    )
    r = R.QUERIES["events_ab_lift_test"](spark, SF).collect()
    assert len(r) == 1
    r = r[0]
    assert (r.n_a, r.x_a, r.n_b, r.x_b) == (n_a, x_a, n_b, x_b)
    num = x_a * n_b - x_b * n_a
    x, n = x_a + x_b, n_a + n_b
    want_sig = num * num * n > 4 * n_a * n_b * x * (n - x)
    assert r.significant == want_sig
    z = float(num) / math.sqrt(float(n_a * n_b) * x * (n - x) / n)
    assert r.z == z
    assert want_sig == (abs(z) > 2) or abs(abs(z) - 2) < 1e-9


def test_ewma_matches_ordered_fold_replay(spark):
    """EWMA equals the exact Python replay of the halving fold over
    each row's 8-hour ordered DENSIFIED history (every hour between a
    type's first and last event present, zero-count where silent),
    and never exceeds the window max (seeded from 0)."""
    from collections import defaultdict
    from datetime import timedelta

    ev = _events(spark)
    counts = defaultdict(lambda: defaultdict(int))
    for e in ev:
        w = e.ts.replace(minute=0, second=0, microsecond=0)
        counts[e.event_type][w] += 1
    rows = R.QUERIES["events_ewma_hourly"](spark, SF).collect()
    by_type = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append(r)
    assert set(by_type) == set(counts)
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r.win_start)
        lo, hi = min(counts[t]), max(counts[t])
        series, w = [], lo
        while w <= hi:  # densified: zero rows for silent hours
            series.append(
                (w.strftime("%Y-%m-%d %H:%M:%S"), counts[t].get(w, 0))
            )
            w += timedelta(hours=1)
        assert any(n == 0 for _, n in series) or len(series) == len(
            counts[t]
        )
        assert [(r.win_start, r.n) for r in rs] == series
        for i, r in enumerate(rs):
            hist = [float(n) for _, n in series[max(0, i - 7) : i + 1]]
            acc = 0.0
            for x in hist:
                acc = (acc + x) / 2
            assert r.ewma == acc
            assert r.ewma <= max(hist)
