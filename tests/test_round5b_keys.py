"""Laws for the round-5b keys (MAD anomaly hours, running-distinct
window, safety-wordlist gate, sitemap coverage) — each recomputed
sequentially in Python at sf0.001."""

from __future__ import annotations

from collections import defaultdict
from statistics import median

import octospark.relational as R
import octospark.textops as T
import octospark.webops as W
from octospark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_anomaly_mad_matches_sequential_median(spark):
    """Every (type, hour) row carries exactly 2*median(n), 2*median(d2)
    of its type group, and the flag equals the integer
    cross-multiplied |n - med| > 3*MAD test."""
    ev = load_table(spark, SF, "events").collect()
    counts = defaultdict(int)
    for e in ev:
        counts[(e.event_type, e.ts.strftime("%Y-%m-%d %H:00:00"))] += 1
    by_type = defaultdict(list)
    for (t, _h), n in counts.items():
        by_type[t].append(n)
    med2 = {t: int(2 * median(ns)) for t, ns in by_type.items()}
    d2 = {
        (t, h): abs(2 * n - med2[t]) for (t, h), n in counts.items()
    }
    by_type_d2 = defaultdict(list)
    for (t, _h), v in d2.items():
        by_type_d2[t].append(v)
    mad4 = {t: int(2 * median(vs)) for t, vs in by_type_d2.items()}
    want = {
        (t, h, n, med2[t], mad4[t], d2[(t, h)],
         2 * d2[(t, h)] > 3 * mad4[t])
        for (t, h), n in counts.items()
    }
    got = {
        (r.event_type, r.win_start, r.n, r.med2, r.mad4, r.d2,
         r.is_anomaly)
        for r in R.QUERIES["events_anomaly_mad"](spark, SF).collect()
    }
    assert got == want


def test_running_distinct_matches_sequential_scan(spark):
    """n_types_seen equals the sequential per-user set-growth scan and
    is_new_type fires exactly on each first exposure."""
    ev = load_table(spark, SF, "events").collect()
    by_user = defaultdict(list)
    for e in ev:
        by_user[e.user_id].append((e.ts, e.event_id, e.event_type))
    want = {}
    for u, rows in by_user.items():
        rows.sort(key=lambda r: (r[0], r[1]))
        seen = set()
        for ts, eid, et in rows:
            new = et not in seen
            seen.add(et)
            want[eid] = (u, len(seen), new)
    out = R.QUERIES["window_running_distinct"](spark, SF).collect()
    assert len(out) == len(ev)
    for r in out:
        assert want[r.event_id] == (
            r.user_id, r.n_types_seen, r.is_new_type
        )


def test_safety_wordlist_gate_law(spark):
    """Never-drop: one verdict per doc; hits recomputed sequentially;
    keep is exactly the 12*hits <= words cross-multiplication."""
    docs = load_table(spark, SF, "documents").collect()
    lex = set(T._SAFETY_LEXICON)
    want = {}
    for d in docs:
        words = (d.text or "").split(" ") if d.text is not None else []
        if d.text is None:
            want[d.doc_id] = (0, 0, 0, True)
            continue
        hits = [w for w in words if w in lex]
        want[d.doc_id] = (
            len(words),
            len(hits),
            len(set(hits)),
            T._SAFETY_DENOM * len(hits) <= len(words),
        )
    out = T.QUERIES["text_safety_wordlist"](spark, SF).collect()
    assert len(out) == len(docs)
    for r in out:
        assert want[r.doc_id] == (
            r.n_words, r.n_hits, r.n_terms, r.keep
        ), r.doc_id


def test_sitemap_coverage_partition_law(spark):
    """Per host: n_both + n_missing == n_sitemap, n_both + n_extra ==
    n_crawled, coverage_ppm is exact floor ppm, and totals recompute
    from the doc base."""
    docs = load_table(spark, SF, "documents").collect()
    agg = defaultdict(lambda: [0, 0, 0, 0, 0])
    for d in docs:
        h = f"{d.source}.example.org"
        sm = d.doc_id % 2 == 0
        cr = d.doc_id % 3 != 0
        a = agg[h]
        a[0] += sm
        a[1] += cr
        a[2] += sm and cr
        a[3] += sm and not cr
        a[4] += cr and not sm
    out = W.QUERIES["crawl_sitemap_coverage"](spark, SF).collect()
    assert {r.host for r in out} == set(agg)
    for r in out:
        n_sm, n_cr, n_both, n_miss, n_extra = agg[r.host]
        assert (r.n_sitemap, r.n_crawled, r.n_both, r.n_missing,
                r.n_extra) == (n_sm, n_cr, n_both, n_miss, n_extra)
        assert r.n_both + r.n_missing == r.n_sitemap
        assert r.n_both + r.n_extra == r.n_crawled
        assert r.coverage_ppm == (n_both * 1_000_000) // max(n_sm, 1)
