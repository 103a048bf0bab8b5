"""Laws for the round-5 keys (gap sessionization, SCD2 history,
containment dedup, label propagation, peak concurrency) — each
recomputed sequentially in Python."""

from __future__ import annotations

from collections import defaultdict

import octospark.relational as R
import octospark.textops as T
from octospark.sources import load_table

SF = "/root/testdata/sf0.001"

_GAP_US = 1800 * 1_000_000


def _us(ts):
    import datetime

    return int(
        ts.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000
    )


def test_sessionize_gap_matches_sequential_split(spark):
    """Every (user, session) row equals the Python sequential split:
    sort a user's events by (ts, event_id), start a new session when
    the gap to the previous event exceeds 30 minutes."""
    ev = load_table(spark, SF, "events").collect()
    by_user = defaultdict(list)
    for e in ev:
        by_user[e.user_id].append((e.ts, e.event_id))
    want = set()
    for u, rows in by_user.items():
        rows.sort()
        sessions, cur = [], [rows[0]]
        for prev, nxt in zip(rows, rows[1:]):
            if _us(nxt[0]) - _us(prev[0]) > _GAP_US:
                sessions.append(cur)
                cur = []
            cur.append(nxt)
        sessions.append(cur)
        for sid, s in enumerate(sessions, start=1):
            ts = [t for t, _ in s]
            want.add(
                (
                    u,
                    sid,
                    len(s),
                    min(ts),
                    max(ts),
                    _us(max(ts)) - _us(min(ts)),
                )
            )
    out = R.QUERIES["events_sessionize_gap"](spark, SF).collect()
    got = {
        (
            r.user_id,
            r.session_id,
            r.n_events,
            r.session_start,
            r.session_end,
            r.duration_us,
        )
        for r in out
    }
    assert got == want
    # sessions of one user never overlap and are separated by > 30 min
    by_u = defaultdict(list)
    for r in out:
        by_u[r.user_id].append(r)
    for rs in by_u.values():
        rs.sort(key=lambda r: r.session_id)
        for a, b in zip(rs, rs[1:]):
            assert _us(b.session_start) - _us(a.session_end) > _GAP_US


def test_scd2_history_is_run_compaction(spark):
    """Intervals per customer tile the order timeline: run-compressed
    statuses from the (o_orderdate, o_orderkey)-sorted history, each
    valid_to equals the next row's valid_from, exactly one open
    (is_current=1) interval per customer, never two adjacent rows with
    the same status."""
    orders = load_table(spark, SF, "orders").collect()
    by_cust = defaultdict(list)
    for o in orders:
        by_cust[o.o_custkey].append(
            (o.o_orderdate, o.o_orderkey, o.o_orderstatus)
        )
    want = {}
    for c, rows in by_cust.items():
        rows.sort()
        runs = []
        for d, _, s in rows:
            if not runs or runs[-1][1] != s:
                runs.append((d, s))
        want[c] = runs
    out = R.QUERIES["table_scd2_history"](spark, SF).collect()
    by_c = defaultdict(list)
    for r in out:
        by_c[r.custkey].append(r)
    assert set(by_c) == set(want)
    for c, rs in by_c.items():
        rs.sort(key=lambda r: r.valid_from)
        assert [(r.valid_from, r.status) for r in rs] == want[c]
        for a, b in zip(rs, rs[1:]):
            assert a.valid_to == b.valid_from
            assert a.status != b.status
            assert a.is_current == 0
        assert rs[-1].is_current == 1 and rs[-1].valid_to is None


def test_containment_finds_injected_snippets(spark):
    """The 50 injected 30-word-prefix snippets (doc_id+200000) are all
    reported against their source doc with containment 1.0, and every
    reported pair's containment matches the Python set recount over
    word-3-gram shingles of the same constructed doc pool."""
    docs = {
        d.doc_id: d.text
        for d in load_table(spark, SF, "documents")
        .filter("doc_id < 100")
        .collect()
    }
    pool = dict(docs)
    for k in range(50):
        pool[k + 200000] = " ".join(docs[k].split(" ")[:30])

    def shingles(text):
        w = text.split(" ")
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    sets = {i: shingles(t) for i, t in pool.items()}
    want = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if not inter:
                continue
            c = inter / min(len(sets[a]), len(sets[b]))
            if c >= 0.8:
                want[(a, b)] = c
    out = T.QUERIES["dedup_containment"](spark, SF).collect()
    got = {(r.id1, r.id2): r.containment for r in out}
    assert got == want
    for k in range(50):
        assert got[(k, k + 200000)] == 1.0


def test_label_propagation_matches_sequential_rounds(spark):
    """Two synchronous LPA rounds recomputed in Python over the same
    modular edge list (symmetrized, min-label tie-break) match the
    Spark result exactly, and every final label is a real node id."""
    import octospark.textops as T2

    docs = load_table(spark, SF, "documents").select("doc_id").collect()
    n = len(docs)
    ids = sorted(d.doc_id for d in docs)
    nbrs = defaultdict(set)
    for v in ids:
        for u in ((v * 17 + 1) % n, (v * 31 + 7) % n, (v + 1) % n):
            nbrs[v].add(u)
            nbrs[u].add(v)
    labels = {v: v for v in ids}
    for _ in range(2):
        nxt = {}
        for v in ids:
            counts = defaultdict(int)
            for u in nbrs[v]:
                counts[labels[u]] += 1
            nxt[v] = min(counts, key=lambda l: (-counts[l], l))
        labels = nxt
    out = T2.QUERIES["graph_label_propagation"](spark, SF).collect()
    got = {r.node: r.label for r in out}
    assert got == labels
    assert set(got.values()) <= set(ids)


def test_peak_concurrency_matches_brute_sweep(spark):
    """Per event type, (peak, earliest peak instant) equals the brute
    single-threaded sweep over +1/-1 boundaries of the 5-minute hold
    windows — i.e. the distributed two-level prefix sum computes the
    same global running-sum maximum as the sequential sweep."""
    from datetime import timedelta

    ev = load_table(spark, SF, "events").collect()
    bounds = defaultdict(list)
    for e in ev:
        bounds[e.event_type].append((e.ts, 1))
        bounds[e.event_type].append((e.ts + timedelta(seconds=300), -1))
    want = {}
    for t, bs in bounds.items():
        bs.sort(key=lambda b: (b[0], -b[1]))
        run = peak = 0
        peak_ts = None
        for ts, d in bs:
            run += d
            if run > peak:
                peak, peak_ts = run, ts
        want[t] = (peak, peak_ts)
    out = R.QUERIES["events_peak_concurrency"](spark, SF).collect()
    got = {r.event_type: (r.peak_concurrency, r.peak_ts) for r in out}
    assert got == want


def test_minhash_recall_eval_matches_python_replay(spark):
    """Full sequential replay of the oracle-checkable MinHash eval:
    polynomial shingle hashes, 16 affine signature mins, 8x2 bands
    with the 64-lowest-id bucket cap, exact-Jaccard truth over the
    same injected truncation pool, per-bucket recall — and the LSH
    completeness corner: every J == 1.0 pair is caught (identical
    shingle sets force identical signatures)."""
    import math

    P = 1_000_000_007
    docs = {
        d.doc_id: d.text
        for d in load_table(spark, SF, "documents")
        .filter("doc_id < 100")
        .collect()
    }
    pool = dict(docs)
    for k in range(50):
        pool[k + 300000] = " ".join(docs[k].split(" ")[: 6 + 3 * k])

    def sh_list(text):
        w = text.split(" ")
        return [" ".join(w[i : i + 3]) for i in range(len(w) - 2)]

    def hx(sg):
        acc = 7
        for ch in sg:
            acc = (acc * 31 + ord(ch)) % P
        return acc

    sigs = {}
    for i, t in pool.items():
        xs = [hx(g) for g in sh_list(t)]
        if not xs:
            continue
        sigs[i] = [
            min(((2 * s + 3) * x + (97 * s + 11)) % P for x in xs)
            for s in range(16)
        ]
    buckets = defaultdict(list)
    for i in sorted(sigs):
        m = sigs[i]
        for b in range(8):
            buckets[(b, m[2 * b], m[2 * b + 1])].append(i)
    cand = set()
    for mem in buckets.values():
        mem = sorted(mem)[:64]
        for ai in range(len(mem)):
            for bi in range(ai + 1, len(mem)):
                cand.add((mem[ai], mem[bi]))
    sets = {i: set(sh_list(t)) for i, t in pool.items()}
    want = defaultdict(lambda: [0, 0])
    ones = []
    for a in sorted(sets):
        for b in sorted(sets):
            if a >= b or not (sets[a] & sets[b]):
                continue
            j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
            if j < 0.1:
                continue
            bk = math.floor(j * 10)
            want[bk][0] += 1
            want[bk][1] += (a, b) in cand
            if j == 1.0:
                ones.append((a, b))
    out = T.QUERIES["dedup_minhash_recall_eval"](spark, SF).collect()
    got = {r.j_bucket: (r.n_truth, r.n_caught, r.recall) for r in out}
    assert got == {
        bk: (n, c, c / n) for bk, (n, c) in want.items()
    }
    assert ones and all(p in cand for p in ones)
