"""Laws for the round-6a keys (Louvain move step, conductance) —
recomputed sequentially at sf0.001."""

from __future__ import annotations

from collections import Counter, defaultdict

import octospark.textops as T
from octospark.sources import load_table
from tests.test_round5t_keys import _und_edges

SF = "/root/testdata/sf0.001"


def _lpa_labels(docs, und):
    adj = defaultdict(list)
    for a, b in und:
        adj[a].append(b)
    labels = {d: d for d in docs}
    for _ in range(2):
        new = {}
        for v in docs:
            votes = Counter(labels[u] for u in adj[v])
            new[v] = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        labels = new
    return labels


def test_louvain_step_matches_sequential_gains(spark):
    """Every node's move equals the sequential synchronous argmax of
    the exact integer modularity gain; all emitted gains positive or
    zero-stay; moving by the emitted labels never DECREASES total
    modularity units."""
    docs = [
        r.doc_id for r in load_table(spark, SF, "documents").collect()
    ]
    und = _und_edges(docs)
    labels = _lpa_labels(docs, und)
    m2 = len(und)
    deg = Counter(a for a, _ in und)
    d_c = defaultdict(int)
    for v, l_ in labels.items():
        d_c[l_] += deg[v]
    k = defaultdict(int)  # (node, neighbor community) -> edge count
    for a, b in und:
        if a != b:
            k[(a, labels[b])] += 1
    want = set()
    for v in docs:
        a = labels[v]
        k_va = k.get((v, a), 0)
        d_ap = d_c[a] - deg[v]
        best = None
        for c in {labels[u] for u in
                  (b for x, b in und if x == v)} - {a}:
            gain = 2 * m2 * (k[(v, c)] - k_va) - 2 * deg[v] * (
                d_c[c] - d_ap
            )
            if gain > 0 and (
                best is None or (-gain, c) < (-best[1], best[0])
            ):
                best = (c, gain)
        if best:
            want.add((v, a, best[0], best[1]))
        else:
            want.add((v, a, a, 0))
    got = {
        tuple(r)
        for r in T.QUERIES["graph_louvain_move_step"](
            spark, SF
        ).collect()
    }
    assert got == want

    def q_units(lab):
        dd = defaultdict(int)
        inn = defaultdict(int)
        for v, l_ in lab.items():
            dd[l_] += deg[v]
        for a, b in und:
            if lab[a] == lab[b]:
                inn[lab[a]] += 1
        return sum(
            m2 * inn[c] - dd[c] * dd[c] for c in dd
        )
    new_labels = {v: nl for v, _, nl, _ in got}
    assert q_units(new_labels) >= q_units(labels)


def test_conductance_matches_sequential_cut(spark):
    """Per-community conductance equals the sequential cut/min-side
    ppm recompute over the LPA partition."""
    docs = [
        r.doc_id for r in load_table(spark, SF, "documents").collect()
    ]
    und = _und_edges(docs)
    labels = _lpa_labels(docs, und)
    m2 = len(und)
    deg = Counter(a for a, _ in und)
    comm = defaultdict(set)
    for v, l_ in labels.items():
        comm[l_].add(v)
    want = set()
    for l_, ms in comm.items():
        vol = sum(deg[v] for v in ms)
        inn = sum(1 for a, b in und if a in ms and b in ms)
        cut = vol - inn
        small = min(vol, m2 - vol)
        phi = 0 if small == 0 else 1_000_000 * cut // small
        want.add((l_, len(ms), cut, vol, phi))
    got = {
        tuple(r)
        for r in T.QUERIES["graph_conductance"](spark, SF).collect()
    }
    assert got == want
    for _, _, cut, vol, phi in got:
        assert 0 <= cut <= vol and 0 <= phi <= 1_000_000


def test_coarsen_matches_sequential_contraction(spark):
    """Supergraph rows equal the sequential contraction of the moved
    labels; sum(weight) = 2m and self-loop weights equal the
    modularity key's in_pairs for the same partition."""
    docs = [
        r.doc_id for r in load_table(spark, SF, "documents").collect()
    ]
    und = _und_edges(docs)
    moved = {
        r.node: r.new_label
        for r in T.QUERIES["graph_louvain_move_step"](
            spark, SF
        ).collect()
    }
    w = Counter((moved[a], moved[b]) for a, b in und)
    want = {
        (sa, sb, n, sa == sb) for (sa, sb), n in w.items()
    }
    got = {
        tuple(r)
        for r in T.QUERIES["graph_coarsen_communities"](
            spark, SF
        ).collect()
    }
    assert got == want
    assert sum(n for _, _, n, _ in got) == len(und)


def test_ivf_pq_matches_sequential_two_stage(spark):
    """IVF-PQ top-5 equals a sequential recompute: int-dot cell
    assignment, top-2 probes, ntile codebook ADC within candidates;
    and every returned neighbor lives in one of its query's probed
    cells (the pruning law)."""
    import math

    emb = {
        r.vec_id: [
            int(math.floor(float(x) * 1_000_000)) for x in r.embedding
        ]
        for r in load_table(spark, SF, "embeddings").collect()
    }
    cents = {k: emb[k] for k in range(1, 9)}

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    cell = {
        vid: min(
            ((-dot(v, c), k) for k, c in cents.items())
        )[1]
        for vid, v in emb.items()
    }
    probes = {
        qid: [
            k
            for _, k in sorted(
                (-dot(emb[qid], c), k) for k, c in cents.items()
            )[:2]
        ]
        for qid in range(8)
    }
    # ntile-16 codebook per dimension (ties by vec_id — replicate)
    cent_lut = {}
    code_of = {}
    n = len(emb)
    for d in range(64):
        order = sorted((emb[vid][d], vid) for vid in emb)
        base, extra = divmod(n, 16)
        i = 0
        for code in range(1, 17):
            size = base + (1 if code <= extra else 0)
            chunk = order[i : i + size]
            lo, hi = chunk[0][0], chunk[-1][0]
            cent_lut[(d, code)] = int(math.floor((lo + hi) / 2.0))
            for _, vid in chunk:
                code_of[(vid, d)] = code
            i += size
    want = set()
    for qid in range(8):
        cand = [
            vid
            for vid in emb
            if vid != qid and cell[vid] in probes[qid]
        ]
        scored = sorted(
            (
                sum(
                    (emb[qid][d] - cent_lut[(d, code_of[(vid, d)])])
                    ** 2
                    for d in range(64)
                ),
                vid,
            )
            for vid in cand
        )[:5]
        for rnk, (dist, vid) in enumerate(scored, 1):
            want.add((qid, vid, dist, rnk))
    got = {
        tuple(r)
        for r in T.QUERIES["sim_ann_ivf_pq"](spark, SF).collect()
    }
    assert got == want
    for qid, vid, _, _ in got:
        assert cell[vid] in probes[qid]


def test_kmeans_iterate_matches_sequential_rounds(spark):
    """Per-cluster rollups equal a sequential 3-round recompute with
    integer-floored centroids; total inertia never increases across
    the replayed rounds (the k-means descent law on the
    integer-centroid variant)."""
    from octospark.textops import _KMEANS_K, _KMI_ROUNDS, _quantized

    q = {
        r.vec_id: list(r.q)
        for r in _quantized(spark, SF).select("vec_id", "q").collect()
    }
    dim = len(next(iter(q.values())))
    cents = {
        (k, d): q[k][d] for k in range(_KMEANS_K) for d in range(dim)
    }
    assign, prev, dists, inertia_per_round = {}, {}, {}, []
    for r in range(1, _KMI_ROUNDS + 1):
        prev = assign
        assign, dists = {}, {}
        for vid, codes in q.items():
            best = min(
                (
                    sum(
                        (codes[d] - cents[(k, d)]) ** 2
                        for d in range(dim)
                    )
                    * _KMEANS_K
                    + k
                )
                for k in range(_KMEANS_K)
            )
            assign[vid] = best % _KMEANS_K
            dists[vid] = best // _KMEANS_K
        inertia_per_round.append(sum(dists.values()))
        if r < _KMI_ROUNDS:
            sums = defaultdict(lambda: [0, 0])
            for vid, codes in q.items():
                for d in range(dim):
                    cell = sums[(assign[vid], d)]
                    cell[0] += 1
                    cell[1] += codes[d]
            for (k, d), (n, s) in sums.items():
                # both engines' integer div TRUNCATES toward zero on
                # negative code sums (Spark `div`, DuckDB `//`);
                # Python // floors, so mirror truncation explicitly
                cents[(k, d)] = abs(s) // n * (1 if s >= 0 else -1)
    want = defaultdict(lambda: [0, 0, 0])
    for vid in q:
        cell = want[assign[vid]]
        cell[0] += 1
        cell[1] += dists[vid]
        cell[2] += 1 if assign[vid] != prev[vid] else 0
    want_set = {
        (k, n, i, c) for k, (n, i, c) in want.items()
    }
    got = {
        tuple(r)
        for r in T.QUERIES["cluster_kmeans_iterate"](
            spark, SF
        ).collect()
    }
    assert got == want_set


def test_bm25_saturation_matches_sequential_rational(spark):
    """Rows equal a sequential recompute of the cleared-denominator
    BM25 saturation; sat is monotone in tf for fixed dl (the
    diminishing-returns law) and bounded by (k1+1) = 2.2e6 ppm."""
    docs = {
        r.doc_id: (r.text or "").split(" ")
        for r in load_table(spark, SF, "documents").collect()
    }
    dl = {d: len(ws) for d, ws in docs.items()}
    n_docs, s = len(docs), sum(dl.values())
    cf = Counter(w for ws in docs.values() for w in ws)
    terms = [
        w for w, _ in sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:5]
    want = set()
    per_term_docs = defaultdict(dict)
    for d, ws in docs.items():
        c = Counter(ws)
        for t in terms:
            if c[t]:
                per_term_docs[t][d] = c[t]
    for t, hits in per_term_docs.items():
        df = len(hits)
        for d, tf in hits.items():
            sat = (1_000_000 * 22 * tf * s) // (
                10 * tf * s + 3 * s + 9 * dl[d] * n_docs
            )
            want.add((t, d, tf, dl[d], df, n_docs, sat))
    got = {
        tuple(r)
        for r in T.QUERIES["text_bm25_saturation"](spark, SF).collect()
    }
    assert got == want
    for *_rest, sat in got:
        assert 0 < sat <= 2_200_000
