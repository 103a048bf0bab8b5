"""Laws for the round-5s keys (CDX capture index, top session paths)
— recomputed sequentially at sf0.001."""

from __future__ import annotations

import datetime
from collections import Counter, defaultdict

import octospark.relational as R
import octospark.webops as W
from octospark.htmlgen import build_url, build_warc_ts
from octospark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_cdx_index_matches_htmlgen_formulas(spark):
    """urlkey/ts14/url/length equal the htmlgen url + capture-time
    formulas applied per document; idx_in_host numbers doc_id order
    within each host."""
    docs = sorted(
        load_table(spark, SF, "documents").collect(),
        key=lambda r: r.doc_id,
    )
    want = set()
    seq = defaultdict(int)
    for r in docs:
        host = f"{r.source}.example.org"
        seq[host] += 1
        surt = ",".join(reversed(host.split(".")))
        want.add(
            (
                f"{surt})/doc/{r.doc_id}",
                build_warc_ts(r.doc_id).strftime("%Y%m%d%H%M%S"),
                build_url(r.doc_id, r.source),
                r.n_chars,
                seq[host],
            )
        )
    got = {
        tuple(r)
        for r in W.QUERIES["crawl_cdx_index"](spark, SF).collect()
    }
    assert got == want
    # urlkey range-scan property: every key for one host shares the
    # reversed-host prefix, and keys sort hosts together
    assert all(k.split(")")[0].count(",") == 2 for k, *_ in got)


def test_top_paths_match_sequential_sessionization(spark):
    """Top-10 paths equal a sequential gap-sessionize + leading-3-gram
    census with (count desc, path) ranking."""
    ev = sorted(
        load_table(spark, SF, "events").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    gap_us = 1800 * 1_000_000
    paths = Counter()
    cur_user, last_us, cur_path = None, None, []

    def flush():
        if cur_path:
            paths[" > ".join(cur_path[:3])] += 1

    for r in ev:
        us = int(
            r.ts.replace(tzinfo=datetime.timezone.utc).timestamp()
            * 1_000_000
        )
        if r.user_id != cur_user or us - last_us > gap_us:
            flush()
            cur_user, cur_path = r.user_id, []
        last_us = us
        cur_path.append(r.event_type)
    flush()
    ranked = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    want = {
        (p, n, i + 1) for i, (p, n) in enumerate(ranked)
    }
    got = {
        tuple(r)
        for r in R.QUERIES["events_top_paths"](spark, SF).collect()
    }
    assert got == want
