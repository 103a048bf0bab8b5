"""Laws for the round-5v keys (parquet row-group footer stats,
clustering-depth audit) — recomputed sequentially at sf0.001."""

from __future__ import annotations

from collections import defaultdict

import pandas as pd

import octospark.textops as T
from octospark.sources import load_table
from octospark.textops import (
    _RG_ROWS,
    _SCATTER_MOD,
    _SCATTER_MULT,
    _SCATTER_RED,
    rowgroup_stats_batches,
)

SF = "/root/testdata/sf0.001"


def _layouts(docs):
    ids = sorted(docs)
    scat = sorted(
        docs,
        key=lambda d: (
            ((d % _SCATTER_RED) * _SCATTER_MULT) % _SCATTER_MOD,
            d,
        ),
    )
    return {"sorted": ids, "scattered": scat}


def _groups(order):
    out = {}
    for rg in range(0, (len(order) + _RG_ROWS - 1) // _RG_ROWS):
        chunk = order[rg * _RG_ROWS : (rg + 1) * _RG_ROWS]
        out[rg] = (len(chunk), min(chunk), max(chunk))
    return out

def test_rowgroup_stats_match_pinned_chunking(spark):
    """Footer stats equal the pinned (sort order, 128-row chunk)
    model for BOTH layouts; sorted layout zone maps are disjoint."""
    docs = [
        r.doc_id for r in load_table(spark, SF, "documents").collect()
    ]
    want = set()
    for layout, order in _layouts(docs).items():
        for rg, (n, mn, mx) in _groups(order).items():
            want.add((layout, rg, n, mn, mx, 0))
    got = {
        tuple(r)
        for r in T.QUERIES["scan_parquet_rowgroup_stats"](
            spark, SF
        ).collect()
    }
    assert got == want
    srt = sorted(
        (mn, mx) for lo, _, _, mn, mx, _ in got if lo == "sorted"
    )
    assert all(
        srt[i][1] < srt[i + 1][0] for i in range(len(srt) - 1)
    )


def test_rowgroup_batch_fn_never_drops_corrupt_footer(spark):
    """A corrupt footer yields an error row, never an exception."""
    bad = pd.DataFrame(
        {
            "path": ["/x/layout_sorted.parquet"],
            "content": [b"PAR1 this is not a footer"],
        }
    )
    out = pd.concat(list(rowgroup_stats_batches(iter([bad]))))
    assert len(out) == 1 and out["error"].notna().all()
    assert out["layout"].iloc[0] == "sorted"


def test_clustering_depth_separates_layouts(spark):
    """Depth rows equal the sequential overlap census; every sorted
    group has depth 1, and scattered groups (with >1 group) have
    depth > 1 somewhere."""
    docs = [
        r.doc_id for r in load_table(spark, SF, "documents").collect()
    ]
    want = set()
    depth_by_layout = defaultdict(list)
    for layout, order in _layouts(docs).items():
        gs = _groups(order)
        for rg, (n, mn, mx) in gs.items():
            d = sum(
                1
                for (_, mn2, mx2) in gs.values()
                if mn2 <= mx and mx2 >= mn
            )
            want.add((layout, rg, mn, mx, n, d))
            depth_by_layout[layout].append(d)
    got = {
        tuple(r)
        for r in T.QUERIES["table_clustering_depth"](
            spark, SF
        ).collect()
    }
    assert got == want
    assert all(d == 1 for d in depth_by_layout["sorted"])
    if len(depth_by_layout["scattered"]) > 1:
        assert max(depth_by_layout["scattered"]) > 1
