"""Laws for the round-5y key (mark join) — recomputed sequentially
at sf0.001."""

from __future__ import annotations

import octospark.relational as R
from octospark.sources import load_table
from tests.test_plans import plan_of

SF = "/root/testdata/sf0.001"


def test_exists_flag_matches_sequential_and_keeps_all_rows(spark):
    """Every orders row survives exactly once with the correct flag;
    multi-match orders do NOT duplicate (the naive left-join bug)."""
    orders = load_table(spark, SF, "orders").collect()
    li = load_table(spark, SF, "lineitem").collect()
    returned = {
        r.l_orderkey for r in li if r.l_returnflag == "R"
    }
    want = {
        (r.o_orderkey, r.o_orderstatus, r.o_orderkey in returned)
        for r in orders
    }
    rows = R.QUERIES["join_exists_flag"](spark, SF).collect()
    assert len(rows) == len(orders)  # all kept, none duplicated
    assert {tuple(r) for r in rows} == want
    assert any(r.has_return for r in rows)
    assert any(not r.has_return for r in rows)


def test_exists_flag_plans_as_existence_join(spark):
    """The plan must be the single-build ExistenceJoin hash join —
    not a row-duplicating left join + distinct."""
    plan = plan_of(R.QUERIES["join_exists_flag"](spark, SF))
    assert "ExistenceJoin" in plan
