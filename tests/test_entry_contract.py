"""Driver-contract consistency: the invariants the correctness harness
relies on but never states — every query has an oracle, the parked
tail is exactly the tail (so the 50-row driver cap lands on the
priority head), and the head holds the full reference-view surface.
Pure-Python (no Spark jobs): queries() only builds closures."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as ent


def test_every_query_is_oracled_and_vice_versa():
    q, o = ent.queries(), ent.oracle_sql()
    assert set(q) == set(o)


def test_parked_tail_is_exactly_the_tail():
    q = ent.queries()
    parked = ent._PARKED_TAIL
    assert len(set(parked)) == len(parked), "duplicate parked key"
    assert set(parked) <= set(q), "parked key not in queries()"
    assert list(q)[-len(parked):] == list(parked)


def test_priority_head_fits_driver_cap_and_holds_reference_views():
    q = ent.queries()
    head = list(q)[:50]
    assert len(q) - len(ent._PARKED_TAIL) <= 50, (
        "unparked keys exceed the measured 50-row driver correctness cap; "
        "park the most redundant new key (with a family comment)")
    for view_key in ent._VIEW_KEYS.values():
        assert view_key in head, f"{view_key} fell out of the priority head"
    for audited in ("knn_ivf", "knn_ivf_multiprobe", "dedup_clusters"):
        assert audited in head
