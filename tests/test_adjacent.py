"""C14 — adjacent-record distinguishing-token derivation (opt-in op)."""

import ray.data as rd

from moj_analytical_services_uk_address_matcher_ray.pipelines.clean import (
    derive_adjacent_distinguishing_tokens,
)


def test_adjacent_suffix_split(ray_session):
    # three flats in one building share the '8 ORCHARD WAY' suffix; after the
    # reverse-string sort they are adjacent, so the shared suffix moves to
    # common_adj_start_tokens and the flat-specific head stays distinguishing
    rows = [
        {"unique_id": 1, "address_concat": "FLAT 1A 8 ORCHARD WAY"},
        {"unique_id": 2, "address_concat": "FLAT 2B 8 ORCHARD WAY"},
        {"unique_id": 3, "address_concat": "FLAT 3C 8 ORCHARD WAY"},
        {"unique_id": 4, "address_concat": "99 TOTALLY DIFFERENT ROAD"},
    ]
    out = derive_adjacent_distinguishing_tokens(rd.from_items(rows)).materialize()
    got = {r["unique_id"]: r for r in out.take_all()}
    # FLAT is stripped before comparison (reference token_parsing.py:33-37)
    assert got[1]["common_adj_start_tokens"] == ["8", "ORCHARD", "WAY"]
    assert got[1]["distinguishing_adj_start_tokens"] == ["1A"]
    assert got[2]["distinguishing_adj_start_tokens"] == ["2B"]
    # the unrelated record shares no suffix with its neighbours
    assert got[4]["common_adj_start_tokens"] == []
    assert got[4]["distinguishing_adj_start_tokens"] == [
        "99",
        "TOTALLY",
        "DIFFERENT",
        "ROAD",
    ]
