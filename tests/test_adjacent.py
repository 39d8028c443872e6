"""C14 — adjacent-record distinguishing-token derivation (opt-in op)."""

import pyarrow as pa
import ray
import ray.data as rd

from moj_analytical_services_uk_address_matcher_ray.pipelines.clean import (
    derive_adjacent_distinguishing_tokens,
)


def test_adjacent_exact_across_block_boundary(ray_session):
    """The global window must be exact at block boundaries: rows 2 and 3 are
    sorted neighbours placed in DIFFERENT blocks; each must still see the
    other as its lag/lead (reference token_parsing.py:11-115 single-table
    window)."""
    rows = [
        {"unique_id": 1, "address_concat": "FLAT 1A 8 ORCHARD WAY"},
        {"unique_id": 2, "address_concat": "FLAT 2B 8 ORCHARD WAY"},
        {"unique_id": 3, "address_concat": "FLAT 3C 8 ORCHARD WAY"},
        {"unique_id": 4, "address_concat": "99 TOTALLY DIFFERENT ROAD"},
    ]
    # presorted layout (sorted by reverse(address_concat)): suffix "YAW ..."
    # sorts the flats together, "DAOR ..." row last?  Compute the real order.
    order = sorted(rows, key=lambda r: r["address_concat"][::-1])
    t = pa.Table.from_pylist(order)
    blocks = [t.slice(0, 2), t.slice(2, 2)]  # boundary between neighbours
    ds = rd.from_arrow_refs([ray.put(b) for b in blocks])
    out = derive_adjacent_distinguishing_tokens(ds, presorted=True).materialize()
    got = {r["unique_id"]: r for r in out.take_all()}
    for uid in (1, 2, 3):
        assert got[uid]["common_adj_start_tokens"] == ["8", "ORCHARD", "WAY"], uid
    # single-block answer must be identical
    single = derive_adjacent_distinguishing_tokens(
        rd.from_arrow(t), presorted=True
    ).materialize()
    got_single = {r["unique_id"]: r for r in single.take_all()}
    for uid in got:
        assert (
            got[uid]["distinguishing_adj_start_tokens"]
            == got_single[uid]["distinguishing_adj_start_tokens"]
        )
        assert (
            got[uid]["common_adj_start_tokens"]
            == got_single[uid]["common_adj_start_tokens"]
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
