"""P2/P4 — best-match selection and deterministic/probabilistic merge
(modelled on the reference's test_match_candidate_selection fixtures,
FIXTURES.md §7)."""

import ray.data as rd

from moj_analytical_services_uk_address_matcher_ray.stages.best_match import (
    MATCH_REASON_EXACT,
    MATCH_REASON_SPLINK,
    best_matches_summary,
    best_matches_with_distinguishability,
    calculate_match_metrics,
    select_top_match_candidates,
)


def _exact_matches():
    # every messy row, nullable match columns (m3 unmatched)
    return rd.from_items(
        [
            {
                "unique_id": "m1",
                "ukam_address_id": "u_m1",
                "original_address_concat": "1 HIGH ST",
                "postcode": "AB1 2CD",
                "match_reason": MATCH_REASON_EXACT,
                "resolved_canonical_id": "c1",
                "canonical_ukam_address_id": "u_c1",
            },
            {
                "unique_id": "m2",
                "ukam_address_id": "u_m2",
                "original_address_concat": "2 LOW RD",
                "postcode": "AB1 2CD",
                "match_reason": None,
                "resolved_canonical_id": None,
                "canonical_ukam_address_id": None,
            },
            {
                "unique_id": "m3",
                "ukam_address_id": "u_m3",
                "original_address_concat": "9 NOWHERE",
                "postcode": "ZZ9 9ZZ",
                "match_reason": None,
                "resolved_canonical_id": None,
                "canonical_ukam_address_id": None,
            },
        ]
    )


def _splink_matches():
    # best-match rows incl. a duplicate-candidate case and one for an
    # already-exact-matched record (must be dropped by precedence)
    return rd.from_items(
        [
            {
                "unique_id_r": "m2",
                "ukam_address_id_r": "u_m2",
                "unique_id_l": "c2",
                "ukam_address_id_l": "u_c2",
                "address_concat_r": "2 LOW RD",
                "postcode_r": "AB1 2CD",
                "match_weight": 25.0,
                "distinguishability": 12.0,
                "distinguishability_category": "02: Distinguishability > 10",
            },
            {
                "unique_id_r": "m2",
                "ukam_address_id_r": "u_m2",
                "unique_id_l": "c9",
                "ukam_address_id_l": "u_c9",
                "address_concat_r": "2 LOW RD",
                "postcode_r": "AB1 2CD",
                "match_weight": 11.0,
                "distinguishability": None,
                "distinguishability_category": "05.: NaN (last match in group)",
            },
            {
                "unique_id_r": "m1",
                "ukam_address_id_r": "u_m1",
                "unique_id_l": "c1",
                "ukam_address_id_l": "u_c1",
                "address_concat_r": "1 HIGH ST",
                "postcode_r": "AB1 2CD",
                "match_weight": 30.0,
                "distinguishability": 20.0,
                "distinguishability_category": "02: Distinguishability > 10",
            },
        ]
    )


def _canonical():
    return rd.from_items(
        [
            {
                "ukam_address_id": f"u_c{i}",
                "original_address_concat": f"CANON {i}",
                "postcode": "AB1 2CD",
                "unique_id": f"c{i}",
            }
            for i in (1, 2, 9)
        ]
    )


def test_select_top_match_candidates(ray_session):
    out = select_top_match_candidates(
        _exact_matches(),
        _splink_matches(),
        _canonical(),
        match_weight_threshold=10.0,
        distinguishability_threshold=5.0,
    ).materialize()
    rows = {r["unique_id"]: r for r in out.take_all()}
    # exact match takes precedence for m1 (its splink row must not duplicate)
    assert rows["m1"]["match_reason"] == MATCH_REASON_EXACT
    assert rows["m1"]["resolved_canonical_id"] == "c1"
    # m2: splink fills, best candidate c2 (c9 fails the dist threshold anyway)
    assert rows["m2"]["match_reason"] == MATCH_REASON_SPLINK
    assert rows["m2"]["resolved_canonical_id"] == "c2"
    assert rows["m2"]["original_address_concat_canonical"] == "CANON 2"
    # m3: unmatched and include_unmatched=False -> absent
    assert "m3" not in rows
    assert len(rows) == 2


def test_include_unmatched_pass_through(ray_session):
    out = select_top_match_candidates(
        _exact_matches(),
        _splink_matches(),
        _canonical(),
        include_unmatched=True,
    ).materialize()
    rows = {r["unique_id"]: r for r in out.take_all()}
    assert "m3" in rows  # unmatched row passes through with null match cols
    assert rows["m3"]["match_reason"] is None
    assert len(rows) == 3


def test_match_metrics(ray_session):
    m = calculate_match_metrics(_exact_matches())
    got = dict(zip(m["match_reason"], m["match_count"]))
    assert got == {MATCH_REASON_EXACT: 1, "unmatched": 2}
    assert list(m["match_percentage"]) == ["66.67%", "33.33%"]


def test_best_matches_summary(ray_session):
    addresses = rd.from_items(
        [
            {
                "unique_id": "m1",
                "ukam_address_id": "u_m1",
                "original_address_concat": "1 HIGH ST",
                "postcode": "AB1 2CD",
            },
            {
                "unique_id": "m4",
                "ukam_address_id": "u_m4",
                "original_address_concat": "NO MATCH HOUSE",
                "postcode": "XX1 1XX",
            },
        ]
    )
    pairs = rd.from_items(
        [
            {
                "unique_id_r": "m1",
                "unique_id_l": "c1",
                "ukam_address_id_r": "u_m1",
                "ukam_address_id_l": "u_c1",
                "original_address_concat_l": "1 HIGH ST",
                "postcode_l": "AB1 2CD",
                "match_weight": 20.0,
            },
            {
                "unique_id_r": "m1",
                "unique_id_l": "c2",
                "ukam_address_id_r": "u_m1",
                "ukam_address_id_l": "u_c2",
                "original_address_concat_l": "1 HIGH STREET",
                "postcode_l": "AB1 2CD",
                "match_weight": 5.0,
            },
        ]
    )
    best = best_matches_with_distinguishability(pairs, addresses).materialize()
    summary = best_matches_summary(best)
    got = dict(zip(summary["distinguishability_category"], summary["count"]))
    assert got == {"02: Distinguishability > 10": 1, "99: No match": 1}
    assert list(summary["percentage"]) == ["50.00%", "50.00%"]
