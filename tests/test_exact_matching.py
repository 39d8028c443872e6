"""Deterministic matching golden tests — modelled on the reference's
tests/test_exact_matching.py:10-181 (duplicate unique_ids, row-count
preservation) plus trigram/trie/self-dedup behaviours."""

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from moj_analytical_services_uk_address_matcher_ray.stages.exact import (
    annotate_exact_matches,
    resolve_with_trigrams,
    restrict_canonical_to_fuzzy_keys,
    run_deterministic_match_pass,
)
from moj_analytical_services_uk_address_matcher_ray.stages.trie import (
    resolve_with_trie,
)


def _fuzzy():
    rows = [
        # duplicate unique_ids but unique ukam ids (reference fixture shape)
        (1, "1 HIGH STREET", "AB1 2CD", "f1"),
        (1, "1 HIGH STREET", "AB1 2CD", "f2"),
        (2, "2 LOW ROAD", "AB1 2CD", "f3"),
        (3, "9 NOWHERE LANE", "ZZ9 9ZZ", "f4"),
    ]
    return rd.from_items(
        [
            {
                "unique_id": u,
                "original_address_concat": a,
                "postcode": p,
                "ukam_address_id": k,
                "address_tokens": a.split(" "),
            }
            for u, a, p, k in rows
        ]
    )


def _canon():
    rows = [
        (101, "1 HIGH STREET", "AB1 2CD", "c1"),
        (102, "2 LOW ROAD", "AB1 2CD", "c2"),
    ]
    return rd.from_items(
        [
            {
                "unique_id": u,
                "original_address_concat": a,
                "postcode": p,
                "ukam_address_id": k,
                "address_tokens": a.split(" "),
            }
            for u, a, p, k in rows
        ]
    )


def test_annotate_exact_matches(ray_session):
    out = annotate_exact_matches(_fuzzy(), _canon()).materialize()
    got = {
        r["ukam_address_id"]: (r["resolved_canonical_id"], r["match_reason"])
        for r in out.take_all()
    }
    assert got == {
        "f1": ("101", "exact: full match"),
        "f2": ("101", "exact: full match"),
        "f3": ("102", "exact: full match"),
    }


def test_exact_match_duplicate_canonical_deterministic(ray_session):
    canon_dup = _canon().union(
        rd.from_items(
            [
                {
                    "unique_id": 999,
                    "original_address_concat": "1 HIGH STREET",
                    "postcode": "AB1 2CD",
                    "ukam_address_id": "c0",  # sorts before c1 -> must win
                    "address_tokens": ["1", "HIGH", "STREET"],
                }
            ]
        )
    )
    out = annotate_exact_matches(_fuzzy(), canon_dup).materialize()
    got = {r["ukam_address_id"]: r["canonical_ukam_address_id"] for r in out.take_all()}
    assert got["f1"] == "c0"
    assert got["f2"] == "c0"


def test_run_deterministic_pass_row_count_preserved(ray_session):
    out = run_deterministic_match_pass(_fuzzy(), _canon()).materialize()
    rows = out.take_all()
    assert len(rows) == 4  # row-count preservation invariant
    by_ukam = {r["ukam_address_id"]: r for r in rows}
    assert by_ukam["f4"]["match_reason"] is None  # unmatched passes through
    assert by_ukam["f1"]["resolved_canonical_id"] == "101"


def test_restrict_canonical_strategies(ray_session):
    restricted = restrict_canonical_to_fuzzy_keys(
        _canon(), _fuzzy(), key_col="postcode", strategy="exact"
    ).materialize()
    assert restricted.count() == 2
    fz = rd.from_items(
        [{"postcode": "AB1 2CX", "unique_id": 1, "ukam_address_id": "f"}]
    )
    dropped = restrict_canonical_to_fuzzy_keys(
        _canon(), fz, key_col="postcode", strategy="drop_last_char"
    ).materialize()
    assert dropped.count() == 2  # AB1 2C* matches both
    assert "postcode_group" in dropped.schema().names


def test_resolve_with_trigrams_unique(ray_session):
    fuzzy = rd.from_items(
        [
            {
                "unique_id": 1,
                "ukam_address_id": "f1",
                "postcode": "AB1 2CD",
                "address_tokens": ["1", "HIGH", "STREET", "EXTRA"],
            }
        ]
    )
    out = resolve_with_trigrams(fuzzy, _canon()).materialize()
    got = out.take_all()
    assert len(got) == 1
    assert got[0]["resolved_canonical_id"] == "101"
    assert got[0]["match_reason"] == "unique_trigram: unique trigram match"


def test_trigram_conflict_blocks_match(ray_session):
    # two canonicals sharing every trigram -> index not unique -> no match
    canon = rd.from_items(
        [
            {
                "unique_id": i,
                "ukam_address_id": f"c{i}",
                "postcode": "AB1 2CD",
                "address_tokens": ["1", "HIGH", "STREET"],
            }
            for i in (101, 102)
        ]
    )
    fuzzy = rd.from_items(
        [
            {
                "unique_id": 1,
                "ukam_address_id": "f1",
                "postcode": "AB1 2CD",
                "address_tokens": ["1", "HIGH", "STREET"],
            }
        ]
    )
    out = resolve_with_trigrams(fuzzy, canon).materialize()
    assert out.count() == 0


def test_resolve_with_trie(ray_session):
    fuzzy = rd.from_items(
        [
            {
                "unique_id": 1,
                "ukam_address_id": "f1",
                "postcode": "AB1 2CD",
                # extra noise token at front; suffix walk should still pin c1
                "address_tokens": ["NOISE", "1", "HIGH", "STREET"],
            }
        ]
    )
    out = resolve_with_trie(fuzzy, _canon()).materialize()
    got = out.take_all()
    assert len(got) == 1
    assert got[0]["canonical_ukam_address_id"] == "c1"


def test_resolve_with_trie_across_last_postcode_char(ray_session):
    """The trie stage's core purpose (reference resolve_with_trie.py:28-35):
    tries group on postcode-minus-last-char, so a fuzzy row whose postcode
    differs ONLY in the final character still reaches the canonical trie."""
    fuzzy = rd.from_items(
        [
            {
                "unique_id": 9,
                "ukam_address_id": "f9",
                "postcode": "AB1 2CE",  # canonical c1 has AB1 2CD
                "address_tokens": ["1", "HIGH", "STREET"],
            },
            {
                "unique_id": 10,
                "ukam_address_id": "f10",
                "postcode": None,  # NULL group never matches
                "address_tokens": ["1", "HIGH", "STREET"],
            },
        ]
    )
    out = resolve_with_trie(fuzzy, _canon()).materialize()
    got = {r["ukam_address_id"]: r["canonical_ukam_address_id"] for r in out.take_all()}
    assert got.get("f9") == "c1"
    assert "f10" not in got


def test_self_dedup_exclude_self(ray_session):
    ds = rd.from_items(
        [
            {"unique_id": i, "ukam_address_id": f"u{i}", "sha": s}
            for i, s in enumerate(["AAA", "AAA", "BBB"])
        ]
    )
    out = annotate_exact_matches(
        ds, ds, match_cols=("sha",), exclude_self=True
    ).materialize()
    got = {r["ukam_address_id"]: r["canonical_ukam_address_id"] for r in out.take_all()}
    assert got == {"u0": "u1", "u1": "u0"}  # BBB singleton unmatched


def test_reference_trie_golden_rows(ray_session):
    """The reference's exact+trie golden fixture ported VERBATIM
    (tests/test_exact_matching.py:10-147): 8 fuzzy rows (duplicate
    unique_ids, surrogate ukam ids) vs 2 canonical rows; expected
    per-ukam-row (unique_id, resolved_canonical_id, match_reason) tuples —
    including the two trie resolutions with token fuzziness ('road' vs
    'rd' tokens, 'st' vs 'street')."""
    fuzzy_rows = [
        (1, "4 Sample Street", "CC3 3CC", ["4", "sample", "street"], 1),
        (10, "4 Sample Street", "CC3 3CC", ["4", "sample", "street"], 2),
        (2, "5 Demo Rd", "DD4 4DD", ["5", "demo", "rd"], 3),
        (2, "5 Demo Rd", "DD4 4DD", ["5", "demo", "rd"], 4),
        (2, "5 Demo Road", "DD4 4DD", ["5", "demo", "road"], 5),
        (2, "5 Demo Road", "DD4 4DD", ["5", "demo", "road"], 6),
        (2, "4 Sample St", "CC3 3CC", ["4", "sample", "st"], 7),
        (3, "999 Mystery Lane", "EE5 5EE", ["999", "mystery", "lane"], 8),
    ]
    canon_rows = [
        (1000, "4 Sample Street", "CC3 3CC", ["4", "sample", "street"], 1),
        (2000, "5 Demo Rd", "DD4 4DD", ["5", "demo", "road"], 2),
    ]

    def _ds(rows):
        return rd.from_items(
            [
                {
                    "unique_id": u,
                    "original_address_concat": a,
                    "postcode": p,
                    "address_tokens": toks,
                    "ukam_address_id": k,
                }
                for u, a, p, toks, k in rows
            ]
        )

    out = run_deterministic_match_pass(
        _ds(fuzzy_rows), _ds(canon_rows), stages=["exact", "trie"]
    ).materialize()
    got = sorted(
        (
            r["ukam_address_id"],
            r["unique_id"],
            str(r["resolved_canonical_id"])
            if r["resolved_canonical_id"] is not None
            else None,
            r["match_reason"],
        )
        for r in out.take_all()
    )
    EXACT = "exact: full match"
    TRIE = "trie: exact match with skips and fuzziness"
    assert got == [
        (1, 1, "1000", EXACT),
        (2, 10, "1000", EXACT),
        (3, 2, "2000", EXACT),
        (4, 2, "2000", EXACT),
        (5, 2, "2000", TRIE),
        (6, 2, "2000", TRIE),
        (7, 2, "1000", TRIE),
        (8, 3, None, None),
    ]
    # row-count preservation (reference
    # test_trie_stage_does_not_inflate_row_count)
    assert out.count() == len(fuzzy_rows)
