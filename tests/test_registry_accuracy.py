"""Dataset registry wiring + mismatch triage (reference benchmarking/
datasets/registry.py and analysis/mismatches.py analogues)."""

import ray.data as rd

from moj_analytical_services_uk_address_matcher_ray.sources.io import (
    get_dataset_info,
    list_datasets,
    load_registered,
)
from moj_analytical_services_uk_address_matcher_ray.stages.accuracy import (
    analyse_mismatches,
    jaro_winkler_similarity,
)


def test_registry_lists_and_loads(ray_session):
    names = list_datasets()
    assert "documents_sf0.001" in names
    assert "code_corpus_small" in names
    ds = load_registered("documents_sf0.001")
    assert ds.count() > 0
    info = get_dataset_info("code_corpus_small")
    assert info.kind == "linkage_corpus"


def test_jaro_winkler_known_values():
    assert jaro_winkler_similarity("MARTHA", "MARHTA") > 0.95
    assert jaro_winkler_similarity("abc", "abc") == 1.0
    assert jaro_winkler_similarity("abc", "xyz") == 0.0
    assert jaro_winkler_similarity(None, "abc") == 0.0
    # prefix boost: common prefix scores higher than same-distance suffix
    assert jaro_winkler_similarity("PREFIXED", "PREFIXES") > jaro_winkler_similarity(
        "DPREFIXE", "SPREFIXE"
    )


def test_analyse_mismatches(ray_session):
    matches = rd.from_items(
        [
            {  # correct -> excluded
                "unique_id": "c1", "resolved_canonical_id": "c1",
                "canonical_ukam_address_id": "u1", "match_reason": "exact",
                "original_address_concat": "1 HIGH ST", "postcode": "AB1",
            },
            {  # wrong, very dissimilar
                "unique_id": "m2", "resolved_canonical_id": "c9",
                "canonical_ukam_address_id": "u9", "match_reason": "splink",
                "original_address_concat": "2 LOW RD", "postcode": "AB1",
            },
            {  # wrong, near-identical addresses
                "unique_id": "m3", "resolved_canonical_id": "c3",
                "canonical_ukam_address_id": "u3", "match_reason": "splink",
                "original_address_concat": "7 PARK AVENUE", "postcode": "AB1",
            },
            {  # unmatched -> excluded
                "unique_id": "m4", "resolved_canonical_id": None,
                "canonical_ukam_address_id": None, "match_reason": None,
                "original_address_concat": "9 GONE", "postcode": None,
            },
        ]
    )
    canonical = rd.from_items(
        [
            {"ukam_address_id": "u9", "original_address_concat": "99 ZEBRA WAY"},
            {"ukam_address_id": "u3", "original_address_concat": "7 PARK AVENUE X"},
        ]
    )
    out = analyse_mismatches(matches, canonical, samples_per_reason=5, top_worst=2)
    worst = out["worst_mismatches"]
    assert len(worst) == 2
    # the dissimilar pair ranks worst (lowest similarity first)
    assert worst.iloc[0]["unique_id"] == "m2"
    assert worst.iloc[0]["similarity_score"] < worst.iloc[1]["similarity_score"]
    samples = out["random_samples"]
    assert set(samples["unique_id"]) == {"m2", "m3"}


def test_calculate_accuracy_metrics_grouping_sets(ray_session):
    from moj_analytical_services_uk_address_matcher_ray.stages.accuracy import (
        calculate_accuracy_metrics,
    )

    rows = [
        {"dataset_name": "a", "match_reason": "x", "is_correct": 1},
        {"dataset_name": "a", "match_reason": "x", "is_correct": 0},
        {"dataset_name": "a", "match_reason": "y", "is_correct": 1},
        {"dataset_name": "b", "match_reason": "x", "is_correct": 1},
    ]
    out = calculate_accuracy_metrics(rd.from_items(rows))
    # 4 levels: (d,r)=3 rows, (d)=2, (r)=2, ()=1
    assert len(out) == 8
    fine = out[out["dataset_name"].notna() & out["match_reason"].notna()]
    assert len(fine) == 3
    ax = fine[(fine["dataset_name"] == "a") & (fine["match_reason"] == "x")]
    assert ax["correct_count"].iloc[0] == 1 and ax["total_count"].iloc[0] == 2
    assert ax["accuracy_pct"].iloc[0] == 50.0
    top = out[out["dataset_name"].isna() & out["match_reason"].isna()]
    assert top["correct_count"].iloc[0] == 3 and top["total_count"].iloc[0] == 4
