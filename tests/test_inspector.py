"""Single-example drill-down inspector (reference
post_linkage/accuracy_from_labels.py:34-300) — waterfall parity with the
production scorer + false-positive report assembly."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from moj_analytical_services_uk_address_matcher_ray.stages.inspector import (
    compare_two_records,
    find_false_positive_ids,
    inspect_match_results_vs_labels,
    waterfall_text,
)
from moj_analytical_services_uk_address_matcher_ray.state.model import (
    default_address_model,
)

REC_L = {
    "original_address_concat": "12 ACACIA AVENUE LONDON",
    "postcode": "AB1 2CD",
    "numeric_token_1": "12",
}
REC_R = {
    "original_address_concat": "12 ACACIA AVE LONDON",
    "postcode": "AB1 2CD",
    "numeric_token_1": "12",
}


def test_compare_two_records_matches_production_scorer():
    """The waterfall's total IS the distributed scorer's match_weight for the
    same pair (same evaluators, same gamma semantics)."""
    from moj_analytical_services_uk_address_matcher_ray.stages.inspector import (
        _pair_frame,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.scoring import (
        _ComparisonEvaluator,
        score_batch,
    )

    model = default_address_model()
    wf = compare_two_records(REC_L, REC_R, model)

    # prior first, TOTAL last, one row per comparison in between
    assert wf["comparison"].iloc[0] == "prior (lambda)"
    assert wf["comparison"].iloc[-1] == "TOTAL (match_weight)"
    assert len(wf) == len(model.comparisons) + 2

    # cumulative sum is consistent
    assert abs(
        wf["log2_bayes_factor"].iloc[:-1].sum()
        - wf["cumulative_match_weight"].iloc[-1]
    ) < 1e-9

    pair = pa.Table.from_pandas(_pair_frame(REC_L, REC_R, model))
    evs = [_ComparisonEvaluator(c, {}) for c in model.comparisons]
    scored = score_batch(pair, evs, model.prior_log2_odds, threshold=None)
    mw = scored["match_weight"].to_pylist()[0]
    assert abs(mw - wf["cumulative_match_weight"].iloc[-1]) < 1e-6

    # the exact-match level should have fired for the postcode comparison
    pc_row = wf[wf["comparison"] == "postcode"].iloc[0]
    assert pc_row["gamma"] >= 0
    assert pc_row["log2_bayes_factor"] > 0

    txt = waterfall_text(wf)
    assert "postcode" in txt and "TOTAL" in txt


def _label_ds():
    return rd.from_items(
        [
            {"unique_id": "m1", "correct_unique_id": "c1"},
            {"unique_id": "m2", "correct_unique_id": "c3"},
        ]
    )


def _best_ds():
    # m1 predicted c2 (FALSE POSITIVE, truth c1); m2 predicted c3 (correct)
    return rd.from_items(
        [
            {
                "unique_id_r": "m1",
                "unique_id_l": "c2",
                "address_concat_r": "12 ACACIA AVE LONDON",
                "postcode_r": "AB1 2CD",
                "original_address_concat_l": "12 ACACIA ROAD LONDON",
                "postcode_l": "AB1 2CD",
                "match_weight": 20.0,
                "distinguishability": 5.0,
                "distinguishability_category": "03: Distinguishability > 1",
            },
            {
                "unique_id_r": "m2",
                "unique_id_l": "c3",
                "address_concat_r": "1 HIGH ST",
                "postcode_r": "ZZ1 1ZZ",
                "original_address_concat_l": "1 HIGH STREET",
                "postcode_l": "ZZ1 1ZZ",
                "match_weight": 30.0,
                "distinguishability": 25.0,
                "distinguishability_category": "02: Distinguishability > 10",
            },
        ]
    )


def _improved_ds():
    base = {
        "original_address_concat_r": "12 ACACIA AVE LONDON",
        "overlapping_tokens_this_l_and_r": '{"ACACIA": 2}',
        "tokens_elsewhere_in_block_but_not_this": "{}",
        "missing_tokens": "[]",
    }
    return rd.from_items(
        [
            dict(
                base,
                unique_id_r="m1",
                unique_id_l="c2",
                original_address_concat_l="12 ACACIA ROAD LONDON",
                match_weight=20.0,
                match_weight_original=18.5,
                mw_adjustment=1.5,
            ),
            dict(
                base,
                unique_id_r="m1",
                unique_id_l="c1",
                original_address_concat_l="12 ACACIA AVENUE LONDON",
                match_weight=15.0,
                match_weight_original=16.0,
                mw_adjustment=-1.0,
            ),
        ]
    )


def _canonical_ds():
    return rd.from_items(
        [
            {
                "unique_id": "c1",
                "original_address_concat": "12 ACACIA AVENUE LONDON",
                "postcode": "AB1 2CD",
            },
            {
                "unique_id": "c2",
                "original_address_concat": "12 ACACIA ROAD LONDON",
                "postcode": "AB1 2CD",
            },
            {
                "unique_id": "c3",
                "original_address_concat": "1 HIGH STREET",
                "postcode": "ZZ1 1ZZ",
            },
        ]
    )


def _clean_ds(rows):
    return rd.from_items(rows)


def test_find_false_positive_ids():
    fps = find_false_positive_ids(_best_ds(), _label_ds())
    assert fps == ["m1"]


def test_inspect_report_end_to_end():
    model = default_address_model()
    messy_clean = _clean_ds(
        [
            dict(
                REC_R,
                unique_id="m1",
                flat_positional=None,
                flat_letter=None,
            )
        ]
    )
    canon_clean = _clean_ds(
        [
            dict(
                REC_L,
                unique_id="c1",
                flat_positional=None,
                flat_letter=None,
            ),
            dict(
                REC_L,
                unique_id="c2",
                original_address_concat="12 ACACIA ROAD LONDON",
                numeric_token_1="14",  # wrong house number: true match must win
                flat_positional=None,
                flat_letter=None,
            ),
        ]
    )
    rep = inspect_match_results_vs_labels(
        labels=_label_ds(),
        predictions_improved=_improved_ds(),
        best_matches=_best_ds(),
        canonical=_canonical_ds(),
        messy_clean=messy_clean,
        canonical_clean=canon_clean,
        model=model,
        example_number=1,
    )
    assert rep is not None
    # auto-selected the (only) false positive, deterministically
    assert rep.unique_id_r == "m1"
    assert rep.best_match_id == "c2"
    assert rep.correct_id == "c1"
    assert "12 ACACIA ROAD LONDON" in rep.report  # best match line
    assert "12 ACACIA AVENUE LONDON" in rep.report  # true match line

    # candidate table: best first, true match marked
    assert list(rep.candidates["canonical_id"]) == ["c2", "c1"]
    assert rep.candidates["candidate_address"].iloc[1].startswith("✅")
    assert rep.candidates["final_score"].iloc[0] == "20.00"
    assert rep.candidates["splink_score"].iloc[0] == "18.50"
    assert rep.candidates["adjustment_score"].iloc[0] == "1.50"

    # cleaned-record comparison covers all three record types
    assert list(rep.records["record_type"]) == ["Messy", "Best Match", "True Match"]
    assert rep.records.columns[0] == "record_type"
    assert rep.records.columns[1] == "original_address_concat"

    # waterfalls present; the true-match waterfall outscores the best-match
    # waterfall on the address comparison (AVENUE vs ROAD)
    assert rep.waterfall_best is not None and rep.waterfall_true is not None
    total_best = rep.waterfall_best["cumulative_match_weight"].iloc[-1]
    total_true = rep.waterfall_true["cumulative_match_weight"].iloc[-1]
    assert total_true > total_best

    s = str(rep)
    assert "Waterfall: messy vs best match" in s


def test_inspect_no_fp_returns_none():
    labels = rd.from_items([{"unique_id": "m2", "correct_unique_id": "c3"}])
    rep = inspect_match_results_vs_labels(
        labels=labels,
        predictions_improved=_improved_ds(),
        best_matches=_best_ds(),
        canonical=_canonical_ds(),
        example_number=1,
    )
    assert rep is None


def test_inspect_explicit_id_without_clean_tables():
    """Caller-chosen id, no cleaned tables / model: report + candidates only
    (the reference requires every relation; ours degrades gracefully)."""
    rep = inspect_match_results_vs_labels(
        labels=_label_ds(),
        predictions_improved=_improved_ds(),
        best_matches=_best_ds(),
        canonical=_canonical_ds(),
        unique_id_r="m1",
    )
    assert rep is not None
    assert rep.records is None and rep.waterfall_best is None
    assert rep.correct_id == "c1"
