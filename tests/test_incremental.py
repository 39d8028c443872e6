"""Incremental (delta) matching: persisted canonical state, O(delta) reruns.

Mirrors the reference's preclean-once pattern (examples/preclean_full_os.py
+ clean_data_using_precomputed_rel_tok_freq, cleaning/pipelines.py) lifted
to an engine-level pipeline."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _truth(messy_tbl):
    # _example_data carries the planted mapping in true_canonical_id
    return dict(
        zip(
            messy_tbl["unique_id"].to_pylist(),
            messy_tbl["true_canonical_id"].to_pylist(),
        )
    )


def test_prepare_state_and_match_delta(ray_session, tmp_path):
    import ray.data as rd

    from examples._example_data import make_canonical, make_messy
    from moj_analytical_services_uk_address_matcher_ray.pipelines.incremental import (
        load_matching_state,
        match_delta,
        prepare_matching_state,
    )

    canon_tbl = make_canonical(120)
    state_dir = str(tmp_path / "state")
    stats = prepare_matching_state(rd.from_arrow(canon_tbl), state_dir)
    assert stats["rows"] == 120
    assert stats["rel_tok_freq"] and stats["tf_default"] is not None

    # resumable: second call returns the sidecar without recomputation
    again = prepare_matching_state(rd.from_arrow(canon_tbl), state_dir)
    assert again["rows"] == 120

    canon, stats2 = load_matching_state(state_dir)
    assert canon.count() == 120 and stats2["rows"] == 120

    # two successive deltas, each matched without any corpus-wide pass
    messy1 = make_messy(canon_tbl, 40, seed=11)
    messy2 = make_messy(canon_tbl, 30, seed=12)
    total, correct = 0, 0
    for messy_tbl in (messy1, messy2):
        truth = _truth(messy_tbl)
        out = match_delta(rd.from_arrow(messy_tbl), state_dir).to_pandas()
        got = dict(
            zip(
                out["unique_id"].astype(str),
                out["resolved_canonical_id"].astype(str),
            )
        )  # messy -> canonical
        for m, c in truth.items():
            total += 1
            if got.get(str(m)) == str(c):
                correct += 1
    assert total == 70
    assert correct / total >= 0.9  # planted matches recovered per delta


def test_match_delta_parity_with_direct_flow(ray_session, tmp_path):
    """match_delta == the direct two-table flow run with the SAME
    precomputed canonical statistics (the state adds persistence, not new
    semantics)."""
    import ray
    import ray.data as rd

    from examples._example_data import make_canonical, make_messy
    from moj_analytical_services_uk_address_matcher_ray.pipelines.clean import (
        apply_post_tf,
        apply_pre_tf,
        clean_dataset,
        corpus_tf_and_end_tokens,
    )
    from moj_analytical_services_uk_address_matcher_ray.pipelines.code_linkage import (
        PAIR_CARRY_COLS,
    )
    from moj_analytical_services_uk_address_matcher_ray.pipelines.incremental import (
        match_delta,
        prepare_matching_state,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.best_match import (
        best_matches_with_distinguishability,
        select_top_match_candidates,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.blocking import (
        generate_and_score_pairs,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.exact import (
        run_deterministic_match_pass,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.rescore import (
        RESCORE_EMIT_COLS,
        improve_predictions_using_distinguishing_tokens,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.term_frequency import (
        get_numeric_term_frequencies,
    )
    from moj_analytical_services_uk_address_matcher_ray.state.model import (
        default_address_model,
    )

    canon_tbl = make_canonical(90)
    messy_tbl = make_messy(canon_tbl, 25, seed=21)

    state_dir = str(tmp_path / "state")
    prepare_matching_state(rd.from_arrow(canon_tbl), state_dir)
    inc = (
        match_delta(rd.from_arrow(messy_tbl), state_dir)
        .to_pandas()
        .sort_values("unique_id")
        .reset_index(drop=True)
    )

    # direct flow with identical statistics
    pre = apply_pre_tf(rd.from_arrow(canon_tbl)).materialize()
    tf, ends, dflt = corpus_tf_and_end_tokens(pre)
    canon = apply_post_tf(pre, ray.put(tf), ends, tf_default=dflt).materialize()
    messy = clean_dataset(
        rd.from_arrow(messy_tbl), rel_tok_freq=tf, end_tokens=ends, tf_default=dflt
    ).materialize()
    exact = run_deterministic_match_pass(
        messy, canon, stages=["exact", "trie"]
    ).materialize()
    scored = generate_and_score_pairs(
        canon,
        messy,
        default_address_model(),
        carry_cols=PAIR_CARRY_COLS,
        tf_tables=get_numeric_term_frequencies(canon, cleaned=True),
        threshold_match_weight=-50.0,
        emit_cols=RESCORE_EMIT_COLS,
    )
    improved = improve_predictions_using_distinguishing_tokens(
        scored, match_weight_threshold=-20.0
    )
    best = best_matches_with_distinguishability(improved, messy).materialize()
    direct = (
        select_top_match_candidates(
            exact,
            best,
            canon,
            include_unmatched=True,
            distinguishability_threshold=None,
        )
        .to_pandas()
        .sort_values("unique_id")
        .reset_index(drop=True)
    )

    assert list(inc["unique_id"]) == list(direct["unique_id"])
    assert list(inc["resolved_canonical_id"].astype(str)) == list(
        direct["resolved_canonical_id"].astype(str)
    )
