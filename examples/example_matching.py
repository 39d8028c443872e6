"""End-to-end address matching — the Ray-Data analogue of the reference's
front-door example (examples/example_matching.py:31-261):

  1. load a messy table and a canonical table (synthetic here — no external
     data in this sandbox; same column contract);
  2. clean both with the full pipeline (corpus TF on the canonical side);
  3. deterministic pass (exact + trie) to peel off easy matches;
  4. Fellegi-Sunter scoring over blocked candidate pairs (fused narrow-pairs
     + broadcast feature store; numeric-token TF adjustments on by default,
     mirroring splink_model.py:117-131);
  5. distinguishing-token rescore (second pass, threshold -20);
  6. best-match selection with distinguishability categories + summaries.

Run:  PYTHONPATH=. python examples/example_matching.py  [--n 300]
"""

from __future__ import annotations

import argparse
import time


def main(n_canonical: int = 300, n_messy: int = 120, verbose: bool = True):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import logging

    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from examples._example_data import make_canonical, make_messy
    from moj_analytical_services_uk_address_matcher_ray.pipelines.clean import clean_dataset
    from moj_analytical_services_uk_address_matcher_ray.stages.best_match import (
        best_matches_summary,
        best_matches_with_distinguishability,
        calculate_match_metrics,
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
    from moj_analytical_services_uk_address_matcher_ray.pipelines.code_linkage import (
        PAIR_CARRY_COLS,
    )
    from moj_analytical_services_uk_address_matcher_ray.state.model import (
        default_address_model,
    )

    t0 = time.time()
    canon_tbl = make_canonical(n_canonical)
    messy_tbl = make_messy(canon_tbl, n_messy)

    # step 2 — clean / feature engineering
    canon = clean_dataset(rd.from_arrow(canon_tbl)).materialize()
    messy = clean_dataset(rd.from_arrow(messy_tbl)).materialize()

    # step 3 — deterministic pass (exact always on; trie enabled)
    exact = run_deterministic_match_pass(
        messy, canon, stages=["exact", "trie"]
    ).materialize()
    metrics = calculate_match_metrics(exact)
    if verbose:
        print("\nDeterministic match results:\n", metrics.to_string(index=False))

    # step 4 — probabilistic scoring (predict threshold -50, reference
    # example_matching.py:99); numeric-token TF adjustments from the
    # canonical corpus (the reference always registers these)
    model = default_address_model()
    tf_tables = get_numeric_term_frequencies(canon, cleaned=True)
    scored = generate_and_score_pairs(
        canon,
        messy,
        model,
        carry_cols=PAIR_CARRY_COLS,
        tf_tables=tf_tables,
        threshold_match_weight=-50.0,
        emit_cols=RESCORE_EMIT_COLS,
    )

    # step 5 — second pass (improve threshold -20, reference :110-111)
    improved = improve_predictions_using_distinguishing_tokens(
        scored, match_weight_threshold=-20.0
    )

    # step 6 — best matches + distinguishability, then merge with the
    # deterministic pass (deterministic wins)
    best = best_matches_with_distinguishability(improved, messy).materialize()
    if verbose:
        print("\nBest-match distinguishability summary:\n",
              best_matches_summary(best).to_string(index=False))
    combined = select_top_match_candidates(
        exact,
        best,
        canon,
        include_unmatched=True,
        # the reference example passes None here (example_matching.py:259):
        # one-match-only rows have NULL distinguishability and must survive
        distinguishability_threshold=None,
    ).materialize()

    # truth check (the synthetic messy table carries its true canonical id)
    truth = dict(
        zip(
            messy_tbl["unique_id"].to_pylist(),
            messy_tbl["true_canonical_id"].to_pylist(),
        )
    )
    got = 0
    rows = combined.take_all()
    for r in rows:
        rid = r.get("unique_id")
        pred = r.get("resolved_canonical_id")
        if pred is not None and truth.get(str(rid)) == str(pred):
            got += 1
    if verbose:
        print(f"\nRecovered {got}/{len(truth)} true matches "
              f"in {time.time() - t0:.1f}s over {combined.count()} output rows")
    return got, len(truth)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=300)
    args = ap.parse_args()
    main(n_canonical=args.n)
