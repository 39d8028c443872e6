"""Match ONE messy address against a canonical table — the reference's
examples/match_one.py flow, Ray-Data-shaped.

Run:  PYTHONPATH=. python examples/match_one.py "FLAT 2, 9 HIGH ST LEEDS" "LS1 4AB"
"""

from __future__ import annotations

import sys


def main(address: str, postcode: str | None = None, top_n: int = 5, verbose: bool = True):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import logging

    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from examples._example_data import make_canonical
    from moj_analytical_services_uk_address_matcher_ray.pipelines.clean import clean_dataset
    from moj_analytical_services_uk_address_matcher_ray.pipelines.code_linkage import (
        PAIR_CARRY_COLS,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.blocking import (
        generate_and_score_pairs,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.rescore import (
        RESCORE_EMIT_COLS,
        improve_predictions_using_distinguishing_tokens,
    )
    from moj_analytical_services_uk_address_matcher_ray.state.model import (
        default_address_model,
    )

    canon = clean_dataset(rd.from_arrow(make_canonical())).materialize()
    one = rd.from_items(
        [{"unique_id": "q1", "address_concat": address, "postcode": postcode}]
    )
    # reuse the canonical corpus TF so the single record's bands make sense
    messy = clean_dataset(one).materialize()

    scored = generate_and_score_pairs(
        canon,
        messy,
        default_address_model(),
        carry_cols=PAIR_CARRY_COLS,
        threshold_match_weight=-50.0,
        emit_cols=RESCORE_EMIT_COLS,
    )
    improved = improve_predictions_using_distinguishing_tokens(
        scored, match_weight_threshold=-20.0
    )
    rows = sorted(
        improved.take_all(), key=lambda r: -r["match_weight"]
    )[:top_n]
    if verbose:
        print(f"Top {len(rows)} candidates for {address!r} / {postcode!r}:")
        for r in rows:
            print(
                f"  {r['match_weight']:8.2f}  {r['unique_id_l']:>6}  "
                f"{r['original_address_concat_l']}  {r['postcode_l']}"
            )
    return rows


if __name__ == "__main__":
    addr = sys.argv[1] if len(sys.argv) > 1 else "FLAT 2, 9 HIGH ST LEEDS"
    pc = sys.argv[2] if len(sys.argv) > 2 else None
    main(addr, pc)
