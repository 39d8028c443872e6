"""Incremental matching: prepare canonical state once, match deltas O(delta).

The reference cleans the full canonical table once and reuses it across
matching runs (examples/preclean_full_os.py); this example shows the
engine-level version: ``prepare_matching_state`` persists the cleaned
canonical + every corpus statistic, then each ``match_delta`` call cleans
ONLY the delta (fused map chain, no corpus-wide pass) and runs the full
two-table flow against the persisted state.

Run:  PYTHONPATH=. python examples/incremental_matching.py
"""

from __future__ import annotations


def main(
    n_canonical: int = 300,
    delta_sizes: tuple[int, ...] = (60, 40),
    state_dir: str = "/tmp/uam_incremental_state",
    verbose: bool = True,
):
    import time

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import logging

    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from examples._example_data import make_canonical, make_messy
    from moj_analytical_services_uk_address_matcher_ray.pipelines.incremental import (
        match_delta,
        prepare_matching_state,
    )

    canon_tbl = make_canonical(n_canonical)
    t0 = time.time()
    stats = prepare_matching_state(rd.from_arrow(canon_tbl), state_dir)
    t_prep = time.time() - t0
    if verbose:
        print(f"state prepared: {stats['rows']} canonical rows in {t_prep:.1f}s "
              f"({len(stats['rel_tok_freq'])} TF entries)")

    results = []
    for i, n in enumerate(delta_sizes):
        messy_tbl = make_messy(canon_tbl, n, seed=100 + i)
        truth = dict(
            zip(
                messy_tbl["unique_id"].to_pylist(),
                messy_tbl["true_canonical_id"].to_pylist(),
            )
        )
        t0 = time.time()
        out = match_delta(rd.from_arrow(messy_tbl), state_dir).to_pandas()
        dt = time.time() - t0
        got = dict(
            zip(out["unique_id"].astype(str), out["resolved_canonical_id"].astype(str))
        )
        correct = sum(1 for m, c in truth.items() if got.get(str(m)) == str(c))
        results.append({"delta": n, "correct": correct, "sec": round(dt, 1)})
        if verbose:
            print(f"delta {i}: {correct}/{n} matched in {dt:.1f}s")
    return {"prep_sec": round(t_prep, 1), "deltas": results}


if __name__ == "__main__":
    main()
