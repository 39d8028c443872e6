"""Two-table match through the LIBRARY path (match_code_corpora) with the
payload route forced — records the non-broadcast (hash-join + bucketed
attach+score) path working end-to-end at reference-like scale, vs the
broadcast-store path on the same input.

Usage:
  PYTHONPATH=. python tools/two_table_payload_bench.py --mode shuffle \
      [--clusters 2500] [--reference-shape]

Prints one JSON line: corpus shape, wall time, matched rows, recall vs the
planted truth, and the mode.  Run once per mode on the same corpus; rows
and winners must agree (the unit parity test pins this at small scale:
tests/test_job_cli.py::test_match_payload_modes_identical).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["broadcast", "shuffle", "auto"], required=True)
    ap.add_argument("--clusters", type=int, default=2500)
    ap.add_argument("--singletons", type=int, default=0)
    ap.add_argument("--stems", type=int, default=None)
    ap.add_argument(
        "--reference-shape",
        action="store_true",
        help="~176k messy x ~274k canonical (the reference readme workload)",
    )
    args = ap.parse_args()

    import logging

    import ray

    if not ray.is_initialized():
        ncpu = os.environ.get("RAY_GRAFT_CPUS")
        ray.init(
            address="local",
            include_dashboard=False,
            logging_level="ERROR",
            **({"num_cpus": int(ncpu)} if ncpu else {}),
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import pandas as pd
    import ray.data as rd

    from examples.match_forks_to_canonical import REFERENCE_SHAPE, build_corpus
    from moj_analytical_services_uk_address_matcher_ray.pipelines.code_linkage import (
        match_code_corpora,
    )
    from moj_analytical_services_uk_address_matcher_ray.sources.io import (
        read_parquet,
    )

    corpus_kwargs = (
        dict(REFERENCE_SHAPE)
        if args.reference_shape
        else {"extra_singletons": args.singletons, "n_stems": args.stems}
    )
    n_clusters = corpus_kwargs.pop("n_clusters", args.clusters)
    corpus_dir = build_corpus(n_clusters, **corpus_kwargs)

    messy = read_parquet(os.path.join(corpus_dir, "messy"))
    canon = read_parquet(os.path.join(corpus_dir, "canon"))
    read_parquet(os.path.join(corpus_dir, "messy")).count()  # warm page cache
    read_parquet(os.path.join(corpus_dir, "canon")).count()

    t0 = time.perf_counter()
    best = match_code_corpora(messy, canon, payload_mode=args.mode).materialize()
    n_rows = best.count()
    wall = time.perf_counter() - t0

    # untimed evaluation vs the planted truth
    pred = best.select_columns(["unique_id", "canonical_unique_id"]).to_pandas()
    truth = pd.read_parquet(os.path.join(corpus_dir, "truth"))
    ev = pred.merge(
        truth.rename(columns={"unique_id": "messy_uid"}),
        left_on="unique_id",
        right_on="messy_uid",
        how="inner",
    )
    n_messy = messy.count()
    correct = int((ev["canonical_unique_id"] == ev["canonical_uid"]).sum())
    out = {
        "mode": args.mode,
        "n_messy": n_messy,
        "n_canonical": canon.count(),
        "matched_rows": n_rows,
        "correct": correct,
        "recall": round(correct / max(1, n_messy), 4),
        "wall_sec": round(wall, 1),
        "messy_rows_per_sec": round(n_messy / wall, 1),
    }
    print(json.dumps(out))
    ray.shutdown()
    return out


if __name__ == "__main__":
    main()
