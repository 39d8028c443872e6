"""Flagship self-dedup over a source-code file corpus (the north-star
pipeline): clean -> exact sha edges -> blocked FS scoring -> connected
components, with pairwise F1 against the generator's planted clusters.

Run:  PYTHONPATH=. python examples/dedup_corpus.py [--clusters 300]
"""

from __future__ import annotations

import argparse


def main(n_clusters: int = 300, seed: int = 42, verbose: bool = True):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import logging

    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from moj_analytical_services_uk_address_matcher_ray.datagen import (
        GenConfig,
        generate_corpus,
    )
    from moj_analytical_services_uk_address_matcher_ray.pipelines.code_linkage import (
        dedup_code_corpus,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.accuracy import (
        pairwise_f1,
    )

    files, labels = generate_corpus(GenConfig(seed=seed, n_clusters=n_clusters))
    clusters = dedup_code_corpus(rd.from_arrow(files)).materialize()
    pred = {r["unique_id"]: r["cluster_id"] for r in clusters.take_all()}
    truth = dict(
        zip(labels["unique_id"].to_pylist(), labels["cluster_id"].to_pylist())
    )
    m = pairwise_f1(pred, truth)
    if verbose:
        n_out_clusters = len(set(pred.values()))
        print(f"{len(pred)} files -> {n_out_clusters} clusters")
        print(f"pairwise precision={m['precision']:.4f} recall={m['recall']:.4f} "
              f"f1={m['f1']:.4f}")
    return m


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--clusters", type=int, default=300)
    args = ap.parse_args()
    main(n_clusters=args.clusters)
